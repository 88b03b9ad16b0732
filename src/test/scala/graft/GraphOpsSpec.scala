package graft

import graft.operators.GraphQueries
import org.scalatest.matchers.should.Matchers

/** Graph family (q_graph_triangles / q_graph_labelprop). The DuckDB
  * oracles own value equality; these pin the graph-theoretic invariants
  * and an independent driver-side recount on the tiny fixture.
  */
class GraphOpsSpec extends SparkTestBase with Matchers {

  private def undirectedEdgeSet(): Set[(Long, Long)] = {
    val e = Tables.embeddings(spark, sfTiny)
    GraphQueries.undirected(GraphQueries.exactKnnEdges(e))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("triangles: census matches a brute-force recount; invariants hold") {
    val und = undirectedEdgeSet()
    val rows = GraphQueries.graphTriangles.query(spark, sfTiny).collect()
    rows should not be empty
    // brute-force global triangle count over the collected edge set
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val bruteTri = und.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b)
    }.sum
    val totTri = rows.map(_.getLong(4)).sum
    totTri shouldBe bruteTri
    rows.map(_.getLong(2)).sum shouldBe und.size // edges partition by label
    rows.foreach { r =>
      val (wedges, tri, clust) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(3 * tri <= wedges, "closed wedges exceed total wedges")
      assert(clust >= 0.0 && clust <= 1.0)
    }
    info(s"$bruteTri triangles across ${rows.length} labels, ${und.size} undirected edges")
  }

  test("linkpred: top-20 non-adjacent two-hop pairs, correctly ranked, recounted") {
    val und = undirectedEdgeSet()
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val rows = GraphQueries.graphLinkpred.query(spark, sfTiny).collect()
    rows.length shouldBe 20
    val js = rows.map(_.getDouble(3))
    js.zip(js.tail).foreach { case (a, b) => assert(a >= b) }
    rows.foreach { r =>
      val (x, y, common, j) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(!und.contains((x, y)), s"($x,$y) is an existing edge")
      val inter = (adj(x) & adj(y)).size
      inter.toLong shouldBe common
      val union = (adj(x) | adj(y)).size
      math.abs(j - math.round(inter.toDouble / union * 1e6) / 1e6) should be < 1e-9
    }
  }

  test("labelprop: communities are connected-component-confined and non-trivial") {
    val und = undirectedEdgeSet()
    val comm = GraphQueries.graphLabelprop.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    comm.keySet shouldBe Tables.embeddings(spark, sfTiny)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // propagation can never cross a component boundary: union-find the
    // edge set and assert every community is within one component
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    und.foreach { case (a, b) => parent(find(a)) = find(b) }
    comm.foreach { case (v, c) =>
      assert(find(v) == find(c), s"node $v labeled with community $c from another component")
    }
    val nComm = comm.values.toSet.size
    assert(nComm < comm.size, "label propagation produced no grouping at all")
    info(s"$nComm communities over ${comm.size} nodes")
  }

  // ---- LSH-twin agreement (r9): the registered sub-quadratic twins must
  // track their exact twins, not merely be internally consistent. The
  // DuckDB oracles own each twin's own value equality; these bound the
  // exact↔LSH divergence so a recall regression in the edge family
  // surfaces here even though both sides would still oracle-match.

  test("triangles_lsh: per-label census within 25% of exact on edges/triangles") {
    val exact = GraphQueries.graphTriangles.query(spark, sfTiny).collect()
      .map(r => r.get(0).toString -> (r.getLong(2), r.getLong(4))).toMap
    val lsh = GraphQueries.graphTrianglesLsh.query(spark, sfTiny).collect()
      .map(r => r.get(0).toString -> (r.getLong(2), r.getLong(4))).toMap
    lsh.keySet shouldBe exact.keySet
    val edgeRatio = lsh.values.map(_._1).sum.toDouble / exact.values.map(_._1).sum
    edgeRatio should be >= 0.8
    // NOT a subset: when LSH misses a true top-3 neighbor the node takes
    // its next-best candidate instead, and substitute edges are less
    // mutual — the undirected count can slightly EXCEED exact (measured
    // 1.001 on the fixture). Band it.
    edgeRatio should be <= 1.1
    val triRatio = lsh.values.map(_._2).sum.toDouble / exact.values.map(_._2).sum
    triRatio should be >= 0.7
    info(f"edge agreement $edgeRatio%.3f, triangle agreement $triRatio%.3f")
  }

  test("labelprop_lsh: community partition agrees with exact (pair Rand ≥ 0.8)") {
    def comms(q: graft.QueryDef): Map[Long, Long] =
      q.query(spark, sfTiny).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ex = comms(GraphQueries.graphLabelprop)
    val ls = comms(GraphQueries.graphLabelpropLsh)
    ls.keySet shouldBe ex.keySet
    // sampled pair-counting Rand index over a deterministic id slice
    val ids = ex.keys.toSeq.sorted.take(200)
    val pairs = for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    val agree = pairs.count { case (a, b) => (ex(a) == ex(b)) == (ls(a) == ls(b)) }
    val rand = agree.toDouble / pairs.size
    rand should be >= 0.8
    info(f"pair Rand index $rand%.3f over ${pairs.size} pairs")
  }

  test("components_lsh: labels match a driver-side union-find recount exactly") {
    // the DuckDB oracle owns value equality per round; this is an
    // INDEPENDENT in-JVM recount — union-find over the same LSH edge
    // set, min-id canonical labels, class sizes — so a CC-core
    // regression surfaces even if both engines drifted together
    val und = GraphQueries.lshUndirectedEdges(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    und.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = Tables.embeddings(spark, sfTiny).select("vec_id")
      .collect().map(_.getLong(0))
    // canonical label = min id reachable (union by min above keeps roots minimal)
    val expected = nodes.map(v => v -> find(v)).toMap
    val sizes = expected.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rows = GraphQueries.graphComponentsLsh.query(spark, sfTiny).collect()
    rows.length shouldBe nodes.length
    rows.foreach { r =>
      val (v, c, sz) = (r.getLong(0), r.getLong(1), r.getLong(2))
      c shouldBe expected(v)
      sz shouldBe sizes(c)
    }
    info(s"${sizes.size} components over ${nodes.length} nodes, " +
      s"largest ${sizes.values.max}")
  }

  test("stats_lsh: one-row summary matches a driver-side recount") {
    val und = GraphQueries.lshUndirectedEdges(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = (und.toSeq ++ und.toSeq.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.size }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    und.foreach { case (a, b) => parent(find(math.max(find(a), find(b)))) = math.min(find(a), find(b)) }
    val nodes = Tables.embeddings(spark, sfTiny).select("vec_id").collect().map(_.getLong(0))
    val comps = nodes.groupBy(find).map { case (k, v) => k -> v.length }
    // assortativity from the exact integer moments over the directed list
    val dir = und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val xs = dir.map { case (v, u) => (deg(v).toLong, deg(u).toLong) }
    val m = xs.size.toLong
    val sx = xs.map(_._1).sum; val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val expAssort = math.round((m * sxy - sx * sx).toDouble / (m * sxx - sx * sx) * 1e6) / 1e6

    val r = GraphQueries.graphStatsLsh.query(spark, sfTiny).collect().head
    r.getLong(r.fieldIndex("n_nodes")) shouldBe nodes.length.toLong
    r.getLong(r.fieldIndex("n_edges")) shouldBe und.size.toLong
    r.getLong(r.fieldIndex("max_degree")) shouldBe deg.values.max.toLong
    r.getLong(r.fieldIndex("n_components")) shouldBe comps.size.toLong
    r.getLong(r.fieldIndex("giant_size")) shouldBe comps.values.max.toLong
    r.getDouble(r.fieldIndex("assortativity")) shouldBe expAssort
    info(s"stats row: ${r.mkString(", ")}")
  }

  test("closeness_lsh: landmark-BFS harmonic scores match a driver recount") {
    val und = GraphQueries.lshUndirectedEdges(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val nodes = Tables.embeddings(spark, sfTiny).select("vec_id")
      .collect().map(_.getLong(0))
    val ph = graft.functions.PortableHash
    val landmarks = nodes
      .map(v => (((v * ph.Scramble1Mul + ph.Scramble1Add) % ph.SeedMod
        * ph.Scramble2Mul + ph.Scramble2Add) % ph.SeedMod, v))
      .sorted.take(8).map(_._2)
    // per-landmark BFS, depth cap 10
    val dist = scala.collection.mutable.Map[(Long, Long), Int]()
    for (l <- landmarks) {
      var frontier = Set(l); dist((l, l)) = 0; var d = 0
      while (frontier.nonEmpty && d < 10) {
        d += 1
        frontier = frontier.flatMap(v => adj.getOrElse(v, Array.empty[Long]))
          .filter(u => !dist.contains((l, u)))
        frontier.foreach(u => dist((l, u)) = d)
      }
    }
    val expected = nodes.map { v =>
      val ds = landmarks.flatMap(l => dist.get((l, v))).filter(_ >= 1)
      val h = ds.map(d => BigDecimal(1.0 / d).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
      v -> (ds.length.toLong, math.round(h.toDouble * 1e6) / 1e6)
    }.toMap
    val rows = GraphQueries.graphClosenessLsh.query(spark, sfTiny).collect()
    rows.length shouldBe nodes.length
    rows.foreach { r =>
      val (v, n, h) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      (n, h) shouldBe expected(v)
    }
    info(s"${rows.count(_.getLong(1) > 0)} of ${nodes.length} nodes reach ≥1 landmark")
  }

  test("modularity_lsh: per-community Q matches a driver recount; ΣQ sane") {
    val und = GraphQueries.lshUndirectedEdges(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lab = GraphQueries.graphLabelpropLsh.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val m = und.size
    val deg = (und.toSeq ++ und.toSeq.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.size }
    val rows = GraphQueries.graphModularityLsh.query(spark, sfTiny).collect()
    rows.map(_.getLong(1)).sum shouldBe lab.size // every node in exactly one community
    val cut = m.toLong - rows.map(_.getLong(2)).sum // Σe_c + cut edges = m
    assert(cut >= 0 && cut < m, s"internal edges exceed the graph ($cut cut)")
    var total = 0.0
    rows.foreach { r =>
      val (c, nNodes, eC, dC, q) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val members = lab.collect { case (v, cc) if cc == c => v }.toSet
      members.size.toLong shouldBe nNodes
      und.count { case (a, b) => members(a) && members(b) }.toLong shouldBe eC
      members.toSeq.map(v => deg.getOrElse(v, 0)).sum.toLong shouldBe dC
      val expectQ = eC.toDouble / m - math.pow(dC.toDouble / (2.0 * m), 2)
      math.abs(q - math.round(expectQ * 1e6) / 1e6) should be < 1e-9
      total += expectQ
    }
    assert(total > 0.0 && total <= 1.0, s"partition no better than random: Q=$total")
    info(f"Q=$total%.4f over ${rows.length} communities, $m edges")
  }

  test("dbscan_lsh: roles and min-core-id clusters match a driver union-find") {
    val und = GraphQueries.lshUndirectedEdges(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = Tables.embeddings(spark, sfTiny).select("vec_id")
      .collect().map(_.getLong(0))
    val core = nodes.filter(v => adj.getOrElse(v, Set.empty).size >= 4).toSet
    // min-reachable-core-id labels via driver union-find on core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(v => v -> v): _*)
    def find(v: Long): Long = { var r = v; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- und if core(a) && core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clab = core.map(v => v -> find(v)).toMap
    val rows = GraphQueries.vecDbscanLsh.query(spark, sfTiny).collect()
    rows.length shouldBe nodes.length
    rows.foreach { r =>
      val (v, role, c) = (r.getLong(0), r.getString(1), r.getLong(2))
      if (core(v)) { role shouldBe "core"; c shouldBe clab(v) }
      else {
        val coreNbrs = adj.getOrElse(v, Set.empty).filter(core)
        if (coreNbrs.nonEmpty) { role shouldBe "border"; c shouldBe coreNbrs.map(clab).min }
        else { role shouldBe "noise"; c shouldBe -1L }
      }
    }
    val mix = rows.groupBy(_.getString(1)).map { case (k, v) => k -> v.length }
    assert(mix.getOrElse("core", 0) > 0 && mix.keySet.size >= 2,
      s"degenerate role mix: $mix")
    info(s"mix=$mix clusters=${clab.values.toSet.size}")
  }

  test("hits_lsh: integer hub/auth iterations match a driver recount") {
    val edges = graft.operators.VectorQueries.lshKnnEdgesPersisted(spark, sfTiny)
      .select("vec_id", "n_vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = Tables.embeddings(spark, sfTiny).select("vec_id")
      .collect().map(_.getLong(0))
    val outAdj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val inAdj = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    var a = nodes.map(_ -> 1L).toMap
    var h = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      h = nodes.map(v => v -> outAdj.getOrElse(v, Array.empty[Long]).map(a).sum).toMap
      a = nodes.map(v => v -> inAdj.getOrElse(v, Array.empty[Long]).map(h).sum).toMap
    }
    val (mh, ma) = (h.values.max, a.values.max)
    val rows = GraphQueries.graphHitsLsh.query(spark, sfTiny).collect()
    rows.length shouldBe nodes.length
    rows.foreach { r =>
      val v = r.getLong(0)
      r.getLong(1) shouldBe h(v)
      r.getLong(2) shouldBe a(v)
      r.getDouble(3) shouldBe math.round(h(v).toDouble / mh * 1e6) / 1e6
      r.getDouble(4) shouldBe math.round(a(v).toDouble / ma * 1e6) / 1e6
    }
    info(s"max hub=$mh max auth=$ma over ${edges.length} directed edges")
  }

  test("graph facade over the LSH edge frame is row-equal to the registered queries") {
    import graft.api.implicits._
    val edges = GraphQueries.lshUndirectedEdges(spark, sfTiny)
      .select(org.apache.spark.sql.functions.col("a").as("x"),
        org.apache.spark.sql.functions.col("b").as("y"))
    val nodes = Tables.embeddings(spark, sfTiny)
      .select(org.apache.spark.sql.functions.col("vec_id").as("nid"))
    val g = edges.graft.graph(src = "x", dst = "y", nodes = Some(nodes), id = "nid")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    // the facade instance must equal the oracle-checked registered query
    rows(g.components()) shouldBe rows(GraphQueries.graphComponentsLsh.query(spark, sfTiny))
    rows(g.dbscan(minPts = 4)) shouldBe rows(GraphQueries.vecDbscanLsh.query(spark, sfTiny))
    rows(g.closeness()) shouldBe rows(GraphQueries.graphClosenessLsh.query(spark, sfTiny))
    rows(g.communities()) shouldBe rows(GraphQueries.graphLabelpropLsh.query(spark, sfTiny))
    rows(g.modularity()) shouldBe rows(GraphQueries.graphModularityLsh.query(spark, sfTiny))
    // hits/pagerank follow the DIRECTED-edge contract — pin on the raw frame
    val directed = graft.operators.VectorQueries.lshKnnEdgesPersisted(spark, sfTiny)
      .select(org.apache.spark.sql.functions.col("vec_id").as("x"),
        org.apache.spark.sql.functions.col("n_vec_id").as("y"))
    val gd = directed.graft.graph(src = "x", dst = "y", nodes = Some(nodes), id = "nid")
    rows(gd.hits()) shouldBe rows(GraphQueries.graphHitsLsh.query(spark, sfTiny))
    rows(gd.pagerank()) shouldBe rows(
      graft.SparkEntry.queries("q_vec_pagerank_lsh")(spark, sfTiny))
  }

  test("linkpred_lsh and outliers_lsh: top-set overlap with exact ≥ 0.5") {
    // top-k lists over a slightly different edge set shuffle at the tail;
    // the floor asserts the twins surface substantially the SAME story
    val exP = GraphQueries.graphLinkpred.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsP = GraphQueries.graphLinkpredLsh.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (exP & lsP).size.toDouble / exP.size should be >= 0.5
    val exO = GraphQueries.graphOutliers.query(spark, sfTiny).collect()
      .map(_.getLong(1)).toSet
    val lsO = GraphQueries.graphOutliersLsh.query(spark, sfTiny).collect()
      .map(_.getLong(1)).toSet
    (exO & lsO).size.toDouble / exO.size should be >= 0.5
    info(s"linkpred overlap ${(exP & lsP).size}/20, outliers overlap ${(exO & lsO).size}/20")
  }
}
