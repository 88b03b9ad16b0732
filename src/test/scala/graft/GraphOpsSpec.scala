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
}
