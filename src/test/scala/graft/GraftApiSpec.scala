package graft

import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

// A facade user's imports — the spec deliberately touches NO internal
// graft.operators/multimodal symbols beyond what `graft.api.implicits._`
// re-surfaces, proving the public import is self-sufficient.
import graft.api.implicits._

/** The library facade from a user's perspective: plain spark.read input,
  * one import, column-name parameterization, results checked against
  * independently-computed expectations.
  */
class GraftApiSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def docsDf = spark.read.parquet(s"$sfTiny/documents.parquet")

  test("text + exact dedup: token counts, quality scores, min-id survivor per duplicate text") {
    val docs = docsDf
    val withCols = docs.graft.withTokenCount().graft.withQualityScore()
    withCols.columns should contain allOf ("n_tokens", "quality_score")
    // spot-check one row against a hand count
    val row = withCols.select("text", "n_tokens").head
    row.getInt(1) shouldBe row.getString(0).split(" ", -1).length

    val kept = docs.graft.exactDedup()
    // survivors: one per distinct text, and exactly the min doc_id of each
    val wantKeep = docs.groupBy("text").agg(org.apache.spark.sql.functions.min("doc_id").as("k"))
      .select("k").as[Long].collect().sorted
    kept.select("doc_id").as[Long].collect().sorted shouldBe wantKeep
    kept.select("text").distinct().count() shouldBe kept.count()
  }

  test("graph handle: components/dbscan/communities/modularity/closeness on a hand graph") {
    // two triangles bridged by one edge, plus a pendant and an isolate:
    //   0-1-2-0   2-3   3-4-5-3   5-6   (7 isolated via nodes frame)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 3L), (5L, 6L))
      .toDF("from_id", "to_id")
    val nodes = (0L to 7L).toDF("nid")
    val g = edges.graft.graph(src = "from_id", dst = "to_id",
      nodes = Some(nodes), id = "nid")

    val comp = g.components().collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    comp.toMap shouldBe (0L to 6L).map(_ -> (0L, 7L)).toMap + (7L -> (7L, 1L))

    val roles = g.dbscan(minPts = 3).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // degrees: 0,1,4→2; 6→1; cores = {2,3,5} (degree 3), all in one
    // core-chain 2-3-5 → cluster = min core id = 2
    roles(2L) shouldBe ("core", 2L)
    roles(3L) shouldBe ("core", 2L) // 2-3 edge joins the cores
    roles(5L) shouldBe ("core", 2L)
    roles(0L)._1 shouldBe "border" // adjacent to core 2
    roles(6L) shouldBe ("border", 2L)
    roles(4L)._1 shouldBe "border"
    roles(7L) shouldBe ("noise", -1L)

    val tri = g.triangles().collect()
    tri.length shouldBe 1 // global census row
    tri.head.getLong(4) shouldBe 2L // two triangles

    val q = g.modularity()
    val tot = q.collect().map(_.getDouble(4)).sum
    assert(tot > -1.0 && tot <= 1.0)
    q.columns shouldBe Array("community", "n_nodes", "internal_edges", "total_degree", "modularity")

    val close = g.closeness(landmarks = 8, hopCap = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    close.length shouldBe 8
    // the isolate reaches no landmark but itself (d>=1 excluded)
    val iso = close.find(_._1 == 7L).get
    iso._2 should be <= 1L // at most itself-as-landmark... zero non-self reaches
    close.filter(c => c._1 <= 6L).foreach(c => assert(c._3 > 0.0))
  }

  test("containmentPairs on renamed columns matches the brute-force containment truth") {
    val docs = docsDf.select(
      $"doc_id".as("id"), $"lang".as("language"), $"text".as("body"))
      .filter($"id" < 120)
    val got = docs.graft.containmentPairs(id = "id", text = "body", lang = Some("language"))
    got.columns.toSeq shouldBe Seq("id_contained", "id_container", "containment")
    val toks = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).distinct.toSet)).toSeq
    val want = (for {
      (i1, l1, t1) <- toks; (i2, l2, t2) <- toks
      if l1 == l2 && (t1.size < t2.size || (t1.size == t2.size && i1 < i2))
      if (t1 & t2).size * 5 >= t1.size * 4
    } yield (i1, i2)).toSet
    want should not be empty
    got.select("id_contained", "id_container").as[(Long, Long)].collect().toSet shouldBe want
  }

  test("near-dup pairs/clusters/dedup on renamed columns match the brute-force jaccard truth") {
    // a user's frame with their OWN column names
    val docs = docsDf.select(
      $"doc_id".as("id"), $"lang".as("language"), $"text".as("body"))
      .filter($"id" < 120)

    val pairs = docs.graft.nearDupPairs(id = "id", text = "body", lang = Some("language"))
    pairs.columns.toSeq shouldBe Seq("id_1", "id_2", "jaccard")

    // brute-force truth: exact token-set jaccard >= 0.5 within language
    val toks = docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).distinct.toSet)).toSeq
    val want = (for {
      (i1, l1, t1) <- toks; (i2, l2, t2) <- toks
      if i1 < i2 && l1 == l2
      j = (t1 & t2).size.toDouble / (t1 | t2).size
      if j >= 0.5
    } yield (i1, i2)).toSet
    val got = pairs.select("id_1", "id_2").as[(Long, Long)].collect().toSet
    // exact verify gate => precision 1.0 always; 16x2 banding at the J=0.5
    // boundary => recall ~0.99 (a few barely-over-threshold pairs may miss)
    (got -- want) shouldBe empty
    got.size.toDouble / want.size should be >= 0.97

    // clusters: transitive closure of the found pairs, labels = min member
    val labels = docs.graft.dedupClusters(id = "id", text = "body", lang = Some("language"))
      .as[(Long, Long)].collect().toMap
    for ((a, b) <- got) labels(a) shouldBe labels(b)
    labels.values.foreach(c => labels(c) shouldBe c) // representative labels itself

    // nearDedup keeps exactly the representatives
    val kept = docs.graft.nearDedup(id = "id", text = "body", lang = Some("language"))
      .select("id").as[Long].collect().sorted
    kept shouldBe labels.collect { case (id, c) if id == c => id }.toSeq.sorted

    // nearDedupBest keeps the argmax-`by` member per cluster instead:
    // brute-force the expected pick from the labels + a weight column
    val weighted = docs.withColumn("w", org.apache.spark.sql.functions.length($"body"))
    val wById = weighted.select("id", "w").as[(Long, Int)].collect().toMap
    val wantBest = labels.groupBy(_._2).values.map { members =>
      members.map(_._1).maxBy(id => (wById(id), -id))
    }.toSeq.sorted
    val keptBest = weighted.graft
      .nearDedupBest(by = "w", id = "id", text = "body", lang = Some("language"))
      .select("id").as[Long].collect().sorted
    keptBest shouldBe wantBest
  }

  test("cosine top-k matches a hand-computed ranking") {
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 3)
    val got = emb.graft.cosineTopK(queries, k = 3)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val all = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      BigDecimal(d / math.sqrt(na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (qid <- 0L until 3L) {
      val q = all.find(_._1 == qid).get._2
      val want = all.filter(_._1 != qid)
        .map { case (i, v) => (i, cos(q, v)) }
        .sortBy { case (i, c) => (-c, i) }.take(3).map(_._1).toSeq
      got(qid) shouldBe want
    }
  }

  test("curate on renamed columns equals the oracle-checked pipeline instance") {
    val docs = docsDf
    // the facade instance at the pinned parameters must equal the
    // registered q_pipeline_curate (oracle-checked vs DuckDB) exactly
    val want = graft.SparkEntry.queries("q_pipeline_curate")(spark, sfTiny)
      .collect().map(_.toString).sorted
    val renamed = docs.select($"doc_id".as("id"), $"lang".as("language"), $"text".as("body"))
    val got = renamed.graft.curate(id = "id", text = "body", lang = Some("language"))
      .select($"id".as("doc_id"), $"lang", $"n_tokens", $"quality_score")
      .collect().map(_.toString).sorted
    got shouldBe want

    // a stricter gate only ever shrinks the survivor set
    val strict = renamed.graft.curate(id = "id", text = "body", lang = Some("language"),
      minQuality = 0.6, num = 1, den = 2)
    val strictIds = strict.select("id").as[Long].collect().toSet
    val baseIds = renamed.graft.curate(id = "id", text = "body", lang = Some("language"))
      .select("id").as[Long].collect().toSet
    (strictIds -- baseIds) shouldBe empty
  }

  test("asofJoin and sessionize on user frames match hand-computed truths") {
    // as-of: latest quote at-or-before each trade, per symbol
    val trades = Seq(("A", 10L, 1), ("A", 25L, 2), ("B", 7L, 3), ("B", 5L, 4))
      .toDF("sym", "t_ts", "trade_id")
    val quotes = Seq(("A", 9L, 90.0), ("A", 20L, 91.0), ("A", 25L, 92.0), ("B", 6L, 50.0))
      .toDF("q_sym", "q_ts", "px")
    val got = trades.graft.asofJoin(quotes, Seq("sym"), Seq("q_sym"), "t_ts", "q_ts")
      .select("trade_id", "px").as[(Int, Double)].collect().toMap
    got shouldBe Map(1 -> 90.0, 2 -> 92.0, 3 -> 50.0) // trade 4 precedes all quotes

    // sessionize: gap=10 over per-user event times
    val ev = Seq(("u1", 0L), ("u1", 5L), ("u1", 30L), ("u1", 35L), ("u2", 100L))
      .toDF("user", "at")
    val sess = ev.graft.sessionize(key = "user", ts = "at", gap = 10L)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    sess shouldBe Seq(("u1", 1L, 2L, 0L, 5L), ("u1", 2L, 2L, 30L, 35L), ("u2", 1L, 1L, 100L, 100L))
  }

  test("pack store handle: init/append/delete/scan/time-travel/poll round-trip on arbitrary bytes") {
    val base = Files.createTempDirectory("graft_api_store").toFile.getAbsolutePath + "/store"
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).as[Long].map(i => (i, Array.fill((i % 7 + 1).toInt)(i.toByte)))

    val store = spark.graft.packStore(base)
    store.init(batch(0, 100), nPacks = 2)   // snap 0
    store.append(batch(100, 150))           // snap 1
    store.delete(spark.range(0, 150, 10).as[Long]) // snap 2
    store.tip shouldBe Some(2L)

    val survivors = (0L until 150L).filterNot(_ % 10 == 0)
    val live = store.scan().collect().sortBy(_._1)
    live.map(_._1).toSeq shouldBe survivors
    // bytes round-trip exactly
    live.foreach { case (i, b) => b.toSeq shouldBe Array.fill((i % 7 + 1).toInt)(i.toByte).toSeq }
    // time travel: the pre-delete snapshot still holds everything
    store.scanAt(1).collect().map(_._1).sorted.toSeq shouldBe (0L until 150L)

    // named refs: a tag reads like its snapshot and survives vacuum below
    store.createTag("pre-delete", 1L)
    store.listTags() shouldBe Seq("pre-delete" -> 1L)
    store.scanTag("pre-delete").collect().map(_._1).sorted.toSeq shouldBe (0L until 150L)

    // changelog: one poll from scratch sees the NET adds (ids deleted
    // within the window never surface) and the retraction set
    val ch = store.poll(-1L)
    ch.tip shouldBe 2L
    ch.adds.collect().map(_._1).sorted.toSeq shouldBe survivors
    ch.deletes.collect().sorted.toSeq shouldBe (0L until 150L by 10)

    // stats before compaction: 1 base + 1 delta + 1 tombstone component,
    // 15 tombstoned ids, tip at snapshot 2 with all 3 snapshots retained
    val pre = store.stats().collect().head
    pre.getAs[Long]("tip") shouldBe 2L
    pre.getAs[Long]("retained_snapshots") shouldBe 3L
    pre.getAs[Long]("base_components") shouldBe 1L
    pre.getAs[Long]("delta_components") shouldBe 1L
    pre.getAs[Long]("tombstone_components") shouldBe 1L
    pre.getAs[Long]("tombstoned_ids") shouldBe 15L
    (pre.getAs[Long]("min_id"), pre.getAs[Long]("max_id")) shouldBe ((0L, 149L))

    // compaction + vacuum: physical drop, view unchanged — and the tagged
    // snapshot 1 stays readable although the retention window expired it
    store.compact(nPacks = 2)
    store.vacuum(retainSnapshots = 1)
    store.scan().collect().map(_._1).sorted.toSeq shouldBe survivors
    store.scanTag("pre-delete").collect().map(_._1).sorted.toSeq shouldBe (0L until 150L)
    // release the pin: the next vacuum expires the tagged snapshot too,
    // restoring the plain single-snapshot state the stats below assert
    store.dropTag("pre-delete")
    store.listTags() shouldBe Seq.empty
    store.vacuum(retainSnapshots = 1)
    store.scan().collect().map(_._1).sorted.toSeq shouldBe survivors

    // stats after: one merged base, no deltas/tombstones, one snapshot
    val post = store.stats().collect().head
    post.getAs[Long]("base_components") shouldBe 1L
    post.getAs[Long]("delta_components") shouldBe 0L
    post.getAs[Long]("tombstone_components") shouldBe 0L
    post.getAs[Long]("tombstoned_ids") shouldBe 0L
    post.getAs[Long]("retained_snapshots") shouldBe 1L
    (post.getAs[Long]("min_id"), post.getAs[Long]("max_id")) shouldBe ((1L, 149L))
  }

  test("followStream pushes adds and retractions once per snapshot file; a resumed follower sees only new publishes") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_api_follow").toFile.getAbsolutePath + "/store"
    val cp = Files.createTempDirectory("graft_api_fcp").toFile.getAbsolutePath
    def batch(lo: Long, hi: Long) =
      spark.range(lo, hi).as[Long].map(i => (i, Array.fill(3)(i.toByte)))

    val store = spark.graft.packStore(base)
    store.init(batch(0, 50), nPacks = 2)           // snap 0
    store.append(batch(50, 80))                    // snap 1
    store.delete(spark.range(0, 20, 2).as[Long])   // snap 2

    val adds = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val dels = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def run(): Unit = {
      val q = store.followStream { ch =>
        ch.adds.collect().foreach(a => adds.add(a._1))
        ch.deletes.collect().foreach(dels.add)
      }.option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    // adds are NET of the delivered window: ids deleted inside it never
    // surface as adds (deletes-before-adds must not resurrect them)
    adds.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq shouldBe
      (0L until 80L).filterNot(i => i < 20 && i % 2 == 0)
    dels.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq shouldBe (0L until 20L by 2)

    // resume from the checkpoint: only the NEW publish is delivered, and
    // the intervening compaction (pure rewrite) contributes nothing
    store.compact(nPacks = 2)                      // snap 3
    store.append(batch(80, 90))                    // snap 4
    adds.clear(); dels.clear()
    run()
    adds.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq shouldBe (80L until 90L)
    dels.isEmpty shouldBe true
  }

  test("attachStream lands a two-batch stream exactly once through the handle") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft_api_ssrc").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_api_scp").toFile.getAbsolutePath
    val base = Files.createTempDirectory("graft_api_sstore").toFile.getAbsolutePath + "/store"

    def write(i: Int, lo: Long, hi: Long): Unit = {
      val tmp = Files.createTempDirectory(s"graft_api_sw$i").toFile.getAbsolutePath
      spark.range(lo, hi).as[Long].map(k => (k, Array.fill(4)(k.toByte)))
        .toDF("media_id", "payload").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100)
    }
    write(0, 0, 40); write(1, 40, 80)

    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val store = spark.graft.packStore(base)
    val q = store.attachStream(stream, nPacks = 2)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    store.scan().collect().map(_._1).sorted.toSeq shouldBe (0L until 80L)
  }

  test("createViews: SQL over the store sees the same live state as the DataFrame scans") {
    val base = Files.createTempDirectory("graft_api_sql").toFile.getAbsolutePath + "/store"
    val store = spark.graft.packStore(base)
    def batch(lo: Long, hi: Long, ver: Byte) =
      spark.range(lo, hi).as[Long].map(i => (i, Array(ver, i.toByte)))
    def meta(lo: Long, hi: Long, kind: String) =
      spark.range(lo, hi).toDF("media_id")
        .withColumn("kind", org.apache.spark.sql.functions.lit(kind))

    store.init(batch(0, 60, 1), nPacks = 2, meta = Some(meta(0, 60, "x")))
    store.delete(spark.range(0, 10).as[Long])
    store.upsert(batch(20, 25, 2), meta = Some(meta(20, 25, "y")))
    store.createViews("media")

    spark.sql("SELECT count(*) AS n FROM media_bytes").head.getLong(0) shouldBe 50L
    // SQL join of the meta view against the byte view: version-correct
    val rows = spark.sql("""
      SELECT b.media_id, m.kind FROM media_bytes b JOIN media_meta m USING (media_id)
      WHERE m.kind = 'y' ORDER BY media_id""").collect()
    rows.map(_.getLong(0)).toSeq shouldBe (20L until 25L)
    // predicate over meta in pure SQL matches the scanWhere path
    spark.sql("SELECT media_id FROM media_meta WHERE kind = 'x' ORDER BY media_id")
      .collect().map(_.getLong(0)).toSeq shouldBe
      store.scanWhere(org.apache.spark.sql.functions.col("kind") === "x")
        .collect().map(_._1).sorted.toSeq
  }

  test("multi-store composition: follow source store -> filter -> upsert into replica; deletes propagate") {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.graft.packStore(
      Files.createTempDirectory("graft_api_m_src").toFile.getAbsolutePath + "/store")
    val dst = spark.graft.packStore(
      Files.createTempDirectory("graft_api_m_dst").toFile.getAbsolutePath + "/store")
    val cp = Files.createTempDirectory("graft_api_m_cp").toFile.getAbsolutePath
    def batch(lo: Long, hi: Long, ver: Byte) =
      spark.range(lo, hi).as[Long].map(i => (i, Array(ver, i.toByte)))

    src.init(batch(0, 100, 1), nPacks = 2)        // snap 0
    src.delete(spark.range(0, 10).as[Long])       // snap 1
    src.upsert(batch(20, 30, 2))                  // snap 2

    // the replication pipeline: source changelog -> keep only even ids ->
    // apply to the replica as deletes + upserts (idempotent handler)
    def replicate(): Unit = {
      val q = src.followStream { ch =>
        import spark.implicits._
        val adds = ch.adds.filter(_._1 % 2 == 0)
        val dels = ch.deletes.filter(_ % 2 == 0)
        if (dst.tip.isEmpty) dst.init(adds, nPacks = 2)
        else {
          if (dels.count() > 0) dst.delete(dels)
          if (adds.count() > 0) dst.upsert(adds)
        }
      }.option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    replicate()

    // replica state = even-id projection of the source's live state
    val want = src.scan().collect().filter(_._1 % 2 == 0).toMap
    val got = dst.scan().collect().toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) => v.toSeq shouldBe want(k).toSeq }
    got(20L)(0) shouldBe 2.toByte // the upserted version, not the original

    // incremental: a later source delete propagates on the next run
    src.delete(spark.range(40, 60).as[Long])      // snap 3
    replicate()
    dst.scan().collect().map(_._1).sorted.toSeq shouldBe
      src.scan().collect().map(_._1).filter(_ % 2 == 0).sorted.toSeq
  }

  test("attachStream in upsertMode: a re-emitted id replaces its old version, never duplicates") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("graft_api_usrc").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_api_ucp").toFile.getAbsolutePath
    val base = Files.createTempDirectory("graft_api_ustore").toFile.getAbsolutePath + "/store"

    def write(i: Int, lo: Long, hi: Long, ver: Byte): Unit = {
      val tmp = Files.createTempDirectory(s"graft_api_uw$i").toFile.getAbsolutePath
      spark.range(lo, hi).as[Long].map(k => (k, Array(ver, k.toByte)))
        .toDF("media_id", "payload").coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100)
    }
    write(0, 0, 50, 1); write(1, 30, 70, 2) // ids 30..49 re-emitted at v2

    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val store = spark.graft.packStore(base)
    val q = store.attachStream(stream, nPacks = 2, upsertMode = true)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = store.scan().collect().toMap
    got.keySet shouldBe (0L until 70L).toSet // replaced, not duplicated
    for (i <- 0L until 70L)
      got(i)(0) shouldBe (if (i >= 30) 2.toByte else 1.toByte)
  }
  test("invertedIndex / keywords verbs equal the registered queries") {
    val docs = Tables.documents(spark, sfTiny)
    docs.graft.invertedIndex().orderBy("token", "rn").collect().map(_.toString).toSeq shouldBe
      graft.operators.SearchQueries.textIndex.query(spark, sfTiny).collect().map(_.toString).toSeq
    docs.graft.keywords().orderBy("rank").collect().map(_.toString).toSeq shouldBe
      graft.operators.TextQueries.textrank.query(spark, sfTiny).collect().map(_.toString).toSeq
  }

  test("bm25 verb: self-query over exact-duplicate text retrieves the source doc first") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val docs = Tables.documents(spark, sfTiny)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val out = docs.graft.bm25(queries, k = 3).collect()
    // the 31-token synthetic vocab makes a full-text query barely
    // discriminative (every doc shares most terms), so assert top-3, not
    // rank 1 (measured ranks 2-3 on the fixture)
    out.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.exists(_.getLong(2) == q),
        s"query $q (its own full text) does not rank its source doc top-3")
    }
  }

  test("coreset verb equals q_vec_coreset on the fixture embeddings") {
    val got = Tables.embeddings(spark, sfTiny).graft.coreset()
      .orderBy("rank").collect().map(_.toString).toSeq
    val want = graft.operators.VectorQueries.vecCoreset.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    got shouldBe want
  }

  test("heavyHitters verb matches the exact frequent-value filter") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val ev = Tables.events(spark, sfTiny)
    val got = ev.graft.heavyHitters("event_type", fraction = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val n = ev.count()
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .filter(col("n") * 8 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    want should not be empty
    got shouldBe want
  }

  test("reservoirSample / drift / markov verbs equal their registered queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val docs = Tables.documents(spark, sfTiny)
    // reservoir: same (lang, rank, doc_id) triples as q_sample_reservoir
    val verb = docs.graft.reservoirSample(k = 20)
      .select("lang", "rank", "doc_id").orderBy("lang", "rank")
      .collect().map(_.toString).toSeq
    val reg = graft.operators.AnalyticsQueries.sampleReservoir.query(spark, sfTiny)
      .select("lang", "rank", "doc_id").collect().map(_.toString).toSeq
    verb shouldBe reg
    // drift: the verb over (src0 slice, rest) equals q_text_drift
    val driftVerb = docs.filter(col("source") === "src0").graft
      .drift(docs.filter(col("source") =!= "src0"))
      .collect().map(_.toString).toSeq
    val driftReg = graft.operators.TextQueries.textDrift.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    driftVerb shouldBe driftReg
    // markov: verb over the events frame equals q_events_markov
    val ev = Tables.events(spark, sfTiny).select(
      col("user_id"), col("event_type"), col("event_id"),
      expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
    val markovVerb = ev.graft.markov().collect().map(_.toString).toSeq
    val markovReg = graft.operators.EventQueries.eventsMarkov.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    markovVerb shouldBe markovReg
  }

  test("mining / layout / cusum verbs equal their registered queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sfTiny)
    val pairsVerb = li.graft.frequentPairs(basket = "l_orderkey", item = "l_partkey")
      .collect().map(_.toString).toSeq
    val pairsReg = graft.operators.MiningQueries.mineItemsets.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    pairsVerb shouldBe pairsReg
    val rulesVerb = li.graft.associationRules(basket = "l_orderkey", item = "l_partkey")
      .collect().map(_.toString).toSeq
    val rulesReg = graft.operators.MiningQueries.mineRules.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    rulesVerb shouldBe rulesReg
    val docs = Tables.documents(spark, sfTiny)
    val fuzzyVerb = docs.graft.fuzzyPairs().collect().map(_.toString).toSeq
    val fuzzyReg = graft.operators.MiningQueries.simEditdist.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    fuzzyVerb shouldBe fuzzyReg
    // zorderKey: grouping the verb's z column reproduces q_layout_zorder
    import org.apache.spark.sql.functions._
    val zVerb = li.select("l_partkey", "l_suppkey").graft.zorderKey("l_partkey", "l_suppkey")
      .groupBy(shiftright(col("z"), 16).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .orderBy("bucket").collect().map(_.toString).toSeq
    val zReg = graft.operators.LayoutQueries.layoutZorder.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    zVerb shouldBe zReg
    // hilbertKey: grouping the verb's h column reproduces q_layout_hilbert
    val hVerb = li.select("l_partkey", "l_suppkey").graft.hilbertKey("l_partkey", "l_suppkey")
      .groupBy(shiftright(col("h"), 16).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .orderBy("bucket").collect().map(_.toString).toSeq
    val hReg = graft.operators.LayoutQueries.layoutHilbert.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    hVerb shouldBe hReg
    // bootstrapCI / permutationTest: caller-frame verbs reproduce the
    // registered resample rows given the same derived row key
    val liKeyed = li.withColumn("rk", col("l_orderkey") * 8 + col("l_linenumber"))
    liKeyed.graft.bootstrapCI("l_returnflag", "l_quantity", "rk")
      .collect().map(_.toString).sorted.toSeq shouldBe
      graft.operators.ResampleQueries.statBootstrap.query(spark, sfTiny)
        .collect().map(_.toString).sorted.toSeq
    liKeyed.graft.permutationTest("l_returnflag", "l_quantity", "rk", "A", "R")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.ResampleQueries.statPermutation.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    // psi verb equals the registered drift audit on the orders frame
    Tables.orders(spark, sfTiny).graft.psi("o_orderkey", "o_totalprice")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.MoreQueries.dqPsi.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    // winnow / winnowPairs verbs equal the registered fingerprint rows
    docs.graft.winnow().collect().map(_.toString).sorted.toSeq shouldBe
      graft.operators.TextQueries.textWinnow.query(spark, sfTiny)
        .collect().map(_.toString).sorted.toSeq
    docs.graft.winnowPairs().collect().map(_.toString).sorted.toSeq shouldBe
      graft.operators.TextQueries.textWinnowPairs.query(spark, sfTiny)
        .collect().map(_.toString).sorted.toSeq
    val cusumVerb = Tables.events(spark, sfTiny).graft.cusum()
      .collect().map(_.toString).toSeq
    val cusumReg = graft.operators.TimeSeriesQueries.tsChangepoint.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    cusumVerb shouldBe cusumReg
    assert(cusumVerb.nonEmpty)
  }

  test("entropy / gini verbs equal their registered queries") {
    import graft.api.implicits._
    val ev = Tables.events(spark, sfTiny)
    val entVerb = ev.graft.entropy().collect().map(_.toString).toSeq
    val entReg = graft.operators.AggQueries.aggEntropy.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    entVerb shouldBe entReg
    val o = Tables.orders(spark, sfTiny)
    val giniVerb = o.graft.gini(value = "o_totalprice", by = "o_orderpriority",
        tieBreak = "o_orderkey").collect().map(_.toString).toSeq
    val giniReg = graft.operators.AggQueries.aggGini.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    giniVerb shouldBe giniReg
    assert(entVerb.nonEmpty && giniVerb.nonEmpty)
  }

  test("statistical-test verbs equal their registered queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    val o = Tables.orders(spark, sfTiny)
    val of = o.filter(col("o_orderstatus").isin("O", "F"))
    of.graft.mannWhitney("o_orderstatus", "o_totalprice", "O")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statMannWhitney.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    of.graft.ksTest("o_orderstatus", "o_totalprice", "O")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statKs.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    o.graft.kruskal("o_orderpriority", "o_totalprice")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statKruskal.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    Tables.lineitem(spark, sfTiny).graft.spearman("l_quantity", "l_extendedprice")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statSpearman.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    o.graft.chisq("o_orderstatus", "o_orderpriority")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statChisq.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    val nx = Tables.lineitem(spark, sfTiny)
      .groupBy(col("l_orderkey").as("o_orderkey")).agg(count(lit(1)).as("x"))
    val olsVerb = o.join(nx, "o_orderkey").graft
      .ols("o_orderpriority", "x", "o_totalprice")
      .collect().map(_.toString).toSeq
    olsVerb shouldBe graft.operators.StatQueries.statOls.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    Tables.customer(spark, sfTiny).graft
      .ttest("c_mktsegment", "c_acctbal", "BUILDING", "MACHINERY")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statTtest.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    o.graft.anova("o_orderpriority", "o_totalprice")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statAnova.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    Tables.events(spark, sfTiny).graft.kaplanMeier("user_id", "ts")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statSurvival.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
  }

  test("statsState handle: ingest + serve equals the one-shot verbs") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_statehandle")
      .toFile.getAbsolutePath
    val of = Tables.orders(spark, sfTiny).filter(col("o_orderstatus").isin("O", "F"))
    val h = spark.graft.statsState(base)
    for (i <- 0 until 2)
      h.ingest(of.filter(col("o_orderkey") % 2 === i), "o_orderstatus", "o_totalprice")
    h.mannWhitney("O").collect().map(_.toString).toSeq shouldBe
      of.graft.mannWhitney("o_orderstatus", "o_totalprice", "O")
        .collect().map(_.toString).toSeq
    h.ttest("O").collect().map(_.toString).toSeq shouldBe
      of.graft.ttest("o_orderstatus", "o_totalprice", "O", "F")
        .collect().map(_.toString).toSeq
    h.state.count() should be > 0L
  }

  test("acf / zipf verbs equal their registered queries") {
    import graft.api.implicits._
    Tables.events(spark, sfTiny).graft.acf("event_type", "ts", "value")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.TimeSeriesQueries.tsAcf.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    Tables.documents(spark, sfTiny).graft.zipf("text")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.TextQueries.textZipf.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    Tables.orders(spark, sfTiny).graft.equiDepthHistogram("o_totalprice")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.AggQueries.aggHistogramEqdepth.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
  }

  test("mineState / trendState handles: ingest + serve equal the registered queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    val mBase = java.nio.file.Files.createTempDirectory("graft_api_mine").toFile.getAbsolutePath
    val mh = spark.graft.mineState(mBase)
    val li = Tables.lineitem(spark, sfTiny)
    for (i <- 0 until 2)
      mh.ingest(li.filter(abs(hash(col("l_orderkey"))) % 2 === i), "l_orderkey", "l_partkey")
    rows(mh.rules) shouldBe
      rows(graft.operators.MiningQueries.mineRules.query(spark, sfTiny))
    rows(mh.recommendations) shouldBe
      rows(graft.operators.MiningQueries.mineRecs.query(spark, sfTiny))
    val tBase = java.nio.file.Files.createTempDirectory("graft_api_trend").toFile.getAbsolutePath
    val th = spark.graft.trendState(tBase)
    val ev = Tables.events(spark, sfTiny)
    for (i <- 0 until 2)
      th.ingest(ev.filter(abs(hash(col("event_id"))) % 2 === i),
        "user_id", "event_type", "ts", "value")
    rows(th.trend) shouldBe
      rows(graft.operators.TimeSeriesQueries.tsTrend.query(spark, sfTiny))
    rows(th.rfm) shouldBe
      rows(graft.operators.EventQueries.eventsRfm.query(spark, sfTiny))
  }

  test("mad / seqmine verbs equal their registered queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions._
    Tables.orders(spark, sfTiny).graft.mad("o_orderpriority", "o_totalprice")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.StatQueries.statMad.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    // verb on a user-supplied symbol column == the registered query's
    // synthesized alphabet when fed the same synthesis
    val v = col("event_id") % 64
    val sym = when(v >= 33, "e5").when(v >= 17, "e4").when(v >= 9, "e3")
      .when(v >= 5, "e2").when(v >= 3, "e1").otherwise("e0")
    Tables.events(spark, sfTiny).withColumn("sym", sym)
      .graft.seqmine("user_id", "ts", "sym")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.EventQueries.eventsSeqmine.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    Tables.events(spark, sfTiny).graft.rfm("user_id", "ts", "value")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.EventQueries.eventsRfm.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
    Tables.events(spark, sfTiny).graft.trend("event_type", "ts", "value")
      .collect().map(_.toString).toSeq shouldBe
      graft.operators.TimeSeriesQueries.tsTrend.query(spark, sfTiny)
        .collect().map(_.toString).toSeq
  }

  test("r11 verbs (spanProvenance / noisedCounts / nextStep) equal their registered queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    rows(Tables.documents(spark, sfTiny).graft.spanProvenance()) shouldBe
      rows(graft.operators.TextQueries.textSpanSource.query(spark, sfTiny))
    rows(Tables.customer(spark, sfTiny)
      .withColumn("acct_nonneg", col("c_acctbal") >= 0)
      .graft.noisedCounts(Seq("c_nationkey", "c_mktsegment", "acct_nonneg"))) shouldBe
      rows(graft.operators.MoreQueries.dqDpnoise.query(spark, sfTiny))
    val v = col("event_id") % 64
    val sym = when(v >= 33, "e5").when(v >= 17, "e4").when(v >= 9, "e3")
      .when(v >= 5, "e2").when(v >= 3, "e1").otherwise("e0")
    rows(Tables.events(spark, sfTiny).withColumn("sym", sym)
      .graft.nextStep("user_id", "ts", "sym")) shouldBe
      rows(graft.operators.EventQueries.eventsNextstep.query(spark, sfTiny))
  }

  test("noisedCounts: NULL group values get distinct noise keys, not collided draws") {
    import graft.api.implicits._
    // (NULL,'x'), ('x',NULL), ('x','x'): concat_ws used to skip NULLs and
    // collide all keys containing one 'x' — the r11 advice fix encodes
    // NULLs explicitly, so each group must draw its own noise
    import spark.implicits._
    val rows = (Seq.fill(40)((Option.empty[String], Some("x")))
      ++ Seq.fill(40)((Some("x"), Option.empty[String]))
      ++ Seq.fill(40)((Some("x"), Some("x"))))
      .toDF("a", "b")
    val got = rows.graft.noisedCounts(Seq("a", "b"), eps = 1.0).collect()
    got.length shouldBe 3
    val noises = got.map(r => r.getDouble(2) - 40.0)
    noises.distinct.length shouldBe 3 // three groups, three independent draws
  }

  test("indexState handle: ingest + serve equals the registered retrieval queries") {
    import graft.api.implicits._
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    val base = java.nio.file.Files.createTempDirectory("graft_api_index").toFile.getAbsolutePath
    val h = spark.graft.indexState(base)
    val docs = Tables.documents(spark, sfTiny)
    for (i <- 0 until 2)
      h.ingest(docs.filter(col("doc_id") % 2 === i), batchId = Some(i.toLong))
    rows(h.searchHeads()) shouldBe
      rows(graft.operators.SearchQueries.textIndex.query(spark, sfTiny))
    rows(h.hybrid(Tables.embeddings(spark, sfTiny))) shouldBe
      rows(graft.operators.SearchQueries.textHybrid.query(spark, sfTiny))
    // compaction folds segments without changing the served results
    h.compact()
    rows(h.hybrid(Tables.embeddings(spark, sfTiny))) shouldBe
      rows(graft.operators.SearchQueries.textHybrid.query(spark, sfTiny))
  }
}
