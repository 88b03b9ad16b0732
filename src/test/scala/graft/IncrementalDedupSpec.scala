package graft

import java.nio.file.Files

import graft.operators.DedupQueries
import graft.streaming.IncrementalDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

/** Incremental near-dedup invariant: because MinHash signatures depend only
  * on document content, the union of per-batch pair emissions over ANY
  * batch split must equal the one-shot batch q_dedup_near pair set —
  * including the verified jaccard scores. Since r12 the state runs the
  * log-record CAS protocol, so crash replays land nothing and concurrent
  * writers lose nothing.
  */
class IncrementalDedupSpec extends SparkTestBase with Matchers {

  private def pairSet(df: DataFrame) =
    df.select("doc_id1", "doc_id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("foreachBatch incremental MinHash dedup over 2 micro-batches == one-shot q_dedup_near") {
    val srcDir = Files.createTempDirectory("graft_incdedup_src").toFile.getAbsolutePath
    val stateBase = Files.createTempDirectory("graft_incdedup_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_incdedup_cp").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)

    def write(name: String, df: DataFrame): Unit = {
      val tmp = Files.createTempDirectory("graft_incdedup_w").toFile.getAbsolutePath
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(srcDir, name))
      ()
    }
    // ingest in two batches: the existing corpus, then the "nightly" half
    write("f1.parquet", docs.filter(col("doc_id") % 2 === 0))
    Thread.sleep(1100) // distinct mod times → deterministic file order
    write("f2.parquet", docs.filter(col("doc_id") % 2 === 1))

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
    val q = IncrementalDedup.attach(stream, stateBase)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = pairSet(IncrementalDedup.readPairs(spark, stateBase))
    val want = pairSet(DedupQueries.dedupNear.query(spark, sfTiny))
    want should not be empty
    got shouldBe want
    // each pair emitted exactly once across batches (no re-emission of
    // old-old pairs in later batches)
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe want.size.toLong
  }

  test("crash replay of a committed batch id lands nothing") {
    val stateBase = Files.createTempDirectory("graft_incdedup_replay").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    IncrementalDedup.processBatch(spark, b0, stateBase, Some(0L))
    IncrementalDedup.processBatch(spark, b1, stateBase, Some(1L))
    val committed = pairSet(IncrementalDedup.readPairs(spark, stateBase))
    val committedCount = IncrementalDedup.readPairs(spark, stateBase).count()
    // a foreachBatch retry re-delivers batch 1 after the commit: the
    // <= tag guard must land nothing (the old append-mode state would
    // have double-landed signatures AND re-emitted every pair)
    IncrementalDedup.processBatch(spark, b1, stateBase, Some(1L)).count() shouldBe 0L
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe committed
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe committedCount
    committed shouldBe pairSet(DedupQueries.dedupNear.query(spark, sfTiny))
  }

  test("a document re-emitted under a NEW batch id lands nothing (first-write-wins)") {
    val stateBase = Files.createTempDirectory("graft_incdedup_reemit").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 2 === 0),
      stateBase, Some(0L))
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 2 === 1),
      stateBase, Some(1L))
    val want = pairSet(IncrementalDedup.readPairs(spark, stateBase))
    val wantCount = IncrementalDedup.readPairs(spark, stateBase).count()
    // an at-least-once source re-delivers the odd half in a LATER batch:
    // the replay tag does not fire (new id), so the per-doc anti-join
    // must — without it every pair touching those docs re-emits (row
    // duplicates in the pair store) and signatures double
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 2 === 1),
      stateBase, Some(2L)).count() shouldBe 0L
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe want
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe wantCount
  }

  test("compaction folds the three families, tombstones inputs (deferred GC), and changes nothing served; further ingest continues") {
    val stateBase = Files.createTempDirectory("graft_incdedup_cmp").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    for (i <- 0 until 3)
      IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 4 === i),
        stateBase, Some(i.toLong))
    val st3 = IncrementalDedup.currentState(spark, stateBase)
    st3.segs.size shouldBe 3
    val before = pairSet(IncrementalDedup.readPairs(spark, stateBase))
    val beforeCount = IncrementalDedup.readPairs(spark, stateBase).count()
    // a reader resolved BEFORE the fold must survive the swap
    val preSwapReader = IncrementalDedup.readPairs(spark, stateBase)
    IncrementalDedup.compactSegments(spark, stateBase)
    val stc = IncrementalDedup.currentState(spark, stateBase)
    stc.segs.size shouldBe 1
    stc.batch shouldBe Some(2L) // compaction must not move the replay tag
    stc.tombs.toSet shouldBe st3.segs.toSet
    // on-disk per family = live segs + tombstones; content verbatim
    // (row count preserved — pairs keep exact multiplicity)
    for (f <- Seq("banded", "hashed", "pairs"))
      new java.io.File(s"$stateBase/$f").listFiles().map(_.getName).toSet shouldBe
        (stc.segs.toSet ++ stc.tombs)
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe before
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe beforeCount
    pairSet(preSwapReader) shouldBe before
    // ingest continues onto the compacted state; first-write-wins still
    // reads the folded hashed segment (batch 3 docs are genuinely new)
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 4 === 3),
      stateBase, Some(3L))
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe
      pairSet(DedupQueries.dedupNear.query(spark, sfTiny))
    // a SECOND compaction reclaims generation-1's tombstones
    IncrementalDedup.compactSegments(spark, stateBase)
    val st2 = IncrementalDedup.currentState(spark, stateBase)
    (st2.tombs.toSet intersect stc.tombs.toSet) shouldBe empty
    for (f <- Seq("banded", "hashed", "pairs"))
      new java.io.File(s"$stateBase/$f").listFiles().map(_.getName).toSet shouldBe
        (st2.segs.toSet ++ st2.tombs)
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe
      pairSet(DedupQueries.dedupNear.query(spark, sfTiny))
  }

  test("auto-compaction: a long-running ingest folds itself — segments bounded, pairs one-shot-equal") {
    import spark.implicits._
    val stateBase = Files.createTempDirectory("graft_incdedup_auto").toFile.getAbsolutePath
    // 18 near-duplicate-rich tiny batches: publish #16 trips the fold
    val base = (0 until 12).map(i => s"w$i").mkString(" ")
    val docs = (0L until 18L).map(i =>
      (i, "en", if (i % 2 == 0) base else s"$base extra$i"))
      .toDF("doc_id", "lang", "text").localCheckpoint()
    for (i <- 0 until 18)
      IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") === i),
        stateBase, Some(i.toLong))
    val st = IncrementalDedup.currentState(spark, stateBase)
    st.batch shouldBe Some(17L)
    st.segs.size should be < 16 // folded at least once
    // served pairs equal the one-shot banded-LSH + verify over the full
    // corpus — through the PRODUCTION candidate generator, so the test
    // oracle cannot silently diverge from the operator's contract
    val sets = docs.select(col("doc_id"), col("lang"),
      graft.functions.Tokenize.tokenSet(col("text")).as("toks"))
    val want = pairSet(DedupQueries.verifyJaccard(
      DedupQueries.minhashBandCandidates(sets),
      docs.select(col("doc_id"),
        graft.functions.Tokenize.hashedTokenSet(col("text")).as("toksh")), 1, 2))
    want should not be empty
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe want
  }

  test("compactFrom: stale-observed rebase keeps an interloper batch; an overlapping fold aborts without double-listing") {
    val stateBase = Files.createTempDirectory("graft_incdedup_rebase").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    for (i <- 0 until 2)
      IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 3 === i),
        stateBase, Some(i.toLong))
    // compactor observes {b0, b1}; an ingest lands b2 BEFORE it publishes
    val observed = IncrementalDedup.currentState(spark, stateBase)
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      stateBase, Some(2L))
    val want = pairSet(IncrementalDedup.readPairs(spark, stateBase))
    val wantCount = IncrementalDedup.readPairs(spark, stateBase).count()
    want shouldBe pairSet(DedupQueries.dedupNear.query(spark, sfTiny))
    IncrementalDedup.compactFrom(spark, stateBase, observed)
    val st = IncrementalDedup.currentState(spark, stateBase)
    // the rebase kept the interloper's segment alongside the compacted dir
    st.segs.count(_.startsWith("c")) shouldBe 1
    st.segs.count(_.startsWith("b")) shouldBe 1
    st.batch shouldBe Some(2L)
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe want
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe wantCount
    // an OVERLAPPING fold (the pre-append observed state again): its
    // inputs are now readable-but-tombstoned — the all-live guard must
    // abort without double-listing the shared content
    IncrementalDedup.compactFrom(spark, stateBase, observed)
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe want
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe wantCount
    IncrementalDedup.currentState(spark, stateBase).segs
      .count(_.startsWith("c")) shouldBe 1
    // further ingest on the compacted state still pairs correctly
    // (first-write-wins re-admits nothing; replaying batch 2 is a no-op)
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      stateBase, Some(2L))
    IncrementalDedup.readPairs(spark, stateBase).count() shouldBe wantCount
  }

  test("concurrent ingest: two writers racing the same state lose no batch") {
    val stateBase = Files.createTempDirectory("graft_incdedup_race").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    IncrementalDedup.processBatch(spark, docs.filter(col("doc_id") % 3 === 0),
      stateBase, Some(0L))
    // two genuinely concurrent writers from the SAME committed state:
    // one wins the v2 CAS, the loser must rebase onto the winner and
    // recompute its pair emission against the winner's segments
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    raceAll(
      () => { IncrementalDedup.processBatch(spark, b1, stateBase, None); () },
      () => { IncrementalDedup.processBatch(spark, b2, stateBase, None); () })
    IncrementalDedup.currentState(spark, stateBase).version shouldBe 2L
    pairSet(IncrementalDedup.readPairs(spark, stateBase)) shouldBe
      pairSet(DedupQueries.dedupNear.query(spark, sfTiny))
  }
}
