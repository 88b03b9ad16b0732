package graft

import java.nio.file.Files

import graft.operators.TextQueries
import graft.streaming.IncrementalWinnow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Incremental winnow-index invariant: fingerprints are content-only, so
  * the maintained fp relation over ANY batch split equals the one-shot
  * extraction, and the served match step equals q_text_winnow_pairs
  * exactly — including the global df-cap (a fingerprint pushed over the
  * cap by a LATER batch must drop out of matches retroactively). State
  * runs the log-record CAS protocol: replays land nothing, concurrent
  * writers lose nothing.
  */
class IncrementalWinnowSpec extends SparkTestBase with Matchers {

  private def pairSet(df: DataFrame) =
    df.select("doc_id1", "doc_id2", "n_shared", "overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def oneShot(docs: DataFrame) = pairSet(TextQueries.winnowPairsOn(docs))

  test("3-batch split ingest serves the one-shot match set; replay lands nothing") {
    val base = Files.createTempDirectory("graft_incwin").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    for (i <- 0 until 3)
      IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === i),
        base, Some(i.toLong))
    val want = oneShot(docs)
    want should not be empty
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe want
    // crash replay of committed batch 2: the <= tag guard lands nothing
    val st = IncrementalWinnow.currentState(spark, base)
    IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      base, Some(2L))
    IncrementalWinnow.currentState(spark, base).version shouldBe st.version
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe want
  }

  test("the df-cap is global: a later batch pushing a fingerprint over the cap drops its matches retroactively") {
    import spark.implicits._
    val boiler = (0 until 10).map(i => s"bp$i").mkString(" ")
    def doc(id: Long, extra: String) =
      (id, s"$boiler $extra " + (0 until 10).map(i => s"u${id}_$i").mkString(" "))
    val base = Files.createTempDirectory("graft_incwin_cap").toFile.getAbsolutePath
    // batch 0: 10 docs sharing the boilerplate run — under the df-cap of
    // 16, they all pair up on its fingerprints
    val b0 = (0L until 10L).map(i => doc(i, "")).toDF("doc_id", "text")
    IncrementalWinnow.processBatch(spark, b0, base, Some(0L))
    val before = pairSet(IncrementalWinnow.serveWinnowPairs(spark, base))
    before should not be empty
    // batch 1: 10 MORE docs with the same boilerplate → its fingerprints
    // now exceed the cap; matches that existed only through them vanish
    val b1 = (10L until 20L).map(i => doc(i, "")).toDF("doc_id", "text")
    IncrementalWinnow.processBatch(spark, b1, base, Some(1L))
    val after = pairSet(IncrementalWinnow.serveWinnowPairs(spark, base))
    after shouldBe empty
    // and the served answer equals the one-shot over the full corpus
    after shouldBe oneShot(b0.unionByName(b1))
  }

  test("compaction folds segments to one distinct relation, tombstones inputs (deferred GC), and changes nothing served; lost-CAS rebase keeps an interloper segment") {
    val base = Files.createTempDirectory("graft_incwin_cmp").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    for (i <- 0 until 3)
      IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 4 === i),
        base, Some(i.toLong))
    val st3 = IncrementalWinnow.currentState(spark, base)
    st3.segs.size shouldBe 3
    // a reader resolved BEFORE the compaction (the serve-while-ingest
    // race, r14 ADVICE): its segment files must survive the swap
    val preSwapReader = IncrementalWinnow.serveWinnowPairs(spark, base)
    IncrementalWinnow.compactSegments(spark, base)
    val stc = IncrementalWinnow.currentState(spark, base)
    stc.segs.size shouldBe 1
    stc.batch shouldBe Some(2L) // compaction must not move the replay tag
    // deferred GC: the folded inputs are TOMBSTONED, not deleted — still
    // on disk for pre-swap readers until the NEXT compaction publishes
    stc.tombs.toSet shouldBe st3.segs.toSet
    val fpsDir = new java.io.File(s"$base/fps")
    fpsDir.listFiles().map(_.getName).toSet shouldBe (stc.segs.toSet ++ stc.tombs)
    // the pre-swap reader executes cleanly against the tombstoned dirs
    pairSet(preSwapReader) shouldBe oneShot(docs.filter(col("doc_id") % 4 < 3))
    // rebase: compacting a STALE observed state (captured before a new
    // batch landed) keeps the interloper's segment alongside the
    // compacted dir — nothing committed since the observation is lost
    IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 4 === 3),
      base, Some(3L))
    val st4 = IncrementalWinnow.currentState(spark, base)
    st4.segs.size shouldBe 2
    IncrementalWinnow.processBatch(spark, docs.limit(0), base, Some(4L))
    val st5 = IncrementalWinnow.currentState(spark, base)
    st5.segs.size shouldBe 3
    // fold ONLY the two segments st4 saw; batch 4's segment must survive
    IncrementalWinnow.compactFrom(spark, base, st4)
    val st6 = IncrementalWinnow.currentState(spark, base)
    st6.batch shouldBe Some(4L)
    st6.segs.size shouldBe 2
    (st6.segs.toSet intersect (st5.segs.toSet -- st4.segs.toSet)) should not be empty
    // the SECOND compaction reclaimed the first generation's tombstones
    // and tombstoned its own inputs
    st6.tombs.toSet shouldBe st4.segs.toSet
    (fpsDir.listFiles().map(_.getName).toSet intersect stc.tombs.toSet) shouldBe empty
    fpsDir.listFiles().map(_.getName).toSet shouldBe (st6.segs.toSet ++ st6.tombs)
    // served answer ≡ one-shot through every fold
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe oneShot(docs)
  }

  test("auto-compaction: a long-running ingest folds itself — segment count stays bounded and serve stays one-shot-equal") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_incwin_auto").toFile.getAbsolutePath
    // 18 tiny batches: publish #16 leaves 16 segments, which trips the
    // in-processBatch fold; later batches append onto the compacted dir
    val docs = (0L until 18L).map(i =>
      (i, s"w${i}a w${i}b w${i}c shared0 shared1 shared2 shared3 shared4"))
      .toDF("doc_id", "text")
    for (i <- 0 until 18)
      IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") === i),
        base, Some(i.toLong))
    val st = IncrementalWinnow.currentState(spark, base)
    st.batch shouldBe Some(17L)
    // without the auto-fold this would be 18; the 16-segment trigger
    // folded once, so live segments = 1 compacted + the appends since
    st.segs.size should be < 16
    // on-disk segment dirs = the record's live segs + its deferred-GC
    // tombstones (the last fold's inputs, reclaimed by the next fold)
    new java.io.File(s"$base/fps").listFiles().map(_.getName).toSet shouldBe
      (st.segs.toSet ++ st.tombs)
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe oneShot(docs)
  }

  test("serve-while-ingest: continuous reads race the auto-compacting ingest and never lose a file (deferred GC)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_incwin_serveingest").toFile.getAbsolutePath
    // 20 batches trip the 16-segment auto-fold mid-race; the reader loop
    // resolves a record and executes its scan while folds land — before
    // the r15 deferred GC this threw FileNotFoundException in steady
    // state (the r14 ADVICE medium), now the tombstoned dirs outlive the
    // swap by a full generation
    val docs = (0L until 20L).map(i =>
      (i, s"r${i}a r${i}b r${i}c shr0 shr1 shr2 shr3 shr4"))
      .toDF("doc_id", "text").localCheckpoint()
    IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") === 0), base, Some(0L))
    raceAll(
      () => for (i <- 1 until 20)
        IncrementalWinnow.processBatch(spark,
          docs.filter(col("doc_id") === i), base, Some(i.toLong)),
      () => for (_ <- 0 until 40) {
        // every read must complete: the fp relation only ever GROWS here
        IncrementalWinnow.readFingerprints(spark, base).count() should be >= 0L
      })
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe oneShot(docs)
  }

  test("concurrent ingest: two writers racing the same state lose no batch") {
    val base = Files.createTempDirectory("graft_incwin_race").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 0),
      base, Some(0L))
    raceAll(
      () => IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 1), base, None),
      () => IncrementalWinnow.processBatch(spark, docs.filter(col("doc_id") % 3 === 2), base, None))
    IncrementalWinnow.currentState(spark, base).version shouldBe 2L
    pairSet(IncrementalWinnow.serveWinnowPairs(spark, base)) shouldBe oneShot(docs)
  }
}
