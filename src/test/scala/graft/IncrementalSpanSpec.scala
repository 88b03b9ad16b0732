package graft

import graft.operators.TextQueries
import graft.streaming.IncrementalSpan
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Incremental span-provenance invariant: appending per-batch window
  * occurrences + merging the associative (count, min-holder) partials
  * over ANY batch split must equal the one-shot audit — serve from
  * replayed state must be ROW IDENTICAL to q_text_span_source over the
  * whole fixture, and a crash-replayed batch must be a no-op.
  */
class IncrementalSpanSpec extends SparkTestBase with Matchers {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).toSeq

  test("3-batch ingest == one-shot q_text_span_source; replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft_span_state")
      .toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    for (i <- 0 until 3)
      IncrementalSpan.processBatch(spark, docs.filter(col("doc_id") % 3 === i),
        base, batchId = Some(i.toLong))
    val served = rows(IncrementalSpan.serveSpanSource(spark, base))
    served should not be empty
    served shouldBe rows(TextQueries.textSpanSource.query(spark, sfTiny))
    // crash-replay of a committed batch id: bit-identical serve
    IncrementalSpan.processBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      base, batchId = Some(2L))
    rows(IncrementalSpan.serveSpanSource(spark, base)) shouldBe served
  }

  test("compaction: folded segments serve identically; interleaved ingest rebase loses nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft_span_compact")
      .toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    for (i <- 0 until 3)
      IncrementalSpan.processBatch(spark, docs.filter(col("doc_id") % 4 === i),
        base, batchId = Some(i.toLong))
    val before = rows(IncrementalSpan.serveSpanSource(spark, base))
    val st3 = IncrementalSpan.currentState(spark, base)
    IncrementalSpan.compactSegments(spark, base)
    val stC = IncrementalSpan.currentState(spark, base)
    stC.occSegs.length shouldBe 1 // three batch segments folded into one
    stC.docSegs.length shouldBe 1
    // deferred GC (r15): the folded inputs are TOMBSTONED in both
    // families, still on disk for pre-swap readers
    stC.occTombs.toSet shouldBe st3.occSegs.toSet
    stC.docTombs.toSet shouldBe st3.docSegs.toSet
    new java.io.File(s"$base/occ").listFiles().map(_.getName).toSet shouldBe
      (stC.occSegs.toSet ++ stC.occTombs)
    new java.io.File(s"$base/docs").listFiles().map(_.getName).toSet shouldBe
      (stC.docSegs.toSet ++ stC.docTombs)
    rows(IncrementalSpan.serveSpanSource(spark, base)) shouldBe before
    // lost-CAS rebase: a batch commits BETWEEN a compactor's read and its
    // publish — the compactor must keep the interloper's segments
    val observed = IncrementalSpan.currentState(spark, base)
    IncrementalSpan.processBatch(spark, docs.filter(col("doc_id") % 4 === 3),
      base, batchId = Some(3L))
    val full = rows(IncrementalSpan.serveSpanSource(spark, base))
    full shouldBe rows(TextQueries.textSpanSource.query(spark, sfTiny))
    IncrementalSpan.compactFrom(spark, base, observed)
    rows(IncrementalSpan.serveSpanSource(spark, base)) shouldBe full
    // replay after compaction is still a no-op
    IncrementalSpan.processBatch(spark, docs.filter(col("doc_id") % 4 === 3),
      base, batchId = Some(3L))
    rows(IncrementalSpan.serveSpanSource(spark, base)) shouldBe full
    // a SECOND real compaction (c-dir + the interloper's segment)
    // reclaims generation-1's tombstones at entry and tombstones its
    // own inputs — the r15 deferred-GC round trip for both families
    IncrementalSpan.compactSegments(spark, base)
    val st2 = IncrementalSpan.currentState(spark, base)
    st2.occSegs.length shouldBe 1
    (st2.occTombs.toSet intersect stC.occTombs.toSet) shouldBe empty
    new java.io.File(s"$base/occ").listFiles().map(_.getName).toSet shouldBe
      (st2.occSegs.toSet ++ st2.occTombs)
    new java.io.File(s"$base/docs").listFiles().map(_.getName).toSet shouldBe
      (st2.docSegs.toSet ++ st2.docTombs)
    rows(IncrementalSpan.serveSpanSource(spark, base)) shouldBe full
  }

  test("concurrent ingest: two sessions racing the same state lose no batch") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_span_race")
      .toFile.getAbsolutePath
    IncrementalSpan.processBatch(spark,
      Seq((1L, (0 until 25).map(i => s"a$i").mkString(" "))).toDF("doc_id", "text"),
      base, Some(0L))
    // two genuinely concurrent writers from the SAME committed state:
    // both observe v0, both attempt the v1 CAS — exactly one wins it,
    // the loser must rebase onto the winner (the old pointer-swap bug
    // silently dropped one batch here)
    val bBatch = Seq((2L, (0 until 25).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val cBatch = Seq((3L, (0 until 25).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    raceAll(
      () => { IncrementalSpan.processBatch(spark, bBatch, base, None); () },
      () => { IncrementalSpan.processBatch(spark, cBatch, base, None); () })
    val got = IncrementalSpan.serveSpanSource(spark, base).collect()
      .map(_.getLong(0)).toSet
    got shouldBe Set(1L, 2L, 3L) // nobody's batch was lost or torn
    IncrementalSpan.currentState(spark, base).version shouldBe 2L
  }

  test("a document re-emitted under a NEW batch id lands nothing (first-write-wins)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_span_reemit")
      .toFile.getAbsolutePath
    val doc = Seq((1L, (0 until 25).map(i => s"a$i").mkString(" ")))
      .toDF("doc_id", "text")
    IncrementalSpan.processBatch(spark, doc, base, Some(0L))
    val before = IncrementalSpan.serveSpanSource(spark, base).collect()
      .map(_.toString).sorted.toSeq
    // an at-least-once source re-delivers doc 1 in a LATER batch: the
    // replay tag does not fire (new id), so the doc-grain anti-join must
    // — without it the window counts double in occ AND the merged stats
    IncrementalSpan.processBatch(spark, doc, base, Some(1L))
    IncrementalSpan.serveSpanSource(spark, base).collect()
      .map(_.toString).sorted.toSeq shouldBe before
  }

  test("superseded stats dirs are GC'd: at most two stats versions survive a long ingest") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_span_gc")
      .toFile.getAbsolutePath
    for (i <- 0 until 5)
      IncrementalSpan.processBatch(spark,
        Seq((i.toLong, (0 until 22).map(j => s"t${i}_$j").mkString(" ")))
          .toDF("doc_id", "text"), base, Some(i.toLong))
    val statsDirs = new java.io.File(s"$base/stats").listFiles()
    statsDirs.length should be <= 2 // current + one superseded, never the full history
    IncrementalSpan.serveSpanSource(spark, base).count() shouldBe 5L
  }

  test("cross-batch copy directions attribute to the true earliest holder") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_span_crafted")
      .toFile.getAbsolutePath
    val block = (0 until 25).map(i => s"w$i").mkString(" ")
    // original lands in batch 0; the copier arrives TWO batches later —
    // the min-holder merge must still attribute across the batch gap
    IncrementalSpan.processBatch(spark,
      Seq((1L, block)).toDF("doc_id", "text"), base, Some(0L))
    IncrementalSpan.processBatch(spark,
      Seq((2L, (0 until 22).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text"),
      base, Some(1L))
    IncrementalSpan.processBatch(spark,
      Seq((3L, block + " tail0 tail1")).toDF("doc_id", "text"), base, Some(2L))
    val got = IncrementalSpan.serveSpanSource(spark, base).collect()
      .map(r => r.getLong(0) -> r).toMap
    got(1L).getLong(2) shouldBe 0L // the original copied nothing
    got(3L).getLong(2) shouldBe 6L // all 6 shared windows attributed
    got(3L).getLong(4) shouldBe 1L // to the batch-0 original
    // facade handle serves the same rows, before and after facade compact
    import graft.api.implicits._
    val h = spark.graft.spanState(base)
    val served = rows(h.provenance)
    served shouldBe rows(IncrementalSpan.serveSpanSource(spark, base))
    h.compact()
    rows(h.provenance) shouldBe served
  }

  test("serveNovelty from state == the registered q_text_novelty over the same split") {
    val base = java.nio.file.Files.createTempDirectory("graft_span_novelty")
      .toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    // ingest ONLY the standing slice (the registered query's %5 rule),
    // in two batches; the incoming slice is the admission candidate
    for (i <- 0 until 2)
      IncrementalSpan.processBatch(spark,
        docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 2 === i),
        base, batchId = Some(i.toLong))
    val served = rows(IncrementalSpan.serveNovelty(spark, base,
      docs.filter(col("doc_id") % 5 === 0)))
    served should not be empty
    served shouldBe rows(
      graft.operators.CurationQueries.textNovelty.query(spark, sfTiny))
    // the facade verb over two explicit frames agrees too
    import graft.api.implicits._
    rows(docs.filter(col("doc_id") % 5 === 0)
      .graft.novelty(docs.filter(col("doc_id") % 5 =!= 0))) shouldBe served
  }
}
