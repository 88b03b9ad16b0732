package graft

import java.nio.file.Files

import graft.operators.SearchQueries
import graft.streaming.IncrementalIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Incremental inverted-index invariant: appending per-batch posting
  * segments + merging df/cf partials over ANY batch split must equal
  * the one-shot index — searchHeads from replayed state must be ROW
  * IDENTICAL to q_text_index over the whole fixture.
  */
class IncrementalIndexSpec extends SparkTestBase with Matchers {

  test("foreachBatch index maintenance over micro-batches == one-shot q_text_index") {
    val stateBase = Files.createTempDirectory("graft_incidx_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_incidx_cp").toFile.getAbsolutePath
    val srcDir = Files.createTempDirectory("graft_incidx_src").toFile.getAbsolutePath

    val docs = Tables.documents(spark, sfTiny)
    for (i <- 0 until 3) {
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/part$i")
      val f = new java.io.File(s"$srcDir/part$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .option("pathGlobFilter", "f*.parquet")
      .parquet(srcDir)
    val q = IncrementalIndex.attach(stream, stateBase)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true

    // three appended posting segments, three stats versions
    new java.io.File(s"$stateBase/postings").listFiles()
      .count(_.getName.startsWith("b")) shouldBe 3
    new java.io.File(s"$stateBase/stats").listFiles()
      .count(_.getName.startsWith("v")) shouldBe 3

    val got = IncrementalIndex.searchHeads(spark, stateBase).collect().map(_.toString)
    val want = SearchQueries.textIndex.query(spark, sfTiny).collect().map(_.toString)
    got should not be empty
    got.toSeq shouldBe want.toSeq

    // stats table is exactly the one-shot df/cf relation (no df filter)
    val gotStats = IncrementalIndex.readStats(spark, stateBase)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val wantStats = docs
      .select(col("doc_id"), explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("token").agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    gotStats shouldBe wantStats

    // the serve loop: BM25 from the maintained state equals the
    // from-scratch facade retrieval over the same corpus and queries
    import graft.api.implicits._
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
      .localCheckpoint()
    val fromState = IncrementalIndex.bm25(spark, stateBase, queries)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val fromScratch = docs.graft.bm25(queries)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    fromState should not be empty
    fromState shouldBe fromScratch

    // the HYBRID serve loop (r10 verdict ask 3): RRF fusion whose lexical
    // side is served ENTIRELY from the 3-batch state must be bit-equal to
    // the registered q_text_hybrid over the same corpus
    val emb = Tables.embeddings(spark, sfTiny)
    val hybridFromState = IncrementalIndex.serveHybrid(spark, stateBase, emb)
      .collect().map(_.toString).toSeq
    val hybridOneShot = SearchQueries.textHybrid.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    hybridFromState should not be empty
    hybridFromState shouldBe hybridOneShot
    // crash-replay no-op: re-landing an already-committed batch id leaves
    // the served hybrid bit-identical
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") % 3 === 2),
      stateBase, batchId = Some(2L))
    IncrementalIndex.serveHybrid(spark, stateBase, emb)
      .collect().map(_.toString).toSeq shouldBe hybridFromState
  }

  test("replayed micro-batch is skipped: postings never double-land") {
    val base = Files.createTempDirectory("graft_incidx_replay").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    val b0 = docs.filter(col("doc_id") < 100)
    IncrementalIndex.processBatch(spark, b0, base, batchId = Some(0L))
    val once = IncrementalIndex.readPostings(spark, base).count()
    // crash-replay of the SAME committed batch id: must be a no-op
    IncrementalIndex.processBatch(spark, b0, base, batchId = Some(0L))
    IncrementalIndex.readPostings(spark, base).count() shouldBe once
    new java.io.File(s"$base/postings").listFiles().length shouldBe 1
    // the next real batch still lands
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 100), base,
      batchId = Some(1L))
    IncrementalIndex.readPostings(spark, base).count() should be > once

    // segment compaction: content unchanged, ONE live dir remains (the
    // folded inputs stay on disk as deferred-GC tombstones until the
    // next compaction — r15), ingest continues
    val heads = IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq
    IncrementalIndex.compactSegments(spark, base)
    val stc = IncrementalIndex.currentState(spark, base)
    stc.segs.length shouldBe 1
    new java.io.File(s"$base/postings").listFiles().map(_.getName).toSet shouldBe
      (stc.segs.toSet ++ stc.tombs)
    IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq shouldBe heads
    IncrementalIndex.processBatch(spark, docs.limit(0), base, batchId = Some(2L))
    IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq shouldBe heads
  }

  test("NULL-text docs count toward n_docs/avgdl: state bm25 == facade bm25 (r11 advice)") {
    import spark.implicits._
    import graft.api.implicits._
    val base = Files.createTempDirectory("graft_incidx_nulls").toFile.getAbsolutePath
    // a NULL-text doc lands ZERO postings (empty string still yields one
    // empty token) — the persisted ingest census must still count it, or
    // every idf/avgdl term drifts from the all-rows registered derivation
    val corpus = Tables.documents(spark, sfTiny).select("doc_id", "text")
      .unionByName(Seq((100000L, Option.empty[String])).toDF("doc_id", "text"))
      .localCheckpoint()
    for (i <- 0 until 2)
      IncrementalIndex.processBatch(spark, corpus.filter(col("doc_id") % 2 === i),
        base, batchId = Some(i.toLong))
    val queries = corpus.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val fromState = IncrementalIndex.bm25(spark, base, queries)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val fromScratch = corpus.graft.bm25(queries)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    fromState should not be empty
    fromState shouldBe fromScratch
    // compaction carries the census forward unchanged
    IncrementalIndex.compactSegments(spark, base)
    IncrementalIndex.bm25(spark, base, queries)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq shouldBe fromState
  }

  test("CAS-guarded compaction: an interleaved append during compact loses nothing") {
    val base = Files.createTempDirectory("graft_incidx_cas").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") < 50), base,
      batchId = Some(0L))
    IncrementalIndex.processBatch(spark,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 100), base, batchId = Some(1L))
    // the compactor reads its input state, then a batch commits BEFORE the
    // compactor publishes (the mid-compact ingest interleaving) — the CAS
    // loses and the rebase must keep the interloper's segment
    val observed = IncrementalIndex.currentState(spark, base)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 100), base,
      batchId = Some(2L))
    val want = IncrementalIndex.readPostings(spark, base)
      .collect().map(_.toString).toSeq.sorted
    IncrementalIndex.compactFrom(spark, base, observed)
    val got = IncrementalIndex.readPostings(spark, base)
      .collect().map(_.toString).toSeq.sorted
    got shouldBe want
    // the LIVE set is exactly {c-dir, interloper}; the folded inputs are
    // tombstoned on disk (deferred GC), not deleted
    val stCas = IncrementalIndex.currentState(spark, base)
    stCas.segs.count(_.startsWith("c")) shouldBe 1
    stCas.segs.count(_.startsWith("b")) shouldBe 1
    stCas.tombs should have size 2
    new java.io.File(s"$base/postings").listFiles().map(_.getName).toSet shouldBe
      (stCas.segs.toSet ++ stCas.tombs)
    // replay protection survived the compaction commit (tag carried in the
    // record): replaying batch 2 is still a no-op
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 100), base,
      batchId = Some(2L))
    IncrementalIndex.readPostings(spark, base)
      .collect().map(_.toString).toSeq.sorted shouldBe want
    // a manual call WITHOUT a batch id must not erase the committed tag
    IncrementalIndex.processBatch(spark, docs.limit(0), base, batchId = None)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 100), base,
      batchId = Some(2L))
    IncrementalIndex.readPostings(spark, base)
      .collect().map(_.toString).toSeq.sorted shouldBe want
  }

  test("duplicate compaction of the same observed state aborts, never double-counts") {
    val base = Files.createTempDirectory("graft_incidx_dup").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") < 50), base,
      batchId = Some(0L))
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 50), base,
      batchId = Some(1L))
    // two admin threads observe the SAME state and both compact: the race
    // loser's rebase must NOT list the compacted dir twice (double-counting
    // every posting in it) nor re-publish a duplicate under another name
    val observed = IncrementalIndex.currentState(spark, base)
    val want = IncrementalIndex.readPostings(spark, base)
      .collect().map(_.toString).toSeq.sorted
    val heads = IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq
    IncrementalIndex.compactFrom(spark, base, observed) // winner
    IncrementalIndex.compactFrom(spark, base, observed) // loser replay
    IncrementalIndex.readPostings(spark, base)
      .collect().map(_.toString).toSeq.sorted shouldBe want
    IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq shouldBe heads
    // exactly ONE live compacted segment in the record
    IncrementalIndex.currentState(spark, base).segs
      .count(_.startsWith("c")) shouldBe 1
  }

  test("overlapping compactions cannot double-list shared postings (all-live fold guard, r15)") {
    val base = Files.createTempDirectory("graft_incidx_overlap").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") < 50), base,
      batchId = Some(0L))
    IncrementalIndex.processBatch(spark,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 100), base, batchId = Some(1L))
    // compactor A observes {b1, b2}; an ingest lands; compactor B
    // observes the superset {b1, b2, b3}
    val observedA = IncrementalIndex.currentState(spark, base)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 100), base,
      batchId = Some(2L))
    val observedB = IncrementalIndex.currentState(spark, base)
    val want = IncrementalIndex.readPostings(spark, base).count()
    // A folds its subset first: {cA, b3} live, {b1, b2} tombstoned
    IncrementalIndex.compactFrom(spark, base, observedA)
    IncrementalIndex.readPostings(spark, base).count() shouldBe want
    // B's folded set {b1, b2, b3} OVERLAPS A's: b1/b2 left the live set
    // but are still READABLE as tombstones — without the all-live guard
    // B would fold all three and publish {cB, cA}, listing b1/b2's
    // postings twice (once in cB, once in cA). B must abort.
    IncrementalIndex.compactFrom(spark, base, observedB)
    IncrementalIndex.readPostings(spark, base).count() shouldBe want
    val st = IncrementalIndex.currentState(spark, base)
    st.segs.count(_.startsWith("c")) shouldBe 1 // only A's output is live
    // and a FRESH compaction (observing A's published state) still folds
    IncrementalIndex.compactSegments(spark, base)
    IncrementalIndex.readPostings(spark, base).count() shouldBe want
    IncrementalIndex.currentState(spark, base).segs.length shouldBe 1
  }

  test("crash between compacted write and segment delete cannot double-count") {
    val base = Files.createTempDirectory("graft_incidx_orphan").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") < 50), base,
      batchId = Some(0L))
    IncrementalIndex.processBatch(spark, docs.filter(col("doc_id") >= 50), base,
      batchId = Some(1L))
    val want = IncrementalIndex.readPostings(spark, base).count()
    // simulate the torn state the OLD listing-driven layout double-counted:
    // a fully-written compacted dir exists but no record references it
    IncrementalIndex.readPostings(spark, base)
      .write.mode("overwrite").parquet(s"$base/postings/c99")
    IncrementalIndex.readPostings(spark, base).count() shouldBe want
    val heads = IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq
    // and a subsequent compaction folds the LIVE list, not the orphan
    IncrementalIndex.compactSegments(spark, base)
    IncrementalIndex.readPostings(spark, base).count() shouldBe want
    IncrementalIndex.searchHeads(spark, base).collect().map(_.toString).toSeq shouldBe heads
  }
}
