package graft

import java.nio.file.Files

import graft.streaming.IncrementalDrift
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Incremental drift-state invariant: merging per-batch (source, token)
  * count partials over ANY batch split must serve the SAME Dunning-G²
  * drift as the one-shot q_text_drift — row identical.
  */
class IncrementalDriftSpec extends SparkTestBase with Matchers {

  test("batched count merges serve drift identical to one-shot q_text_drift") {
    val base = Files.createTempDirectory("graft_incdrift").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny)
    // three arbitrary-split batches
    for ((pred, bid) <- Seq(
        (col("doc_id") % 3 === 0, 0L),
        (col("doc_id") % 3 === 1, 1L),
        (col("doc_id") % 3 === 2, 2L))) {
      IncrementalDrift.processBatch(spark, docs.filter(pred), base, Some(bid))
    }
    val fromState = IncrementalDrift.driftFromState(spark, base)
      .collect().map(_.toString).toSeq
    val oneShot = graft.operators.TextQueries.textDrift.query(spark, sfTiny)
      .collect().map(_.toString).toSeq
    fromState should not be empty
    fromState shouldBe oneShot

    // replay protection: re-landing batch 2 is a no-op
    val counts = IncrementalDrift.readCounts(spark, base)
      .agg(sum("n")).collect()(0).getLong(0)
    IncrementalDrift.processBatch(spark, docs.filter(col("doc_id") % 3 === 2), base, Some(2L))
    IncrementalDrift.readCounts(spark, base)
      .agg(sum("n")).collect()(0).getLong(0) shouldBe counts
    // a manual no-id call must not erase the committed tag
    IncrementalDrift.processBatch(spark, docs.limit(0), base, None)
    IncrementalDrift.processBatch(spark, docs.filter(col("doc_id") % 3 === 2), base, Some(2L))
    IncrementalDrift.readCounts(spark, base)
      .agg(sum("n")).collect()(0).getLong(0) shouldBe counts
    // and the served drift is unchanged by the no-op batches
    IncrementalDrift.driftFromState(spark, base)
      .collect().map(_.toString).toSeq shouldBe oneShot
  }
}
