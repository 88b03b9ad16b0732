package graft

import java.nio.file.Files

import graft.streaming.{IncrementalAgg, StreamOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Incremental aggregate (matview) invariant: count and decimal-sum
  * partials are associative+commutative, so merging per-micro-batch
  * partials into versioned state over ANY batch split must equal the
  * one-shot aggregate over the whole fixture, bit for bit (decimal sums —
  * no float order sensitivity).
  */
class IncrementalAggSpec extends SparkTestBase with Matchers {

  test("foreachBatch incremental per-type count/sum over micro-batches == one-shot aggregate") {
    val stateBase = Files.createTempDirectory("graft_incagg_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_incagg_cp").toFile.getAbsolutePath
    val srcDir = Files.createTempDirectory("graft_incagg_src").toFile.getAbsolutePath

    // the fixture is a single file (= a single micro-batch); split it into
    // three source files so the merge path really runs state ∘ batch three
    // times, not once from empty
    val events = Tables.eventsRawNanos(spark, sfTiny)
    for (i <- 0 until 3) {
      events.filter(col("event_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/part$i")
      val f = new java.io.File(s"$srcDir/part$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    val stream = StreamOps.normalizeTs(
      spark.readStream.schema(StreamOps.eventsRawSchema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .option("pathGlobFilter", "f*.parquet")
        .parquet(srcDir))
    val q = IncrementalAgg.attach(stream, stateBase)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
    // three micro-batches merged → three state versions behind _CURRENT
    new java.io.File(stateBase).listFiles()
      .count(_.getName.startsWith("v")) should be >= 3

    def triples(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = triples(IncrementalAgg.readState(spark, stateBase)
      .select(col("event_type"), col("n"),
        col("sum_value").cast(DoubleType).as("sum_value"))
      .collect())
    val want = triples(Tables.events(spark, sfTiny)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(9, 2))).cast(DecimalType(38, 2))
          .cast(DoubleType).as("sum_value"))
      .collect())
    got shouldBe want

    // _CURRENT points at the newest version and a second read returns the
    // same rows (reader isolation across the swap)
    triples(IncrementalAgg.readState(spark, stateBase)
      .select(col("event_type"), col("n"),
        col("sum_value").cast(DoubleType).as("sum_value"))
      .collect()) shouldBe got
  }

  test("crash replay of a committed batch id is skipped, not double-counted") {
    val stateBase = Files.createTempDirectory("graft_incagg_replay").toFile.getAbsolutePath
    val events = Tables.events(spark, sfTiny)
    val b0 = events.filter(col("event_id") % 2 === 0)
    val b1 = events.filter(col("event_id") % 2 === 1)
    IncrementalAgg.processBatch(spark, b0, stateBase, Some(0L))
    IncrementalAgg.processBatch(spark, b1, stateBase, Some(1L))
    def snap() = IncrementalAgg.readState(spark, stateBase)
      .collect().map(_.toString).sorted.toSeq
    val committed = snap()
    // a foreachBatch retry re-delivers batch 1 after the state committed:
    // the <= tag guard must make it a no-op
    IncrementalAgg.processBatch(spark, b1, stateBase, Some(1L))
    snap() shouldBe committed
    IncrementalAgg.processBatch(spark, b0, stateBase, Some(0L))
    snap() shouldBe committed
  }
}
