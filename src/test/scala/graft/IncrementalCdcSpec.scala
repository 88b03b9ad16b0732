package graft

import java.nio.file.Files

import graft.streaming.IncrementalCdc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Streaming CDC apply invariant: applying key-partitioned change batches
  * sequentially through the versioned-state merge equals applying the
  * whole change set at once (q_cdc_upsert's one-shot merge) — distinct
  * keys commute across batches, delete-wins resolves within one.
  */
class IncrementalCdcSpec extends SparkTestBase with Matchers {

  test("foreachBatch CDC apply over key-split micro-batches == one-shot MERGE") {
    val stateBase = Files.createTempDirectory("graft_cdc_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_cdc_cp").toFile.getAbsolutePath
    val srcDir = Files.createTempDirectory("graft_cdc_src").toFile.getAbsolutePath

    val orders = Tables.orders(spark, sfTiny)
    // seed the standing snapshot as state v0 (the initial table load)
    orders.filter(col("o_orderkey") % 3 =!= 0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$stateBase/v0")
    graft.sources.GraftFs.writeSmallFileAtomic(spark, s"$stateBase/_CURRENT", "v0")

    // the q_cdc_upsert change set, split into 3 files BY KEY so every
    // key's ops (incl. the %10 delete+update pair) ride together
    val changes = orders
      .filter(col("o_orderkey") % 2 === 0 || col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("o_custkey").as("c_custkey"),
        (col("o_totalprice") + 10.0).as("new_price"))
    for (i <- 0 until 3) {
      changes.filter(pmod(col("o_orderkey"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/part$i")
      val f = new java.io.File(s"$srcDir/part$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    val changeSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("op", StringType),
      StructField("c_custkey", LongType), StructField("new_price", DoubleType)))
    val stream = spark.readStream.schema(changeSchema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .option("pathGlobFilter", "f*.parquet")
      .parquet(srcDir)
    val q = IncrementalCdc.attach(stream, stateBase)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
    // v0 seed + three applied batches
    new java.io.File(stateBase).listFiles()
      .count(_.getName.startsWith("v")) should be >= 4

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderkey", "o_custkey", "o_totalprice").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = rows(IncrementalCdc.readState(spark, stateBase))
    val want = rows(graft.operators.CdcQueries.applyStage(orders))
    got shouldBe want
    want.size should be > 0
    // a seeded key hit by a delete is gone (5: in snapshot, %5==0 → D),
    // and an off-snapshot upsert key arrived (6: %3==0 excluded from the
    // seed, %2==0 → inserted)
    got.map(_._1) should not contain 5L
    got.map(_._1) should contain(6L)
  }

  test("crash replay of a committed change batch is skipped, not re-applied") {
    import org.apache.spark.sql.functions._
    val stateBase = java.nio.file.Files
      .createTempDirectory("graft_inccdc_replay").toFile.getAbsolutePath
    val orders = Tables.orders(spark, sfTiny).limit(200)
    val b0 = orders.select(col("o_orderkey"), lit("U").as("op"),
      col("o_custkey").as("c_custkey"), col("o_totalprice").as("new_price"))
    IncrementalCdc.processBatch(spark, b0, stateBase, Some(0L))
    // batch 1 deletes every key; a replay of it must be a no-op
    val b1 = orders.select(col("o_orderkey"), lit("D").as("op"),
      lit(0L).as("c_custkey"), lit(0.0).as("new_price")).limit(50)
    IncrementalCdc.processBatch(spark, b1, stateBase, Some(1L))
    val committed = IncrementalCdc.readState(spark, stateBase)
      .collect().map(_.toString).sorted.toSeq
    IncrementalCdc.processBatch(spark, b1, stateBase, Some(1L))
    IncrementalCdc.readState(spark, stateBase)
      .collect().map(_.toString).sorted.toSeq shouldBe committed
    IncrementalCdc.committedBatch(spark, stateBase) shouldBe Some(1L)
  }
}
