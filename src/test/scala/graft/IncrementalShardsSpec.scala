package graft

import java.nio.file.Files

import graft.streaming.IncrementalShards
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Streaming shard-manifest invariant: doc_id-ordered micro-batches
  * extending the global byte sequence from the state's running total and
  * merging per-shard partials (sum/min/max — associative across the
  * shard that spans a batch boundary) must equal the one-shot
  * q_pipeline_shards manifest over the same documents.
  */
class IncrementalShardsSpec extends SparkTestBase with Matchers {

  test("foreachBatch shard manifest over doc_id-ordered micro-batches == one-shot") {
    val stateBase = Files.createTempDirectory("graft_shard_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_shard_cp").toFile.getAbsolutePath
    val srcDir = Files.createTempDirectory("graft_shard_src").toFile.getAbsolutePath

    // 3 contiguous doc_id ranges → 3 in-order micro-batches (the offset
    // contract; file mod-time order enforces batch order)
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "n_chars", "text")
    val cuts = docs.stat.approxQuantile("doc_id", Array(0.33, 0.66), 0.0)
    val ranges = Seq(
      col("doc_id") <= cuts(0),
      col("doc_id") > cuts(0) && col("doc_id") <= cuts(1),
      col("doc_id") > cuts(1))
    for ((p, i) <- ranges.zipWithIndex) {
      docs.filter(p).coalesce(1).write.mode("overwrite").parquet(s"$srcDir/part$i")
      val f = new java.io.File(s"$srcDir/part$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .option("pathGlobFilter", "f*.parquet")
      .parquet(srcDir)
    val q = IncrementalShards.attach(stream, stateBase)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val got = rows(IncrementalShards.readState(spark, stateBase))
    val want = rows(graft.operators.CurationQueries.pipelineShards.query(spark, sfTiny))
    got shouldBe want
    want.size should be > 1 // multiple shards — boundary-spanning merge exercised

    // REPAIR: a late correction doubles one mid-corpus doc's text. Only
    // the suffix from that doc's shard re-shards; the repaired manifest
    // must equal the one-shot manifest over the corrected corpus, and
    // the prefix rows must be byte-identical to the pre-repair state.
    val mid = docs.agg(expr("percentile_approx(doc_id, 0.5, 10000)")).collect()(0).getLong(0)
    val corrected = docs.withColumn("text",
        when(col("doc_id") === mid, concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")))
      .withColumn("n_chars",
        when(col("doc_id") === mid, col("n_chars") * 2 + 1).otherwise(col("n_chars")))
    val preRepair = IncrementalShards.readState(spark, stateBase).collect().map(_.toSeq).toSet
    val repaired = rows(IncrementalShards.repair(spark, corrected, mid, stateBase))
    corrected.createOrReplaceTempView("graft_shard_corrected")
    val wantRepaired = {
      val w2 = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      rows(corrected
        .select(col("doc_id"), col("n_chars"),
          graft.functions.Tokenize.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("offset", sum("n_chars").over(w2) - col("n_chars"))
        .withColumn("shard_id", floor(col("offset") / IncrementalShards.ShardBytes))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_bytes"),
          sum("n_tokens").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc")))
    }
    repaired shouldBe wantRepaired
    // untouched prefix shards carried over verbatim from the old state
    preRepair.intersect(repaired).size should be > 0
  }

  test("crash replay of a committed doc batch is skipped (offsets never double-shift)") {
    import org.apache.spark.sql.functions._
    val stateBase = java.nio.file.Files
      .createTempDirectory("graft_incshards_replay").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "n_chars", "text")
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    IncrementalShards.processBatch(spark, b0, stateBase, Some(0L))
    IncrementalShards.processBatch(spark, b1, stateBase, Some(1L))
    val committed = IncrementalShards.readState(spark, stateBase)
      .collect().map(_.toString).sorted.toSeq
    // a replayed batch would double-count bytes and shift every later
    // offset — the <= tag guard must make it a no-op
    IncrementalShards.processBatch(spark, b1, stateBase, Some(1L))
    IncrementalShards.readState(spark, stateBase)
      .collect().map(_.toString).sorted.toSeq shouldBe committed
    IncrementalShards.committedBatch(spark, stateBase) shouldBe Some(1L)
  }
}
