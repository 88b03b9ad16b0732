package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (like StateStoreBench): per-batch latency and state
  * growth of the incremental MinHash near-dedup as a corpus arrives in
  * slices — the steady-state cost profile a nightly ingest pipeline
  * cares about (does batch k cost O(batch) or O(corpus)?). Splits the
  * documents fixture into `nBatches` doc_id-mod slices and drives
  * IncrementalDedup.processBatch directly (the same function foreachBatch
  * calls). Results recorded in PERF.md (round 4).
  *
  * Usage: runMain graft.streaming.IncrementalDedupBench [sfDir] [nBatches]
  */
object IncrementalDedupBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_incdedup_bench").toFile.getAbsolutePath
    val state = IncrementalDedup.StatePaths(
      s"$base/banded", s"$base/hashed", s"$base/pairs")
    val docs = graft.Tables.documents(spark, dir).cache()
    val total = docs.count()
    var cumPairs = 0L
    for (i <- 0 until nBatches) {
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
      val t0 = System.nanoTime()
      val emitted = IncrementalDedup.processBatch(spark, batch, state).count()
      val secs = (System.nanoTime() - t0) / 1e9
      cumPairs += emitted
      println(f"INCDEDUP batch=$i docs=${batch.count()} emitted=$emitted cum_pairs=$cumPairs t=$secs%.1f s")
    }
    println(f"INCDEDUP total docs=$total batches=$nBatches cum_pairs=$cumPairs")
    spark.stop()
  }
}
