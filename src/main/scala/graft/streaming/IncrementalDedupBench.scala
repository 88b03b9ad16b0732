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
    val docs = graft.Tables.documents(spark, dir).cache()
    val total = docs.count()
    def stateBytes: Long = Seq(s"$base/banded", s"$base/hashed", s"$base/pairs")
      .flatMap(p => graft.sources.GraftFs.listFiles(spark, p)).map(_.getLen).sum
    var cumPairs = 0L
    for (i <- 0 until nBatches) {
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches)) === i)
      val t0 = System.nanoTime()
      val emitted = IncrementalDedup.processBatch(spark, batch, base, Some(i.toLong)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      cumPairs += emitted
      println(f"INCDEDUP batch=$i docs=${batch.count()} emitted=$emitted " +
        f"cum_pairs=$cumPairs state_mb=${stateBytes / 1e6}%.1f t=$secs%.1f s")
    }
    // Final-state equivalence: the union of per-batch emissions must be
    // EXACTLY the one-shot q_dedup_near pair set (same pairs, same
    // jaccard) — the correctness contract that makes incremental
    // maintenance a drop-in for the batch operator.
    val incremental = IncrementalDedup.readPairs(spark, base)
      .select("doc_id1", "doc_id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oneShot = graft.operators.DedupQueries.dedupNear.query(spark, dir)
      .select("doc_id1", "doc_id2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val matches = incremental == oneShot
    println(f"INCDEDUP total docs=$total batches=$nBatches cum_pairs=$cumPairs " +
      f"one_shot=${oneShot.size} state_equiv=$matches")
    require(matches, "incremental pair state diverged from one-shot dedup")
    spark.stop()
  }
}
