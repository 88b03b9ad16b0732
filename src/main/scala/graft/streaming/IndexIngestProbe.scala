package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway diagnostic: per-batch cost flatness of the incremental
// inverted index, and the listing/read tax segment compaction removes.
// Feeds `n` disjoint micro-batches (sf0.1 corpus replicated with
// suffixed tokens so the stats table GROWS — the worst case for the
// merge, whose cost should track vocabulary size, not history), then
// times searchHeads against fragmented vs compacted segments.
// Usage: runMain graft.streaming.IndexIngestProbe [sfDir] [nBatches]
object IndexIngestProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft_idxprobe")
      .toFile.getAbsolutePath + "/idx"

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val docs = graft.Tables.documents(spark, dir).localCheckpoint()
    val times = (0 until n).map { r =>
      val batch = docs
        .select((col("doc_id") + r * 100000000L).as("doc_id"),
          expr(s"concat_ws(' ', transform(split(text, ' '), t -> concat(t, '_$r')))")
            .as("text"))
      timed(IncrementalIndex.processBatch(spark, batch, base, Some(r.toLong)))._2
    }
    println(f"IDXPROBE batches=$n first5=${times.take(5).map(t => f"$t%.2f").mkString(",")} " +
      f"last5=${times.takeRight(5).map(t => f"$t%.2f").mkString(",")}")
    val (h1, tFrag) = timed(IncrementalIndex.searchHeads(spark, base).count())
    val (_, tCompact) = timed(IncrementalIndex.compactSegments(spark, base))
    val (h2, tFold) = timed(IncrementalIndex.searchHeads(spark, base).count())
    require(h1 == h2, s"compaction changed results: $h1 vs $h2")
    println(f"IDXPROBE searchHeads fragmented($n segs)=$tFrag%.2f s, " +
      f"compact=$tCompact%.2f s, folded(1 seg)=$tFold%.2f s, rows=$h1")
    spark.stop()
  }
}
