package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Throwaway diagnostic: decade growth of the round-11 cores. Claims
// under test (the operators' scaladoc):
//   - spanSourceOn: one linear window explode + window-hash-grain
//     aggregates — 10x docs must grow ~linearly (never pairwise in the
//     duplicated mass); replicated docs multiply duplicate windows
//     WITHOUT quadratic attribution cost because dup rows fan out per
//     HOLDER, not per holder pair.
//   - nextstepOn: supports on the (session, symbol) first/last grain —
//     10x sessions grows ~linearly (same alphabet, grain linear).
//   - IncrementalSpan batch: O(batch) + window-grain merge — a 1/10th
//     slice batch against standing state must cost well under the
//     one-shot rebuild.
// Usage: runMain graft.operators.R11ScaleProbe [sfDir] [k]
object R11ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- span provenance ------------------------------------------------
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").localCheckpoint()
    val reps = spark.range(k).select(col("id"))
    // k x docs, all replicas of the same text: every window becomes a
    // k-way duplicate — the densest attribution regime (every doc has
    // copied mass, every window a canonical holder)
    val xdup = docs.crossJoin(reps)
      .select((col("doc_id") * k + col("id")).as("doc_id"), col("text"))
      .localCheckpoint()
    // k x docs with per-replica token salt: window vocabulary grows k x,
    // duplicate mass stays the base corpus's — the wide regime
    val xwide = docs.crossJoin(reps)
      .select((col("doc_id") * k + col("id")).as("doc_id"),
        concat(col("text"), lit(" s"), col("id")).as("text"))
      .localCheckpoint()
    def runSpan(b: DataFrame): Long = TextQueries.spanSourceOn(b).collect().length.toLong
    runSpan(docs) // warm
    val (_, s1) = timed(runSpan(docs))
    val (_, sD) = timed(runSpan(xdup))
    val (_, sW) = timed(runSpan(xwide))
    println(f"R11PROBE span base docs=${docs.count()} t=$s1%.2f s")
    println(f"R11PROBE span x$k%d ALL-DUP docs=${xdup.count()} t=$sD%.2f s growth=${sD / s1}%.2f x (holder-linear)")
    println(f"R11PROBE span x$k%d SALTED docs=${xwide.count()} t=$sW%.2f s growth=${sW / s1}%.2f x (vocab-linear)")

    // ---- nextstep ---------------------------------------------------------
    val v = col("event_id") % 64
    val sym = when(v >= 33, "e5").when(v >= 17, "e4").when(v >= 9, "e3")
      .when(v >= 5, "e2").when(v >= 3, "e1").otherwise("e0")
    val occ = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      .select(col("user_id"), expr("ts_us div 604800000000").as("day"), sym.as("sym"),
        col("ts_us"))
      .localCheckpoint()
    val wider = occ.crossJoin(reps)
      .select((col("user_id") + col("id") * 1000000L).as("user_id"), col("day"),
        col("sym"), col("ts_us"))
      .localCheckpoint()
    def runNext(b: DataFrame): Long = EventQueries.nextstepOn(b).collect().length.toLong
    runNext(occ) // warm
    val (_, n1) = timed(runNext(occ))
    val (_, nW) = timed(runNext(wider))
    println(f"R11PROBE nextstep base rows=${occ.count()} t=$n1%.2f s")
    println(f"R11PROBE nextstep x$k%d MORE-SESSIONS rows=${wider.count()} t=$nW%.2f s growth=${nW / n1}%.2f x (grain linear)")

    // ---- incremental span batch vs rebuild -------------------------------
    val base = java.nio.file.Files.createTempDirectory("graft_r11probe_span")
      .toFile.getAbsolutePath
    graft.streaming.IncrementalSpan.processBatch(spark,
      docs.filter(col("doc_id") % 10 =!= 0), base, Some(0L))
    val slice = docs.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val (_, tb) = timed {
      graft.streaming.IncrementalSpan.processBatch(spark, slice, base, Some(1L)); 1L
    }
    val (_, tr) = timed(runSpan(docs))
    println(f"R11PROBE incr-span 1/10-slice batch t=$tb%.2f s vs one-shot rebuild t=$tr%.2f s ratio=${tb / tr}%.2f")
    spark.stop()
  }
}
