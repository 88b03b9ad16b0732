package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

// Throwaway diagnostic: decade growth of the round-10 cores. Claims
// under test (the operators' scaladoc):
//   - seqmineOn: support cost is bounded by the (session, symbol) grain
//     — 10x MORE EVENTS in the same sessions must be ~flat after the
//     first aggregate (grain unchanged); 10x more SESSIONS grows ~linearly.
//   - madOn: bounded by value cardinality, not rows — 10x replicated
//     rows at flat cardinality must be ~flat post-aggregate; 10x with
//     per-replica value offsets (all-unique) bounds the worst case.
// Usage: runMain graft.operators.R10ScaleProbe [sfDir] [k]
object R10ScaleProbe {
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

    // ---- seqmine -------------------------------------------------------
    val v = col("event_id") % 64
    val sym = when(v >= 33, "e5").when(v >= 17, "e4").when(v >= 9, "e3")
      .when(v >= 5, "e2").when(v >= 3, "e1").otherwise("e0")
    val occ = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      .select(col("user_id"), expr("ts_us div 604800000000").as("day"), sym.as("sym"),
        col("ts_us"))
      .localCheckpoint()
    val reps = spark.range(k).select(col("id"))
    // same sessions, k x events (ts jittered inside the week, symbols cycle)
    val denser = occ.crossJoin(reps)
      .select(col("user_id"), col("day"),
        concat(lit("e"), (abs(hash(col("ts_us"), col("id"))) % 6)).as("sym"),
        (col("ts_us") + col("id")).as("ts_us"))
      .localCheckpoint()
    // k x sessions (users shifted per replica)
    val wider = occ.crossJoin(reps)
      .select((col("user_id") + col("id") * 1000000L).as("user_id"), col("day"),
        col("sym"), col("ts_us"))
      .localCheckpoint()
    def runSeq(b: DataFrame): Long = EventQueries.seqmineOn(b).collect().length.toLong
    runSeq(occ) // warm
    val (_, t1) = timed(runSeq(occ))
    val (_, tD) = timed(runSeq(denser))
    val (_, tW) = timed(runSeq(wider))
    println(f"R10PROBE seqmine base rows=${occ.count()} t=$t1%.2f s")
    println(f"R10PROBE seqmine x$k%d SAME-SESSIONS rows=${denser.count()} t=$tD%.2f s growth=${tD / t1}%.2f x (grain flat)")
    println(f"R10PROBE seqmine x$k%d MORE-SESSIONS rows=${wider.count()} t=$tW%.2f s growth=${tW / t1}%.2f x (grain linear)")

    // ---- mad -----------------------------------------------------------
    val base = graft.Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
      .localCheckpoint()
    val flat = base.crossJoin(reps).select("grp", "v").localCheckpoint()
    val uniq = base.crossJoin(reps)
      .select(col("grp"), (col("v") * k + col("id")).as("v")).localCheckpoint()
    def runMad(b: DataFrame): Long = StatQueries.madOn(b).collect().length.toLong
    runMad(base) // warm
    val (_, m1) = timed(runMad(base))
    val (_, mF) = timed(runMad(flat))
    val (_, mU) = timed(runMad(uniq))
    println(f"R10PROBE mad base rows=${base.count()} t=$m1%.2f s")
    println(f"R10PROBE mad x$k%d SAME-VALUES rows=${flat.count()} t=$mF%.2f s growth=${mF / m1}%.2f x (cardinality flat)")
    println(f"R10PROBE mad x$k%d ALL-UNIQUE  rows=${uniq.count()} t=$mU%.2f s growth=${mU / m1}%.2f x (worst case)")
    spark.stop()
  }
}
