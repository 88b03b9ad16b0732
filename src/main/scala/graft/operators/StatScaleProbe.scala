package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

// Throwaway diagnostic: decade growth of the rank-based statistical
// tests. The claim under test (StatQueries header): ranking cost is
// bounded by DISTINCT-VALUE cardinality, not row count — the
// value-distinct aggregate compresses the fact before any window
// machinery runs. Two axes, same 10× row growth:
//   (a) replicate rows VERBATIM k× → distinct values FLAT → the
//       post-aggregate pipeline (cumulative, windows, final agg) should
//       cost the same; only the first-shuffle map side grows.
//   (b) replicate with a per-replica value OFFSET (bijective — replicas
//       share no values) → distinct values grow k× → the full pipeline
//       grows, bounding the worst case (every value unique).
// A gap between (a) and (b) growth IS the designed compression win.
// Usage: runMain graft.operators.StatScaleProbe [sfDir] [k]
object StatScaleProbe {
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
    val base = graft.Tables.orders(spark, dir)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderstatus").as("grp"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
      .localCheckpoint()
    val reps = spark.range(k).select(col("id"))
    def replicate(offset: Boolean): DataFrame = {
      val r = base.crossJoin(reps)
      (if (offset) r.select(col("grp"), (col("v") * k + col("id")).as("v"))
       else r.select("grp", "v")).localCheckpoint()
    }
    def run(b: DataFrame): Long =
      StatQueries.mannWhitneyOn(b, "O").collect().length.toLong

    // warm codegen
    run(base)
    val (_, t1) = timed(run(base))
    val flat = replicate(offset = false)
    val (_, tFlat) = timed(run(flat))
    val uniq = replicate(offset = true)
    val (_, tUniq) = timed(run(uniq))
    val nd1 = base.select("v").distinct().count()
    val ndU = uniq.select("v").distinct().count()
    println(f"STATPROBE base rows=${base.count()} distinct=$nd1 t=$t1%.2f s")
    println(f"STATPROBE x$k%d SAME-VALUES rows=${flat.count()} distinct=$nd1 t=$tFlat%.2f s growth=${tFlat / t1}%.2f x")
    println(f"STATPROBE x$k%d ALL-UNIQUE  rows=${uniq.count()} distinct=$ndU t=$tUniq%.2f s growth=${tUniq / t1}%.2f x")
    spark.stop()
  }
}
