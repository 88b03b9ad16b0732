package graft
import org.apache.spark.sql.SparkSession

/** Bench-faithful per-query A/B probe (r16/r17 optimization rounds): times the
  * named queries with EXACTLY Bench.measure's discipline — `reps` count()
  * reps, median, BenchUtil.releasePinned after each query — and repeats
  * the whole block `rounds` times so a reading is a band, not a point.
  * QBench (back-to-back reps, no release) overstates checkpoint-heavy
  * queries: pinned blocks accumulate across reps and GC pressure grows
  * superlinearly (near_salted read 59 s on rep 4 there vs ~4.5 s under
  * the release discipline).
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def measure(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      var failed = false
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => failed = true }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median =
        if (failed) -1.0
        else if (times.length % 2 == 1) times(times.length / 2)
        else (times(times.length / 2 - 1) + times(times.length / 2)) / 2.0
      BenchUtil.releasePinned(spark)
      median
    }
    val names = args.toSeq
    for (r <- 1 to rounds; name <- names; fn <- SparkEntry.queries.get(name)) {
      val m = measure(fn)
      println(f"R17PROBE round=$r $name median=$m%.2f")
    }
    spark.stop()
  }
}
