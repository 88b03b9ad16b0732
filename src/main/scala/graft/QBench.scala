package graft
import org.apache.spark.sql.SparkSession

/** Isolated per-query benchmark: `runMain graft.QBench q_a q_b ...` times
  * only the named queries (same session config as Bench) so a single
  * query's cost can be measured without suite-level GC/contention noise.
  * Repeats each query `SPARK_GRAFT_REPS` times (default 2) and reports
  * every rep — rep1 includes plan/codegen warmup, later reps are steady
  * state.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions default to the core count but can be overridden
    // independently (SPARK_GRAFT_SHUFFLE) to measure partition-sizing
    // effects at fixed parallelism — the knob a deployment scales ∝ input.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq else Seq.empty
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val reported = times.map { case (t, _) => f"$t%.2f" }.mkString(",")
      println(f"QBENCH $name rows=${times.last._2} secs=[$reported]")
    }
    spark.stop()
  }
}
