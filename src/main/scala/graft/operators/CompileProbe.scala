package graft.operators

import graft.SparkEntry
import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Plan-compile latency probe (SURVEY §7.6 item 3): how much of a
  * query's wall time is spent turning the DataFrame into runnable code
  * rather than running it. At 100 TB compile cost amortizes to nothing;
  * interactively (a user iterating on a fixture slice) it is the floor
  * under every keystroke, so it is measured per phase, not guessed:
  *
  *   - build      — the query function itself (DataFrame construction;
  *                  for index-backed operators this includes ensuring
  *                  persisted artifacts, which is why it is timed);
  *   - analysis / optimization / planning — straight from Spark's own
  *     QueryPlanningTracker phase summaries on the executed plan;
  *   - exec1 / exec2 — first and second full executions; the delta is
  *     codegen + Janino + JIT warmup (run 2 hits the generated-code
  *     cache), reported with the JVM-wide codegen compilation-event
  *     count delta (CodegenMetrics) attributed to run 1 by serializing
  *     the runs.
  *
  * Under AQE the "planning" phase is only the initial plan; runtime
  * re-optimization lands inside exec. Output: one COMPILE line per
  * query (ms for compile phases, seconds for exec).
  *
  * Usage: `runMain graft.operators.CompileProbe [query ...]` (default:
  * the 10 most complex plans by round-5 reading).
  */
object CompileProbe {

  /** The heavyweight-plan set: incremental/pipeline/index operators plus
    * the deepest pure-SQL shapes.
    */
  val DefaultTargets: Seq[String] = Seq(
    "q_vec_knn_graph_incr_lsh", "q_pipeline_e2e", "q_dedup_cluster",
    "q_ann_ivfpq_incr", "q_ann_ivfpq", "q_dedup_near_bucketed",
    "q_pipeline_audit", "q_text_boilerplate", "q_vec_cluster", "q_sql_q21")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val names = if (args.nonEmpty) args.toSeq else DefaultTargets
    println("COMPILE query build_ms analysis_ms optimize_ms plan_ms codegen_n exec1_s exec2_s warmup_s")
    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val buildMs = (System.nanoTime() - t0) / 1e6

      // materialize THIS QueryExecution's optimizedPlan/executedPlan so its
      // tracker records the optimization+planning phases (count() would
      // compile a separate wrapped plan and leave these blank)
      df.queryExecution.executedPlan
      val phases = df.queryExecution.tracker.phases

      val cgBefore = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val t1 = System.nanoTime()
      df.count()
      val exec1 = (System.nanoTime() - t1) / 1e9
      val cgN = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - cgBefore
      def ms(p: String): Long = phases.get(p).map(_.durationMs).getOrElse(-1L)

      // fresh DataFrame, same query: generated-code cache is warm, so
      // exec1 - exec2 bounds the codegen+JIT share of first-run latency
      val df2 = fn(spark, sfDir)
      val t2 = System.nanoTime()
      df2.count()
      val exec2 = (System.nanoTime() - t2) / 1e9

      println(f"COMPILE $name $buildMs%.0f ${ms("analysis")} ${ms("optimization")} " +
        f"${ms("planning")} $cgN $exec1%.2f $exec2%.2f ${exec1 - exec2}%.2f")
    }
    spark.stop()
  }
}
