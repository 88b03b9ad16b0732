package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

// Throwaway diagnostic: print the FINAL adaptive plan of a query after
// execution (AQE stage reuse only shows post-run).
object DebugMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val name = if (args.length > 1) args(1) else "q_text_langid"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val s = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    println("FINAL PLAN:\n" + s)
    println("HAS_REUSE=" + (s.contains("ReusedExchange") || s.contains("reused") || s.contains("TableCacheQueryStage") || s.contains("ShuffleQueryStage")))
    spark.stop()
  }
}
