package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Throwaway diagnostic: recall@5 of an ANN query (q_ann_*) against
// brute-force exact L2 top-5, per scale dir. Usage:
//   runMain graft.operators.RecallProbe <sfDir> <queryName>
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val name = if (args.length > 1) args(1) else "q_ann_ivfpq"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val got = graft.SparkEntry.queries(name)(spark, dir)
      .select("q_vec_id", "n_vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val e = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q"), col("embedding").as("qe"))
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q"))
      .withColumn("d", expr(
        "aggregate(zip_with(embedding, qe, (x,y) -> (CAST(x AS DOUBLE)-CAST(y AS DOUBLE))*(CAST(x AS DOUBLE)-CAST(y AS DOUBLE))), 0D, (a,v) -> a+v)"))
      .withColumn("rn", row_number().over(Window.partitionBy("q").orderBy(asc("d"), asc("vec_id"))))
      .filter(col("rn") <= 5).select("q", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val recalls = exact.keys.toSeq.sorted
      .map(k => got.getOrElse(k, Set.empty[Long]).intersect(exact(k)).size / 5.0)
    println(f"RECALL name=$name dir=$dir mean=${recalls.sum / recalls.size}%.3f min=${recalls.min}%.3f per=${recalls.map(r => f"$r%.1f").mkString(",")}")
    spark.stop()
  }
}
