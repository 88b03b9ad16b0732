package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Throwaway diagnostic: candidate recall of the IVF-PQ probed cells —
// what fraction of the exact L2 top-5 is even REACHABLE through the
// (2-way assign × nprobe) cell machinery, before ADC/shortlist loss.
// Sweeps nprobe 2..6 to separate probe coverage from shortlist depth.
object CandProbe {
  private def l2s(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b,
       |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
       |  0D, (acc, v) -> acc + v)""".stripMargin

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val centroidArr = VectorQueries.ivfCodebook(spark, dir)
      .agg(collect_list(struct(col("c_id"), col("c_emb"))).as("cents"))
    val assigned = e.crossJoin(broadcast(centroidArr))
      .select(col("vec_id"), explode(expr(
        s"""slice(array_sort(transform(cents,
           |  c -> struct(${l2s("embedding", "c.c_emb")} AS d, c.c_id AS c_id))), 1, 2)""".stripMargin)).as("a"))
      .select(col("vec_id"), col("a.c_id").as("c_id"))
    val exact = e.crossJoin(broadcast(e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q"), col("embedding").as("qe"))))
      .filter(col("vec_id") =!= col("q"))
      .withColumn("d", expr(l2s("embedding", "qe")))
      .withColumn("rn", row_number().over(Window.partitionBy("q").orderBy(asc("d"), asc("vec_id"))))
      .filter(col("rn") <= 5).select("q", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    for (nprobe <- Seq(2, 3, 4, 6)) {
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
        .crossJoin(broadcast(centroidArr))
        .select(col("q_vec_id"), explode(expr(
          s"""slice(array_sort(transform(cents,
             |  c -> struct(${l2s("q_emb", "c.c_emb")} AS d, c.c_id AS c_id))), 1, $nprobe)""".stripMargin)).as("p"))
        .select(col("q_vec_id"), col("p.c_id").as("c_id"))
      val cands = assigned.join(probes, Seq("c_id"))
        .filter(col("vec_id") =!= col("q_vec_id"))
        .select("q_vec_id", "vec_id").distinct()
      val nCands = cands.groupBy("q_vec_id").count().agg(avg("count")).collect()(0).getDouble(0)
      val candSets = cands.collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
      val recalls = exact.keys.toSeq.sorted
        .map(k => candSets.getOrElse(k, Set.empty[Long]).intersect(exact(k)).size / 5.0)
      println(f"CANDPROBE nprobe=$nprobe meanCands=$nCands%.0f candRecall=${recalls.sum / recalls.size}%.3f min=${recalls.min}%.3f")
    }
    spark.stop()
  }
}
