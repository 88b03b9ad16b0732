package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Throwaway diagnostic: for each exact L2 top-5 neighbor of the query
// slice, report which IVF-PQ stage loses it — not-in-candidates vs
// not-in-ADC-shortlist — to attribute recall loss to probing vs ADC.
object StageProbe {
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
    val codebook = VectorQueries.pqCodebook(spark, dir)
    val codes = VectorQueries.pqCodes(e, codebook)
    val assigned = e.crossJoin(broadcast(centroidArr))
      .select(col("vec_id"), explode(expr(
        s"""slice(array_sort(transform(cents,
           |  c -> struct(${l2s("embedding", "c.c_emb")} AS d, c.c_id AS c_id))), 1, 2)""".stripMargin)).as("a"))
      .select(col("vec_id"), col("a.c_id").as("c_id"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))
    val probes = q.crossJoin(broadcast(centroidArr))
      .select(col("q_vec_id"), explode(expr(
        s"""slice(array_sort(transform(cents,
           |  c -> struct(${l2s("q_emb", "c.c_emb")} AS d, c.c_id AS c_id))), 1, 4)""".stripMargin)).as("p"))
      .select(col("q_vec_id"), col("p.c_id").as("c_id"))
    val cands = assigned.join(broadcast(probes), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_vec_id"))
      .select("q_vec_id", "vec_id").distinct()
    val lutDf = e.filter(col("vec_id") < 10)
    val lut = {
      val subs = (0 until 8).map(m => struct(lit(m).as("m"), slice(col("q_emb"), m * 8 + 1, 8).as("sub")))
      q.select(col("q_vec_id"), explode(array(subs: _*)).as("ms"))
        .select(col("q_vec_id"), col("ms.m").as("m"), col("ms.sub").as("sub"))
        .join(broadcast(codebook), Seq("m"))
        .select(col("q_vec_id"), col("m"), col("code"),
          expr(l2s("sub", "c_sub")).as("d"))
    }
    val adc = cands.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("q_vec_id", "m", "code"))
      .groupBy("q_vec_id", "vec_id").agg(round(sum("d"), 6).as("adist"))
    val wShort = Window.partitionBy("q_vec_id").orderBy(asc("adist"), asc("vec_id"))
    val short = adc.withColumn("srn", row_number().over(wShort)).filter(col("srn") <= 200)
      .select("q_vec_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val candSets = cands.collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_vec_id"))
      .withColumn("d", expr(l2s("embedding", "q_emb")))
      .withColumn("rn", row_number().over(Window.partitionBy("q_vec_id").orderBy(asc("d"), asc("vec_id"))))
      .filter(col("rn") <= 5).select("q_vec_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    var inCand = 0; var inShort = 0; var total = 0
    exact.foreach { case (k, s) =>
      total += s.size
      inCand += s.intersect(candSets.getOrElse(k, Set.empty)).size
      inShort += s.intersect(short.getOrElse(k, Set.empty)).size
    }
    println(f"STAGEPROBE total=$total inCandidates=$inCand inShortlist=$inShort candRecall=${inCand.toDouble / total}%.3f shortRecall=${inShort.toDouble / total}%.3f")
    spark.stop()
  }
}
