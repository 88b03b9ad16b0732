package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Throwaway diagnostic: recall DRIFT of the frozen-codebook IVF-PQ index
// under a distribution-shifted ingest slice. The standing corpus is the
// fixture's vec_id % 5 != 0 slice; the "ingest" is the % 5 == 0 slice
// with every embedding scaled ×1.5 and offset +0.3 (a deliberate shift —
// new vectors live off the training manifold). Compares frozen-artifact
// recall vs retrain-on-everything recall, both against exact L2 over the
// shifted corpus. This is the rebuild-trigger measurement
// q_ann_ivfpq_incr's scaladoc promises.
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e0 = graft.Tables.embeddings(spark, dir).select("label", "vec_id", "embedding")
    val old = e0.filter(col("vec_id") % 5 =!= 0)
    val freshShifted = e0.filter(col("vec_id") % 5 === 0)
      .withColumn("embedding",
        expr("transform(embedding, x -> CAST(x * 1.5 + 0.3 AS FLOAT))"))
    val corpus = old.union(freshShifted)
    val q = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_emb"))

    def recallWith(tagName: String, trainSet: DataFrame, nprobe: Int = 4): Double = {
      val centroids = VectorQueries.coarseCentroidsOf(trainSet, iters = 2)
      val codebook = VectorQueries.pqCodebookFromSubs(
        VectorQueries.pqSubvectors(trainSet.select("vec_id", "embedding")), VectorQueries.PqPlaneFamily)
      val centroidArr = centroids.agg(collect_list(struct(col("c_id"), col("c_emb"))).as("cents"))
      val assigned = VectorQueries.nearestCells(corpus, "embedding", "vec_id", centroidArr, 2)
      val codes = VectorQueries.pqCodes(corpus.select("vec_id", "embedding"), codebook)
      val probes = VectorQueries.nearestCells(q, "q_emb", "q_vec_id", centroidArr, nprobe)
      val cands = assigned.join(broadcast(probes), Seq("c_id"))
        .filter(col("vec_id") =!= col("q_vec_id"))
        .select("q_vec_id", "vec_id").distinct()
      val lut = VectorQueries.subSlices(q.select(col("q_vec_id"), col("q_emb")), "q_emb")
        .join(broadcast(codebook), Seq("m"))
        .select(col("q_vec_id"), col("m"), col("code"),
          VectorQueries.l2sq(col("sub"), col("c_sub")).as("d"))
      val adc = cands.join(codes, Seq("vec_id"))
        .join(broadcast(lut), Seq("q_vec_id", "m", "code"))
        .groupBy("q_vec_id", "vec_id").agg(sum("d").as("adist"))
      val short = adc.withColumn("srn", row_number().over(
          Window.partitionBy("q_vec_id").orderBy(asc("adist"), asc("vec_id"))))
        .filter(col("srn") <= 400)
      val got = short
        .join(corpus.select(col("vec_id"), col("embedding").as("n_emb")), Seq("vec_id"))
        .join(broadcast(q), Seq("q_vec_id"))
        .withColumn("dist", VectorQueries.l2sq(col("q_emb"), col("n_emb")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_vec_id").orderBy(asc("dist"), asc("vec_id"))))
        .filter(col("rn") <= 5).select("q_vec_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
      val exact = corpus.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_vec_id"))
        .withColumn("d", VectorQueries.l2sq(col("embedding"), col("q_emb")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("q_vec_id").orderBy(asc("d"), asc("vec_id"))))
        .filter(col("rn") <= 5).select("q_vec_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
      val rs = exact.keys.toSeq.sorted
        .map(k => got.getOrElse(k, Set.empty[Long]).intersect(exact(k)).size / 5.0)
      val r = rs.sum / rs.size
      println(f"DRIFTPROBE train=$tagName recall=$r%.3f per=${rs.map(x => f"$x%.1f").mkString(",")}")
      r
    }
    val frozen = recallWith("standing_only(frozen)", old)
    val full = recallWith("everything(retrained)", corpus)
    println(f"DRIFTPROBE drift=${full - frozen}%.3f (retrained - frozen) under x1.5+0.3 shifted ingest")
    // can wider probing on the FROZEN index buy the recall back without
    // a rebuild? (probing is a query-time knob — no index work at all)
    for (np <- Seq(6, 8, 10))
      recallWith(s"frozen_nprobe$np", old, nprobe = np)
    spark.stop()
  }
}
