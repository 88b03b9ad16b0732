package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Temporary diagnostic main — not part of the library surface.
// Sweeps candidate-generation configs for the full within-label kNN graph:
// hyperplane LSH (tables × bits × probe radius) vs per-label IVF sub-cells
// (k2 × multi-assign). Reports mean top-3 recall vs the exact within-label
// graph and candidate-pair volume vs the exact block pair count.
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding").cache()
    val n = e.count()
    val blockPairs = e.groupBy("label").count()
      .agg(sum(col("count") * (col("count") - 1))).collect().head.getLong(0)
    val exact = VectorQueries.vecKnnGraph.query(spark, dir)
      .select("vec_id", "n_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE n=$n blockOrderedPairs=$blockPairs exactEdges=${exact.size}")

    def eval(tag: String, cands: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val nc = cands.count()
      val got = VectorQueries.knnGraphFromCandidates(e, cands, 3)
        .select("vec_id", "n_vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"SWEEP $tag cand=$nc%d (${nc * 100.0 / blockPairs}%.1f%% of block) " +
        f"recall=$recall%.4f time=$secs%.1fs")
    }

    for ((t, b, r) <- Seq((8, 7, 1), (8, 6, 1), (16, 8, 1), (16, 6, 1), (12, 8, 2)))
      eval(s"lsh t=$t b=$b r=$r", VectorQueries.lshGraphCandidates(e, t, b, r))
    for ((k2, assign) <- Seq((4, 2), (8, 2), (8, 3), (16, 2), (16, 3), (16, 4), (32, 3))) {
      val cb = VectorQueries.subCodebook(e, k2, iters = 2).cache()
      cb.count()
      eval(s"ivf k2=$k2 assign=$assign", VectorQueries.ivfGraphCandidates(e, cb, assign))
      cb.unpersist()
    }
    spark.stop()
  }
}
