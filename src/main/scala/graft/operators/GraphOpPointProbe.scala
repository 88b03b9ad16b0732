package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (builder tooling): measure the LSH-graph
  * OPERATING-POINT tradeoff instead of asserting it — for each
  * (tables × bits) config: candidate-join volume, edge recall of the
  * resulting top-3 kNN graph vs the exact within-label graph, and build
  * wall time. The shipped config (16×6, radius 1) was chosen by the
  * round-5 sweep; this probe re-prices the neighbors so round-10 can
  * move the default on evidence if the corpus changes.
  * Usage: runMain graft.operators.GraphOpPointProbe <sfDir>
  */
object GraphOpPointProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding").cache()
    e.count()
    // exact within-label top-3 edge set (the target)
    val exact = GraphQueries.undirected(
        graft.operators.GraphQueries.exactKnnEdges(e))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((t, b) <- Seq((8, 6), (8, 7), (16, 6), (16, 7), (24, 5), (24, 6))) {
      val t0 = System.nanoTime()
      val cands = VectorQueries.lshGraphCandidates(e, t, b, 1)
      val nCand = cands.count()
      val edges = VectorQueries.knnGraphFromCandidates(e, cands, 3)
        .select(col("vec_id").as("src"), col("n_vec_id").as("dst"))
      val und = GraphQueries.undirected(edges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = und.intersect(exact).size.toDouble / exact.size
      println(f"GRAPHPOINT $dir ${t}x$b: cand=$nCand edges=${und.size} " +
        f"exact=${exact.size} edgeRecall=$recall%.3f build=$secs%.2fs")
    }
    spark.stop()
  }
}
