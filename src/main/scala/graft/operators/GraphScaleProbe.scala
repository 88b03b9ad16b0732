package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway diagnostic (r8 verdict item 6): price the graph family on the
// LSH edge graph across one fixture decade (sf0.01 → sf0.1). For each
// scale dir: |V|, |E| (directed top-3 edges), Σdeg² over the undirected
// graph (the two-hop join's enumeration bound for triangles/linkpred),
// and wall time of the downstream census / LPA / linkpred / outliers
// consuming the persisted graph. The claim under test: downstream growth
// ~linear in |E| (Σdeg² stays ~k·|E| on a k-NN graph), so the family's
// cost scales with the corpus, not its square.
// Usage: runMain graft.operators.GraphScaleProbe [dir1 dir2 ...]
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- dirs) {
      val (_, tBuild) = timed(VectorQueries.lshKnnEdgesPersisted(spark, dir).count())
      val edges = VectorQueries.lshKnnEdgesPersisted(spark, dir)
        .select(col("vec_id").as("src"), col("n_vec_id").as("dst"))
      val nV = graft.Tables.embeddings(spark, dir).count()
      val nE = edges.count()
      val und = GraphQueries.undirected(edges)
      val sumDeg2 = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .agg(sum(col("d") * col("d"))).collect()(0).getLong(0)
      val (_, tTri) = timed(GraphQueries.graphTrianglesLsh.query(spark, dir).collect())
      val (_, tLpa) = timed(GraphQueries.graphLabelpropLsh.query(spark, dir).collect())
      val (_, tLp) = timed(GraphQueries.graphLinkpredLsh.query(spark, dir).collect())
      val (_, tOut) = timed(GraphQueries.graphOutliersLsh.query(spark, dir).collect())
      println(f"GRAPHSCALE dir=$dir nV=$nV nE=$nE sumDeg2=$sumDeg2 " +
        f"deg2_per_edge=${sumDeg2.toDouble / (2 * und.count())}%.2f " +
        f"t_build_or_read=$tBuild%.2f t_triangles=$tTri%.2f t_labelprop=$tLpa%.2f " +
        f"t_linkpred=$tLp%.2f t_outliers=$tOut%.2f")
    }
    spark.stop()
  }
}
