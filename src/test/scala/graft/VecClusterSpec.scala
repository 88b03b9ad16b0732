package graft

import graft.functions.VectorOps
import graft.operators.{DedupQueries, VectorQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.matchers.should.Matchers

/** q_vec_cluster's LSH star/sweep edge generator: label equivalence against
  * the exhaustive all-pairs edge join on fixtures with IMPLANTED duplicate
  * clusters and transitive chains (the driver fixture has zero ≥0.95-cos
  * edges, so the registered oracle alone cannot exercise the merge logic),
  * plus the no-cartesian structural assert.
  */
class VecClusterSpec extends SparkTestBase with Matchers {

  /** 120 random unit-ish gaussians (pairwise cos ~ N(0, 1/64) — never near
    * 0.95) + 10 implanted duplicate clusters of size 2–5 (eps 0.08: cos
    * ≈ 0.995) + 3 drift chains of length 4 (step eps 0.25: adjacent cos
    * ≈ 0.97, two-step ≈ 0.94 < threshold — clusters only form through CC
    * transitivity). Deterministic seed.
    */
  private lazy val implanted: DataFrame = {
    val rnd = new scala.util.Random(7)
    def randVec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float], eps: Double): Array[Float] =
      v.map(x => (x + eps * rnd.nextGaussian()).toFloat)
    val rows = collection.mutable.ArrayBuffer.empty[Array[Float]]
    (1 to 120).foreach(_ => rows += randVec())
    (1 to 10).foreach { _ =>
      val c = randVec()
      (0 until 2 + rnd.nextInt(4)).foreach(_ => rows += perturb(c, 0.08))
    }
    (1 to 3).foreach { _ =>
      var c = randVec()
      rows += c
      (1 to 3).foreach { _ => c = perturb(c, 0.25); rows += c }
    }
    import spark.implicits._
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "embedding")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("LSH star/sweep labels ≡ exhaustive-edge CC labels on implanted duplicates") {
    val e = implanted.cache()
    val a = e.select(col("vec_id").as("doc_id1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("doc_id2"), col("embedding").as("e2"))
    val exactEdges = a.join(b, col("doc_id1") < col("doc_id2"))
      .filter(round(VectorOps.cosine(col("e1"), col("e2")), 6) >= 0.95)
      .select("doc_id1", "doc_id2")
    val exhaustive = labelsOf(
      DedupQueries.connectedComponents(e.select(col("vec_id").as("doc_id")), exactEdges)
        .select(col("doc_id").as("vec_id"), col("cluster_id")))
    val lsh = labelsOf(VectorQueries.vecClusterFromEmbeddings(e))
    // sanity: the fixture actually formed non-trivial clusters and chains
    exhaustive.values.toSet.size should be < exhaustive.size
    exactEdges.count() should be >= 20L
    lsh shouldBe exhaustive
    e.unpersist()
  }

  test("chains cluster transitively (adjacent-only edges still merge)") {
    val e = implanted
    val lsh = labelsOf(VectorQueries.vecClusterFromEmbeddings(e))
    // the three drift chains are the last 12 vec_ids: each run of 4 shares
    // one cluster label even though only adjacent pairs clear 0.95
    val n = e.count()
    val chains = (n - 12 until n).grouped(4).toSeq
    chains.foreach { chain =>
      chain.map(lsh(_)).toSet should have size 1
    }
  }

  test("registered row: persisted labels ≡ fresh LSH star/sweep derivation") {
    val fresh = labelsOf(VectorQueries.vecClusterFromEmbeddings(
      Tables.embeddings(spark, sfTiny).select(col("vec_id"), col("embedding"))))
    val persisted = labelsOf(VectorQueries.vecCluster.query(spark, sfTiny))
    fresh should not be empty
    persisted shouldBe fresh
  }

  test("registered q_vec_cluster pipeline is cartesian-free end to end") {
    val plans = collection.mutable.ArrayBuffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // exercise the FRESH build (the registered row reads persisted
      // labels since r12 — the build plan is what must stay
      // cartesian-free)
      VectorQueries.vecClusterFromEmbeddings(
        Tables.embeddings(spark, sfTiny).select(col("vec_id"), col("embedding")))
        .collect()
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val now = plans.synchronized(plans.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val all = plans.synchronized(plans.toSeq)
      all should not be empty
      all.foreach { p =>
        p should not include "CartesianProduct"
        if (p.contains("BroadcastNestedLoopJoin")) p should include("BroadcastExchange")
      }
    } finally spark.listenerManager.unregister(listener)
  }
}
