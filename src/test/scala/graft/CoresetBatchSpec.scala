package graft

import graft.operators.VectorQueries
import org.scalatest.matchers.should.Matchers

/** q_vec_coreset_batch. The oracle owns the trace; this pins the
  * mini-batch contract (k distinct picks, seed = min id, per-round
  * non-increasing pick distances) and MEASURES the approximation: the
  * batch selection's coverage radius (max over corpus of min cosine
  * distance to the picked set) must stay within a small factor of the
  * exact greedy's — the number that says k/m rounds did not cost
  * meaningful coverage.
  */
class CoresetBatchSpec extends SparkTestBase with Matchers {

  private def picks(name: String): Vector[(Int, Long, Double)] =
    SparkEntry.queries(name)(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toVector

  private def coverage(centerIds: Set[Long]): Double = {
    val all = graft.Tables.embeddings(spark, sfTiny)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val centers = all.filter(p => centerIds(p._1)).map(_._2)
    all.iterator.filterNot(p => centerIds(p._1)).map { case (_, emb) =>
      centers.map(c => VectorQueries.round6(1.0 - VectorQueries.cosSeq(emb, c))).min
    }.max
  }

  test("contract: 10 distinct picks, min-id seed, in-round monotone dists") {
    val ps = picks("q_vec_coreset_batch")
    ps.map(_._1) shouldBe (1 to 10).toVector
    ps.map(_._2).distinct.size shouldBe 10
    ps.head._3 shouldBe 0.0
    val minId = graft.Tables.embeddings(spark, sfTiny).agg(org.apache.spark.sql.functions.min("vec_id"))
      .head.getLong(0)
    ps.head._2 shouldBe minId
    // within each round the greedy sub-picks are non-increasing
    Seq(ps.slice(1, 5), ps.slice(5, 10)).foreach { round =>
      round.zip(round.tail).foreach { case (a, b) =>
        assert(a._3 >= b._3, s"in-round pick dists must be non-increasing: $a then $b")
      }
    }
  }

  test("coverage radius within 1.3x of the exact greedy's") {
    val exact = coverage(picks("q_vec_coreset").map(_._2).toSet)
    val batch = coverage(picks("q_vec_coreset_batch").map(_._2).toSet)
    info(f"coverage radius exact=$exact%.6f batch=$batch%.6f ratio=${batch / exact}%.3f")
    assert(batch <= exact * 1.3 + 1e-9, s"batch coverage $batch vs exact $exact")
  }
}
