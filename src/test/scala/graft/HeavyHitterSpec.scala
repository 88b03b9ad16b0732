package graft

import graft.operators.AggQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** q_agg_heavyhitters. The oracle owns fixture equality; this pins the
  * Misra–Gries guarantee where it actually bites — a synthetic corpus
  * with FAR more distinct items than the 128-counter buffer, skew-packed
  * so the decrement path runs — and the exactness of the two-phase
  * output under an adversarial partitioning.
  */
class HeavyHitterSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  test("MG candidates cover every global heavy hitter; two-phase output is exact") {
    // 10_000 distinct rare items (1 occurrence each) + 5 heavy items with
    // 400 occurrences each -> N = 12_000, threshold N/64 = 187.5
    val rare = (0 until 10000).map(i => s"rare_$i")
    val heavy = (0 until 5).flatMap(h => Seq.fill(400)(s"heavy_$h"))
    // adversarial layout: heavy items CLUSTERED at the end so early MG
    // buffers fill with rares first
    val items = (rare ++ heavy).toDF("token").repartition(7)
    val n = items.count()

    val cands = items.as[String].mapPartitions(AggQueries.mgCandidates(_, 128))
      .collect().toSet
    val exact = items.groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") * 64 > n)
      .collect().map(_.getString(0)).toSet
    exact shouldBe (0 until 5).map(h => s"heavy_$h").toSet
    assert(exact.subsetOf(cands),
      s"MG union missed heavy hitters: ${exact -- cands}")
    info(s"${cands.size} candidates cover ${exact.size} heavy hitters over 10005 distinct")

    // two-phase pipeline output == exact filter, regardless of candidates
    val twoPhase = items.as[String].mapPartitions(AggQueries.mgCandidates(_, 128))
      .toDF("token").distinct()
      .join(items, "token").groupBy("token").agg(count(lit(1)).as("c"))
      .filter(col("c") * 64 > n)
      .collect().map(_.getString(0)).toSet
    twoPhase shouldBe exact
  }
}
