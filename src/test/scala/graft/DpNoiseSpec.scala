package graft

import graft.operators.MoreQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The deterministic Laplace draw behind q_dq_dpnoise must actually BE
  * Laplace-distributed in magnitude (not just "some noise"): mean
  * absolute deviation ≈ b, median ≈ b·ln2, signs balanced, tail bounded
  * by the inverse-CDF's reachable extreme, eps scales b — plus the
  * determinism and clamping contracts of the registered release row.
  */
class DpNoiseSpec extends SparkTestBase with Matchers {

  private val sfSmall = "/root/testdata/sf0.01"

  private def noises(): Seq[Double] = {
    val released = MoreQueries.dqDpnoise.query(spark, sfSmall)
    val truth = Tables.customer(spark, sfSmall)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") >= 0).as("acct_nonneg"))
      .agg(count(lit(1)).as("n"))
    released.join(truth, Seq("c_nationkey", "c_mktsegment", "acct_nonneg"))
      .select((col("noised_count") - col("n")).as("noise"))
      .collect().map(_.getDouble(0)).toSeq
  }

  test("noise magnitudes follow Laplace(b=1): mean |x| ~ 1, median ~ ln2, signs balanced, tail bounded") {
    val ns = noises()
    ns.size should be > 150 // the sf0.01 QI domain (201 groups measured)
    val absMean = ns.map(math.abs).sum / ns.size
    absMean should (be >= 0.6 and be <= 1.5) // E|Laplace(1)| = 1, n~200
    val medianFrac = ns.count(n => math.abs(n) <= math.log(2.0)).toDouble / ns.size
    medianFrac should (be >= 0.35 and be <= 0.65) // P(|x| <= b ln2) = 1/2
    val posFrac = ns.count(_ > 0).toDouble / ns.size
    posFrac should (be >= 0.35 and be <= 0.65) // symmetric about 0
    // inverse-CDF extreme: |x| <= b * ln((p+1)/2) < 21.5 at b = 1
    all(ns.map(math.abs)) should be <= 21.5
  }

  test("the draw is deterministic and eps scales the magnitude by 1/eps") {
    import spark.implicits._
    val keys = (1 to 50).map(i => s"group|$i").toDF("k")
    val a = keys.select(MoreQueries.laplaceNoise(col("k"), 1.0).as("n"))
      .collect().map(_.getDouble(0))
    val b = keys.select(MoreQueries.laplaceNoise(col("k"), 1.0).as("n"))
      .collect().map(_.getDouble(0))
    a should contain theSameElementsInOrderAs b // same key -> same draw
    val half = keys.select(MoreQueries.laplaceNoise(col("k"), 2.0).as("n"))
      .collect().map(_.getDouble(0))
    a.zip(half).foreach { case (x1, x2) =>
      x2 shouldBe (x1 / 2.0) +- 1e-6 // 6dp rounding of an exact halving
    }
  }

  test("released counts clamp at zero and equal noised_count elsewhere") {
    val rows = MoreQueries.dqDpnoise.query(spark, sfSmall)
      .select("noised_count", "released").collect()
    rows.foreach { r =>
      val (nc, rel) = (r.getDouble(0), r.getDouble(1))
      rel should be >= 0.0
      if (nc >= 0.0) rel shouldBe nc else rel shouldBe 0.0
    }
  }
}
