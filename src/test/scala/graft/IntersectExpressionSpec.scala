package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

/** Laws of the threshold-aware intersect expression against the plain one:
  * AtLeast(a, b, 0) ≡ Size(a, b); AtLeast(a, b, m) = Size when Size ≥ m and
  * -1 otherwise — over seeded generated data through the SQL surface (so
  * codegen, not just interpreted eval, is what runs).
  */
class IntersectExpressionSpec extends SparkTestBase with Matchers {

  test("AtLeast ≡ plain intersect gated by the minimum, including early-exit paths") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.chooseNum(0L, 25L))
    val rows = (0 until 120)
      .flatMap(i => Gen.zip(gen, gen, Gen.chooseNum(0, 30)).apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = rows.toDF("a_raw", "b_raw", "m")
      .select(sort_array(array_distinct(col("a_raw"))).as("a"),
        sort_array(array_distinct(col("b_raw"))).as("b"), col("m"))
      .select(
        call_function(GraftFunctions.SortedLongIntersectName, col("a"), col("b")).as("plain"),
        call_function(GraftFunctions.SortedLongIntersectAtLeastName, col("a"), col("b"), lit(0)).as("at0"),
        call_function(GraftFunctions.SortedLongIntersectAtLeastName, col("a"), col("b"), col("m")).as("atm"),
        col("m"), F.size(col("a")).as("sa"))
    df.collect().foreach { r =>
      val (plain, at0, atm, m) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      at0 shouldBe plain
      if (plain >= m) atm shouldBe plain else atm shouldBe -1
    }
  }

  test("threshold arithmetic: ceil(t(s1+s2)/(1+t)) integer forms are exact") {
    for (s <- 1 to 400) {
      ((s + 2) / 3) shouldBe math.ceil(0.5 * s / 1.5).toInt // t = 0.5
      ((3 * s + 12) / 13) shouldBe math.ceil(0.3 * s / 1.3).toInt // t = 0.3
    }
  }
}
