package graft

import graft.operators.{Refresh, RefreshResult}
import org.apache.spark.sql.functions.{array_distinct, call_function, col, sort_array, approx_count_distinct}
import org.apache.spark.sql.{functions => F}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.matchers.should.Matchers

/** ScalaCheck properties (SURVEY.md §5.2(3)): refresh exit-code fold ≡
  * ∀-conjunction, target parsing, and algebraic laws of the native
  * similarity expressions over generated data (generators build one table,
  * the cluster evaluates the expression — one Spark job per law).
  * Deterministic: generators are driven from fixed seeds.
  */
class PropertySpec extends SparkTestBase with Matchers {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("refresh exit code ≡ forall-conjunction (ref impala-refresher.go:173-180)") {
    val genResult = for {
      ok <- Gen.oneOf(true, false)
      name <- Gen.identifier
      d <- Gen.posNum[Long]
    } yield RefreshResult(name, ok, if (ok) None else Some("e"), d)
    samples(Gen.nonEmptyListOf(genResult), 200).foreach { rs =>
      Refresh.exitCode(rs) shouldBe (if (rs.forall(_.ok)) 0 else 1)
    }
  }

  test("target parsing: trims spaces, preserves order, rejects empties") {
    val name = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    samples(Gen.nonEmptyListOf(name), 200).foreach { names =>
      Refresh.parseTargets(names.mkString(" , ")).map(_.name) shouldBe names
    }
  }

  test("sorted-intersect laws: symmetric, bounded by min size, self = size") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val gen = Gen.listOfN(40, Gen.chooseNum(0L, 30L)) // small domain → real overlaps
    val rows = samples(Gen.zip(gen, gen), 100)
    val df = rows.toDF("a_raw", "b_raw")
      .select(sort_array(array_distinct(col("a_raw"))).as("a"),
        sort_array(array_distinct(col("b_raw"))).as("b"))
      .select(
        call_function("graft_sorted_intersect_size_long", col("a"), col("b")).as("ab"),
        call_function("graft_sorted_intersect_size_long", col("b"), col("a")).as("ba"),
        call_function("graft_sorted_intersect_size_long", col("a"), col("a")).as("aa"),
        F.size(col("a")).as("sa"), F.size(col("b")).as("sb"))
    df.collect().foreach { r =>
      r.getAs[Int]("ab") shouldBe r.getAs[Int]("ba")
      r.getAs[Int]("ab") should be <= math.min(r.getAs[Int]("sa"), r.getAs[Int]("sb"))
      r.getAs[Int]("aa") shouldBe r.getAs[Int]("sa")
    }
  }

  test("cosine laws: symmetric, within [-1, 1] + ulp, self ≈ 1") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val vec = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f))
      .suchThat(_.exists(v => math.abs(v) > 0.1f))
    val rows = samples(Gen.zip(vec, vec), 100)
    val df = rows.toDF("a", "b").select(
      call_function("graft_cosine_similarity", col("a"), col("b")).as("ab"),
      call_function("graft_cosine_similarity", col("b"), col("a")).as("ba"),
      call_function("graft_cosine_similarity", col("a"), col("a")).as("aa"))
    df.collect().foreach { r =>
      r.getDouble(0) shouldBe r.getDouble(1) // exactly: same op order
      r.getDouble(0) should (be >= -1.0 - 1e-12 and be <= 1.0 + 1e-12)
      r.getDouble(2) shouldBe 1.0 +- 1e-12
    }
  }

  test("HLL monotone-ish: approx distinct of a superset ≥ 0.9 × subset's") {
    val e = Tables.events(spark, sfTiny)
    val sub = e.filter(col("user_id") < 50)
      .agg(approx_count_distinct(col("user_id"), 0.02)).collect().head.getLong(0)
    val full = e.agg(approx_count_distinct(col("user_id"), 0.02)).collect().head.getLong(0)
    full.toDouble should be >= sub * 0.9
  }
}
