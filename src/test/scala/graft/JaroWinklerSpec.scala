package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The native Jaro-Winkler expression. The DuckDB oracle owns value
  * equality on the registered query; this pins the published algorithm's
  * landmark constants (Winkler 1990 examples), the edge conventions the
  * oracle was probed for (empty → 0, equal → 1, window-0 strings), the
  * comparator axioms, and that the CODEGEN'D path (through a DataFrame)
  * equals interpreted eval.
  */
class JaroWinklerSpec extends SparkTestBase with Matchers {

  private def jw(a: String, b: String): Double =
    JaroWinkler.jw(org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("landmark constants match the published algorithm (DuckDB-probed)") {
    jw("MARTHA", "MARHTA") shouldBe 0.9611111111111111
    jw("DIXON", "DICKSONX") shouldBe 0.8133333333333332
    jw("JELLYFISH", "SMELLYFISH") shouldBe 0.8962962962962964
    jw("DWAYNE", "DUANE") shouldBe 0.8400000000000001
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    jw("abcdxxxxxxx", "abcdyyyyyyyyyyyyy") shouldBe 0.5329768271 +- 1e-10
    // the prefix bonus caps at 4 chars
    jw("abcdefgh", "abcdefxx") shouldBe 0.9 +- 1e-12
    // transposition-only pair: CRATE/TRACE has no prefix, jw = jaro
    jw("CRATE", "TRACE") shouldBe 0.7333333333333334
  }

  test("edge conventions: empty -> 0 (both ways and doubly), equal -> 1, window-0 strings") {
    jw("", "abc") shouldBe 0.0
    jw("abc", "") shouldBe 0.0
    jw("", "") shouldBe 0.0
    jw("abc", "abc") shouldBe 1.0
    jw("ab", "ba") shouldBe 0.0 // match window 0: no cross-position matches
  }

  test("comparator axioms on fixture names: symmetric, bounded, 1 iff equal") {
    val names = Tables.part(spark, sfTiny).select("p_name")
      .limit(40).collect().map(_.getString(0))
    for (a <- names; b <- names) {
      val s = jw(a, b)
      s should (be >= 0.0 and be <= 1.0)
      s shouldBe jw(b, a)
      if (a == b) s shouldBe 1.0
    }
  }

  test("codegen'd DataFrame path equals interpreted eval") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("small ring", "small king"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    val got = pairs.select(col("a"), col("b"),
        expr("graft_jaro_winkler(a, b)").as("jw"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    got.foreach { case (a, b, v) => v shouldBe jw(a, b) }
  }
}
