package graft

import graft.operators.StatQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Pins the DOCUMENTED degenerate-input behavior of the statistical-test
  * cores (the fixtures never exercise these, so without a pin a
  * refactor could silently change them): empty and single-group inputs
  * yield empty or null-statistic results — never an exception, never a
  * fabricated number. A library user filtering to a group that doesn't
  * exist gets an unmissable null/empty, not a crash mid-pipeline.
  */
class StatDegenerateSpec extends SparkTestBase with Matchers {
  import org.apache.spark.sql.DataFrame

  private def frame(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("grp", "v")
  }
  private val noRows = Seq.empty[(String, Long)]

  test("empty input: rank tests emit a single all-null or empty result, never throw") {
    val e = frame(noRows)
    val mw = StatQueries.mannWhitneyOn(e, "A").collect()
    mw.length shouldBe 1
    mw(0).isNullAt(0) shouldBe true // n1 null — unmissable
    // KS on EMPTY input emits ZERO rows (not one all-null row): the
    // DuckDB oracle's GROUP BY n1, n2 shape, and what serveKs must show
    // before the first batch (one-shot ≡ state-served ≡ oracle)
    StatQueries.ksOn(e, "A").collect().length shouldBe 0
    StatQueries.kruskalOn(e).collect().length shouldBe 0
    StatQueries.anovaOn(e).collect().length shouldBe 1
  }

  test("single-group input: two-sample tests yield null statistics, never throw") {
    val one = frame(Seq(("A", 100L), ("A", 200L), ("A", 300L)))
    // sample-2 empty: n2 = 0 → zero rank variance → z NULL, not a crash
    val mw = StatQueries.mannWhitneyOn(one, "A").collect()
    mw.length shouldBe 1
    mw(0).getLong(1) shouldBe 0L // n2
    mw(0).isNullAt(4) shouldBe true // z undefined
    val t = StatQueries.ttestOn(one, "A").collect()
    // one side has no moment row → the inner-join-shaped crossJoin yields 0 rows
    t.length shouldBe 0
    // kruskal with ONE group: H = 12·R²/(n·n·(n+1)) − 3(n+1) = 0 exactly
    val kw = StatQueries.kruskalOn(one.select(col("grp"), col("v"))).collect()
    kw.length shouldBe 1
    kw(0).getDouble(3) shouldBe 0.0 +- 1e-9
  }

  test("constant values: spearman and anova yield null/NaN statistics, never throw") {
    import spark.implicits._
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val sp = StatQueries.spearmanOn(const).collect()
    sp.length shouldBe 1
    sp(0).getLong(3) shouldBe 0L // syy = 0: constant column
    sp(0).isNullAt(4) shouldBe true // rho undefined → NULL, unmissable
    val an = StatQueries.anovaOn(
      Seq(("A", 5L), ("A", 5L), ("B", 5L), ("B", 5L)).toDF("grp", "v")).collect()
    an.length shouldBe 1
    // SSW = 0 → F's div by zero → null (Spark div) — pinned as null
    an(0).isNullAt(2) shouldBe true
  }

  test("zero-variance series: acf yields NULL, never an ANSI divide-by-zero") {
    import spark.implicits._
    // constant hourly values → den = Σy² = 0 → acf NULL per lag
    val const = (0L until 8L).map(h => ("E", h, 500L)).toDF("g", "h", "x")
    val acf = graft.operators.TimeSeriesQueries.acfOn(const, 2).collect()
    acf.length shouldBe 2
    acf.foreach(_.isNullAt(3) shouldBe true) // acf undefined, unmissable
  }

  test("single distinct frequency: zipf yields NULL slope/intercept, never throws") {
    import spark.implicits._
    // every token appears exactly twice → one (f, t) point → den = 0
    val counts = Seq(("a", 2L), ("b", 2L), ("c", 2L)).toDF("token", "f")
    val z = graft.operators.TextQueries.zipfOn(counts).collect()
    z.length shouldBe 1
    z(0).isNullAt(1) shouldBe true // slope
    z(0).isNullAt(2) shouldBe true // intercept
  }
}
