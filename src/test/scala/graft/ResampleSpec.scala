package graft

import graft.operators.ResampleQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Resampling family (q_stat_bootstrap, q_stat_permutation). The DuckDB
  * oracle owns value equality; these pin the INFERENTIAL properties the
  * operators exist for — the draws actually have the claimed
  * distributions, and the interval/p-value behave like the statistics
  * they claim to be.
  */
class ResampleSpec extends SparkTestBase with Matchers {

  test("bootstrap CI brackets the point estimate with a plausible width") {
    val rows = ResampleQueries.statBootstrap.query(spark, sfTiny).collect()
    rows should not be empty
    rows.foreach { r =>
      val (flag, n) = (r.getString(0), r.getLong(1))
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo < mean && mean < hi, s"$flag: CI [$lo,$hi] misses mean $mean")
      // qty ~ U(1..50): sd ≈ 14.4, so the 95% CI half-width should sit
      // near 2·14.4/√n — allow [0.5×, 2×] for replicate noise at R=40
      val se = 14.4 / math.sqrt(n.toDouble)
      val hw = (hi - lo) / 2
      assert(hw > se && hw < 4 * se, s"$flag: half-width $hw vs se $se (n=$n)")
    }
  }

  test("median bootstrap (unregistered, de-priced) equals a driver-side recomputation") {
    val rows = ResampleQueries.statBootstrapMedian.query(spark, sfTiny).collect()
    rows should not be empty
    rows.foreach { r =>
      val (flag, n) = (r.getString(0), r.getLong(1))
      val (med, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= med && med <= hi, s"$flag: CI [$lo,$hi] misses median $med")
      // price ~ U-ish over a wide range: median se ≈ 1.25·σ/√n; just pin
      // the order of magnitude — nonzero and well under 10% of the value
      val hw = (hi - lo) / 2.0
      assert(hw > 0 && hw < 0.1 * med, s"$flag: half-width $hw implausible (median $med, n=$n)")
    }
    // the de-priced row keeps an every-run equivalence proof: recompute
    // the whole statistic driver-side from raw rows with the same draw
    // formula and the same lower-median rule
    import org.apache.spark.sql.functions.{col, expr}
    val base = Tables.lineitem(spark, sfTiny)
      .select(col("l_returnflag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) div 1000").as("v"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val p = graft.functions.PortableHash
    val cdf = {
      val pmf = (0 to 6).scanLeft(math.exp(-1.0))((q, j) => q / (j + 1)).take(7)
      pmf.scanLeft(0.0)(_ + _).drop(1)
    }
    def w(k: Long, r: Long): Long = {
      val h2 = ((k % p.SeedMod) * (p.A + p.AStep * r) + p.BStep * r) % p.SeedMod
      val h4 = ((h2 * p.Scramble1Mul + p.Scramble1Add) % p.SeedMod
        * p.Scramble2Mul + p.Scramble2Add) % p.SeedMod
      val u = (h4 + 1.0) / 2147483648.0
      cdf.count(u > _).toLong
    }
    def lowerMedian(weighted: Seq[(Long, Long)]): Long = {
      val sorted = weighted.sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      sorted.find { case (_, c) => cum += c; cum * 2 >= tot }.get._1
    }
    for (flag <- base.map(_._1).distinct) {
      val fr = base.filter(_._1 == flag)
      val meds = (0L until 40L).map { r =>
        r -> lowerMedian(fr.groupBy(_._2).map { case (v, rs) =>
          v -> rs.map(t => w(t._3, r)).sum }.toSeq)
      }.sortBy { case (r, m) => (m, r) }.map(_._2)
      val row = rows.find(_.getString(0) == flag).get
      row.getLong(2) shouldBe lowerMedian(
        fr.groupBy(_._2).map { case (v, rs) => v -> rs.size.toLong }.toSeq) * 10
      row.getLong(3) shouldBe meds(1) * 10
      row.getLong(4) shouldBe meds(38) * 10
    }
  }

  test("poisson weights have Poisson(1) frequencies and unit mean") {
    import spark.implicits._
    // re-derive the draw exactly as the operator does, over a large key
    // grid, and check the empirical pmf against Poisson(1)
    val n = 20000
    val draws = (0 until n).map(_.toLong).toDF("k")
      .withColumn("r", explode(sequence(lit(0L), lit(3L))))
    val w = ResampleQueries.testPoissonWeight(col("k") * 8 + 1, col("r"))
    val freq = draws.select(w.as("w")).groupBy("w").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = freq.values.sum.toDouble
    total shouldBe (n * 4).toDouble
    val pmf = Seq(0.3679, 0.3679, 0.1839, 0.0613)
    pmf.zipWithIndex.foreach { case (p, k) =>
      val obs = freq.getOrElse(k.toLong, 0L) / total
      assert(math.abs(obs - p) < 0.01, s"P[w=$k] observed $obs expected $p")
    }
    val meanW = freq.map { case (k, c) => k * c }.sum / total
    assert(math.abs(meanW - 1.0) < 0.01, s"mean weight $meanW != 1")
  }

  test("permutation p-value is calibrated: null data large p, shifted data minimal p") {
    val out = ResampleQueries.statPermutation.query(spark, sfTiny).collect()
    out should have length 1
    val p = out.head.getAs[Double]("p_value")
    // quantity is independent of returnflag in the fixture — the observed
    // diff should NOT be extreme (add-one floor is 1/41 ≈ 0.0244)
    assert(p >= 1.0 / 41, s"null p-value $p below the add-one floor")
    assert(p <= 1.0, s"p-value $p > 1")
    info(s"fixture p-value $p, obs_diff ${out.head.getAs[Double]("obs_diff")}")

    import spark.implicits._
    // a 20-unit mean shift between groups: no hash-coin replicate can
    // reproduce it, so p collapses to the add-one floor exactly
    val shifted = (0 until 2000).map { i =>
      if (i % 2 == 0) ("A", (10 + i % 7) * 100L, i.toLong)
      else ("R", (30 + i % 7) * 100L, i.toLong)
    }.toDF("l_returnflag", "qc", "k")
    val ps = ResampleQueries.permutationFrom(shifted).collect().head
      .getAs[Double]("p_value")
    assert(math.abs(ps - 1.0 / 41) < 1e-6, s"shifted p-value $ps != 1/41")
  }
}
