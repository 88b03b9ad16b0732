package graft

import graft.operators.StatQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** Statistical-test operators. The DuckDB oracle owns cross-engine value
  * equality; these pin the MATH: every statistic is recomputed driver-side
  * from first principles (plain sorts, BigInt/BigDecimal arithmetic,
  * doubles combined in the exact op order the plan documents) and compared
  * EXACTLY — bit-equal doubles, equal longs. That proves the distributed
  * formulation (value-distinct ranking, bucketed two-pass cumulative,
  * decimal moments, floor-division scaling) implements the textbook
  * definitions, not just that two engines agree on the same mistake.
  */
class StatSpec extends SparkTestBase with Matchers {

  /** Exact cents via the same Spark cast the queries use. */
  private def centsOf(tbl: String, col0: String, extra: Seq[String]): Seq[(Seq[String], Long)] = {
    val df = tbl match {
      case "orders"   => Tables.orders(spark, sfTiny)
      case "lineitem" => Tables.lineitem(spark, sfTiny)
    }
    df.select(
        (org.apache.spark.sql.functions.col(col0).cast(DecimalType(12, 2)) * 100).cast(LongType).as("v") +:
          extra.map(c => org.apache.spark.sql.functions.col(c).cast(StringType).as(c)): _*)
      .collect().toSeq
      .map(r => (extra.indices.map(i => r.getString(i + 1)), r.getLong(0)))
  }

  /** Midrank machinery: distinct values ascending with (t, cumBefore). */
  private def ranked(vs: Seq[Long]): Seq[(Long, Long, Long)] = { // (v, t, cumBefore)
    val grouped = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var cum = 0L
    grouped.map { case (v, t) => val cb = cum; cum += t; (v, t, cb) }
  }

  test("q_stat_mannwhitney matches a first-principles recomputation") {
    val rows = centsOf("orders", "o_totalprice", Seq("o_orderstatus"))
      .filter(r => r._1.head == "O" || r._1.head == "F")
    val byV = rows.groupBy(_._2)
    val rk = ranked(rows.map(_._2))
    var n1 = 0L; var n2 = 0L; var r1x2 = 0L; var tie = 0L
    rk.foreach { case (v, t, cb) =>
      val t1 = byV(v).count(_._1.head == "O").toLong
      n1 += t1; n2 += t - t1
      r1x2 += t1 * (2 * cb + t + 1)
      tie += t * t * t - t
    }
    val u1 = (r1x2 - n1 * (n1 + 1)).toDouble / 2.0
    val u2 = (n1 * n2).toDouble - u1
    val z = (u1 - (n1 * n2).toDouble / 2.0) /
      math.sqrt((n1.toDouble * n2.toDouble / 12.0) *
        ((n1 + n2 + 1).toDouble - tie.toDouble / ((n1 + n2).toDouble * (n1 + n2 - 1).toDouble)))
    val got = StatQueries.statMannWhitney.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe n1
    got(0).getLong(1) shouldBe n2
    got(0).getDouble(2) shouldBe u1
    got(0).getDouble(3) shouldBe u2
    got(0).getDouble(4) shouldBe z
    // rank-sum identity: U1 + U2 == n1*n2 must hold exactly
    (u1 + u2) shouldBe (n1 * n2).toDouble
    info(f"n1=$n1 n2=$n2 u1=$u1%.1f z=$z%.4f")
  }

  test("q_stat_ks matches a first-principles recomputation") {
    val rows = centsOf("orders", "o_totalprice", Seq("o_orderstatus"))
      .filter(r => r._1.head == "O" || r._1.head == "F")
    val byV = rows.groupBy(_._2)
    val rk = ranked(rows.map(_._2))
    val n1 = rows.count(_._1.head == "O").toLong
    val n2 = rows.size - n1
    var c1 = 0L; var c2 = 0L; var dnum = 0L
    rk.foreach { case (v, t, _) =>
      val t1 = byV(v).count(_._1.head == "O").toLong
      c1 += t1; c2 += t - t1
      dnum = math.max(dnum, math.abs(c1 * n2 - c2 * n1))
    }
    val got = StatQueries.statKs.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe n1
    got(0).getLong(1) shouldBe n2
    got(0).getLong(2) shouldBe dnum
    got(0).getDouble(3) shouldBe dnum.toDouble / (n1 * n2).toDouble
    info(s"D = $dnum/${n1 * n2}")
  }

  test("q_stat_kruskal matches a first-principles recomputation") {
    val rows = centsOf("orders", "o_totalprice", Seq("o_orderpriority"))
    val rk = ranked(rows.map(_._2))
    val rank2 = rk.map { case (v, t, cb) => v -> (2 * cb + t + 1) }.toMap
    val n = rows.size.toLong
    val tie = rk.map { case (_, t, _) => t * t * t - t }.sum
    val groups = rows.groupBy(_._1.head).toSeq.sortBy(_._1).map { case (g, rs) =>
      (g, rs.size.toLong, rs.map(r => rank2(r._2)).sum)
    }
    // midrank totals must tile the full rank space: Σ r_g = N(N+1)/2
    groups.map(_._3).sum shouldBe n * (n + 1)
    val terms = groups.map { case (_, ng, rg2) =>
      val t = 12.0 * (rg2.toDouble / 2.0) * (rg2.toDouble / 2.0) /
        (ng.toDouble * n.toDouble * (n + 1).toDouble)
      BigDecimal(java.math.BigDecimal.valueOf(t)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    val s = terms.sum.toDouble
    val h = s - 3.0 * (n + 1).toDouble
    val hAdj = h / (1.0 - tie.toDouble / (n * n * n - n).toDouble)
    val got = StatQueries.statKruskal.query(spark, sfTiny).collect()
    got.length shouldBe groups.size
    got.zip(groups).foreach { case (row, (g, ng, rg2)) =>
      row.getString(0) shouldBe g
      row.getLong(1) shouldBe ng
      row.getDouble(2) shouldBe rg2.toDouble / 2.0
      row.getDouble(3) shouldBe h
      row.getDouble(4) shouldBe hAdj
    }
    info(f"H=$h%.4f H_adj=$hAdj%.4f over ${groups.size} groups")
  }

  test("q_stat_spearman matches a first-principles recomputation") {
    val li = Tables.lineitem(spark, sfTiny)
      .select(col("l_quantity").cast(LongType),
        (col("l_extendedprice").cast(DecimalType(12, 2)) * 100).cast(LongType))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val n = li.size.toLong
    val rx = ranked(li.map(_._1)).map { case (v, t, cb) => v -> (2 * cb + t + 1) }.toMap
    val ry = ranked(li.map(_._2)).map { case (v, t, cb) => v -> (2 * cb + t + 1) }.toMap
    var sxy = 0L; var sxx = 0L; var syy = 0L
    li.foreach { case (x, y) =>
      val cx = rx(x) - (n + 1); val cy = ry(y) - (n + 1)
      sxy += cx * cy; sxx += cx * cx; syy += cy * cy
    }
    val rho = sxy.toDouble / (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble))
    val got = StatQueries.statSpearman.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe n
    got(0).getLong(1) shouldBe sxy
    got(0).getLong(2) shouldBe sxx
    got(0).getLong(3) shouldBe syy
    got(0).getDouble(4) shouldBe rho
    // centered ranks must sum to zero exactly (mean of rank2 is N+1)
    li.map { case (x, _) => rx(x) - (n + 1) }.sum shouldBe 0L
    li.map { case (_, y) => ry(y) - (n + 1) }.sum shouldBe 0L
    info(f"rho=$rho%.4f over $n rows")
  }

  test("q_stat_chisq matches a first-principles recomputation") {
    val rows = Tables.orders(spark, sfTiny)
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val n = rows.size.toLong
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ra = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cb = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val terms = cells.toSeq.map { case ((a, b), o) =>
      val dv = (o * n - ra(a) * cb(b)).toDouble
      BigDecimal(java.math.BigDecimal.valueOf(dv * dv / (ra(a) * cb(b) * n).toDouble))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    }
    val chisq = terms.sum.toDouble
    val dof = (ra.size - 1).toLong * (cb.size - 1)
    val v = math.sqrt(chisq / (n.toDouble * math.min(ra.size - 1, cb.size - 1).toDouble))
    val got = StatQueries.statChisq.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe n
    got(0).getLong(1) shouldBe dof
    got(0).getDouble(2) shouldBe chisq
    got(0).getDouble(3) shouldBe v
    info(f"chisq=$chisq%.4f dof=$dof V=$v%.4f")
  }

  test("q_stat_ols matches an exact BigInt recomputation") {
    val nx = Tables.lineitem(spark, sfTiny).groupBy("l_orderkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val os = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType))
      .collect().toSeq
      // inner-join semantics: orders with no lineitem rows drop out
      .flatMap(r => nx.get(r.getLong(0)).map(x => (r.getString(1), BigInt(x), BigInt(r.getLong(2)))))
    val expected = os.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val n = BigInt(rs.size)
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val syy = rs.map(r => r._3 * r._3).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      def sgn(b: BigInt) = if (b < 0) BigInt(-1) else BigInt(1)
      val slopeE6 = sgn(num) * ((num.abs * 1000000) / den)
      val inum = sy * den - num * sx
      val interceptE6 = sgn(inum) * ((inum.abs * 1000000) / (n * den))
      val r2E6 = ((num * num / den) * 1000000) / deny
      (g, rs.size.toLong, slopeE6.toLong.toDouble / 1000000.0,
        interceptE6.toLong.toDouble / 1000000.0, r2E6.toLong.toDouble / 1000000.0)
    }
    val got = StatQueries.statOls.query(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    got shouldBe expected
    // r2 must land in [0, 1] (the fixture's totalprice is synthetic noise —
    // slope sign is NOT asserted; sf0.001 measures it negative)
    expected.foreach { case (_, _, _, _, r2) =>
      r2 should (be >= 0.0 and be <= 1.0)
    }
    info(expected.map { case (g, n, s, _, r2) => f"$g: n=$n slope=$s%.0f r2=$r2%.3f" }.mkString("; "))
  }

  test("q_stat_ttest matches an exact BigInt recomputation") {
    val rows = Tables.customer(spark, sfTiny)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast(DecimalType(12, 2)) * 100).cast(LongType))
      .collect().toSeq.map(r => (r.getString(0), BigInt(r.getLong(1))))
    def moments(g: String) = {
      val vs = rows.filter(_._1 == g).map(_._2)
      val n = BigInt(vs.size)
      val s = vs.sum
      val ss = vs.map(v => v * v).sum
      // a = floor(1e6 · (n·Σv² − (Σv)²) / (n·(n−1)·n))
      (n, s, ((n * ss - s * s) * 1000000) / (n * (n - 1) * n))
    }
    val (n1, s1, a1) = moments("BUILDING")
    val (n2, s2, a2) = moments("MACHINERY")
    val dnum = s1 * n2 - s2 * n1
    def sgn(b: BigInt) = if (b < 0) BigInt(-1) else BigInt(1)
    val dmE6 = sgn(dnum) * ((dnum.abs * 1000000) / (n1 * n2))
    val meanDiff = dmE6.toLong.toDouble / 1000000.0
    val t = meanDiff / math.sqrt((a1 + a2).toLong.toDouble / 1000000.0)
    val df = ((a1 + a2).toLong.toDouble * (a1 + a2).toLong.toDouble) /
      (a1.toLong.toDouble * a1.toLong.toDouble / (n1 - 1).toLong.toDouble +
        a2.toLong.toDouble * a2.toLong.toDouble / (n2 - 1).toLong.toDouble)
    val got = StatQueries.statTtest.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe n1.toLong
    got(0).getLong(1) shouldBe n2.toLong
    got(0).getDouble(2) shouldBe meanDiff
    got(0).getDouble(3) shouldBe t
    got(0).getDouble(4) shouldBe df
    // Welch df must land between min(n)−1 and n1+n2−2
    df should (be >= (n1.min(n2) - 1).toDouble and be <= (n1 + n2 - 2).toDouble)
    info(f"n1=$n1 n2=$n2 mean_diff=$meanDiff%.2f t=$t%.4f df=$df%.1f")
  }

  test("q_stat_anova matches an exact BigInt recomputation") {
    val rows = centsOf("orders", "o_totalprice", Seq("o_orderpriority"))
      .map(r => (r._1.head, BigInt(r._2)))
    def floorSqDiv(s: BigInt, n: BigInt) = (s / n) * s + ((s - (s / n) * n) * s) / n
    val gs = rows.groupBy(_._1).values.toSeq
    val n = BigInt(rows.size)
    val k = BigInt(gs.size)
    val s = rows.map(_._2).sum
    val ssq = rows.map(r => r._2 * r._2).sum
    val t = gs.map(g => floorSqDiv(g.map(_._2).sum, BigInt(g.size))).sum
    val ssn = floorSqDiv(s, n)
    val (ssb, ssw, sst) = (t - ssn, ssq - t, ssq - ssn)
    // floored-SS decomposition must be internally consistent: SSB + SSW = SST
    (ssb + ssw) shouldBe sst
    val f = ((ssb * (n - k) * 1000000) / (ssw * (k - 1))).toLong.toDouble / 1000000.0
    val eta2 = ((ssb * 1000000) / sst).toLong.toDouble / 1000000.0
    val got = StatQueries.statAnova.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe k.toLong
    got(0).getLong(1) shouldBe n.toLong
    got(0).getDouble(2) shouldBe f
    got(0).getDouble(3) shouldBe eta2
    eta2 should (be >= 0.0 and be <= 1.0)
    info(f"k=$k n=$n F=$f%.4f eta2=$eta2%.4f")
  }

  test("q_stat_survival matches a first-principles Kaplan-Meier life table") {
    val hours = Tables.events(spark, sfTiny)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val perUser = hours.groupBy(_._1).view.mapValues(hs => (hs.map(_._2).min, hs.map(_._2).max)).toMap
    val mh = perUser.values.map(_._2).max
    val subjects = perUser.values.toSeq.map { case (fh, lh) =>
      (lh - fh, if (mh - lh > 24) 1L else 0L)
    }
    val nTotal = subjects.size.toLong
    val byDur = subjects.groupBy(_._1).view
      .mapValues(ss => (ss.map(_._2).sum, ss.size - ss.map(_._2).sum)).toSeq.sortBy(_._1)
    var seen = 0L
    var log2Surv = BigDecimal(0)
    val expected = byDur.flatMap { case (dur, (d, c)) =>
      val nRisk = nTotal - seen
      seen += d + c
      if (d > 0) {
        log2Surv += BigDecimal(java.math.BigDecimal.valueOf(
          math.log((nRisk - d).toDouble / nRisk.toDouble) / math.log(2.0)))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
        Some((dur, nRisk, d, c, log2Surv.toDouble))
      } else None
    }
    val got = StatQueries.statSurvival.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    got shouldBe expected
    // survival is non-increasing: log2_surv weakly decreases down the table
    expected.map(_._5).sliding(2).foreach {
      case Seq(a, b) => b should be <= a
      case _         =>
    }
    info(s"${expected.size} event times over $nTotal subjects; " +
      f"final log2 S = ${expected.lastOption.map(_._5).getOrElse(0.0)}%.4f")
  }
}
