package graft

import graft.operators.{EventQueries, MiningQueries, StatQueries}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Round-10 additions beyond the graduation/seqmine families: item-item
  * recommendations, MAD robust dispersion, and RFM segmentation — each
  * pinned against a driver-side brute force independent of both the
  * Spark plan and the DuckDB oracle.
  */
class R10OpsSpec extends SparkTestBase with Matchers {

  test("q_mine_recs: top-3 per item, cosine == brute-force co-occurrence cosine") {
    val rows = MiningQueries.mineRecs.query(spark, sfTiny).collect()
    rows should not be empty
    // well-formed: ranks 1..k per item, cosine in (0, 1], descending
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getInt(1)).sorted.toSeq shouldBe (1 to g.length)
      val cs = g.sortBy(_.getInt(1)).map(_.getDouble(4))
      cs.zip(cs.tail).foreach { case (a, b) => a should be >= b }
      cs.foreach(c => c should (be > 0.0 and be <= 1.0))
    }
    // brute force: baskets -> frequent items -> pair counts -> cosine
    val bi = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sup = bi.groupBy(_._2).view.mapValues(_.length).toMap.filter(_._2 >= 25)
    val byBasket = bi.filter(x => sup.contains(x._2)).groupBy(_._1)
    val pc = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byBasket.values.foreach { xs =>
      val items = xs.map(_._2).distinct.sorted
      for (i <- items.indices; j <- i + 1 until items.length)
        pc((items(i), items(j))) = pc.getOrElse((items(i), items(j)), 0) + 1
    }
    val freq = pc.filter(_._2 >= 2)
    rows.foreach { r =>
      val (i, j, c) = (r.getLong(0), r.getLong(2), r.getLong(3))
      freq.getOrElse((math.min(i, j), math.max(i, j)), -1) shouldBe c
      val want = math.round(c.toDouble / math.sqrt((sup(i).toLong * sup(j)).toDouble) * 1e6) / 1e6
      r.getDouble(4) shouldBe want
    }
  }

  test("q_stat_mad: median/MAD/outliers == brute-force per group; constant group degenerates to 0") {
    val got = StatQueries.statMad.query(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r).toMap
    val vals = Tables.orders(spark, sfTiny)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def med2(xs: IndexedSeq[Long]): Long = xs((xs.length - 1) / 2) + xs(xs.length / 2)
    vals.foreach { case (grp, xs) =>
      val m2 = med2(xs)
      val devs = xs.map(v => math.abs(2 * v - m2)).sorted
      val mad4 = med2(devs)
      val r = got(grp)
      r.getLong(1) shouldBe xs.length.toLong
      r.getDouble(2) shouldBe m2 / 2.0
      r.getDouble(3) shouldBe mad4 / 4.0
      r.getLong(4) shouldBe devs.count(d => 2 * d > 3 * mad4).toLong
    }
    // degenerate: a constant group has MAD 0 and zero outliers, never a crash
    import spark.implicits._
    val const = Seq(("A", 5L), ("A", 5L), ("A", 5L)).toDF("grp", "v")
    val d = StatQueries.madOn(const).collect()
    d.length shouldBe 1
    d(0).getDouble(3) shouldBe 0.0
    d(0).getLong(4) shouldBe 0L
  }

  test("q_ts_trend: Mann-Kendall S/Z and Sen slope == brute-force over the hourly series") {
    val got = graft.operators.TimeSeriesQueries.tsTrend.query(spark, sfTiny).collect()
      .map(r => r.getString(0) -> r).toMap
    val hourly = Tables.events(spark, sfTiny)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100).cast("long").as("x"))
      .groupBy("event_type", "h").agg(sum("x").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._2, t._3))).toMap
    hourly.foreach { case (g, series) =>
      val n = series.length
      val pairs = for (i <- series.indices; j <- i + 1 until n) yield (series(i), series(j))
      val s = pairs.map { case ((_, xi), (_, xj)) => java.lang.Long.signum(xj - xi).toLong }.sum
      val slopes = pairs.map { case ((hi, xi), (hj, xj)) =>
        math.floor((xj - xi).toDouble / (hj - hi) * 1e6).toLong }.sorted
      val med2 = slopes((slopes.length - 1) / 2) + slopes(slopes.length / 2)
      val tie = series.groupBy(_._2).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varS = (n.toLong * (n - 1) * (2L * n + 5) - tie) / 18.0
      val r = got(g)
      r.getLong(1) shouldBe n.toLong
      r.getLong(2) shouldBe pairs.length.toLong
      r.getLong(3) shouldBe s
      r.getDouble(5) shouldBe med2 / 2e6
      if (varS > 0) {
        val z = if (s > 0) (s - 1) / math.sqrt(varS)
        else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
        r.getDouble(4) shouldBe z
      }
    }
  }

  test("q_events_rfm: scores are balanced exact quintiles and recount per user") {
    val rows = EventQueries.eventsRfm.query(spark, sfTiny).collect()
    rows should not be empty
    val n = rows.length
    // each score dimension: values 1..5, bucket sizes differ by at most 1
    for (c <- Seq(4, 5, 6)) {
      val hist = rows.groupBy(_.getInt(c)).view.mapValues(_.length).toMap
      hist.keySet.subsetOf((1 to 5).toSet) shouldBe true
      (hist.values.max - hist.values.min) should be <= 1
      hist.values.sum shouldBe n
    }
    // recount R/F/M for one concrete user against raw events
    val ev = Tables.events(spark, sfTiny)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nowUs = ev.map(_._2).max
    val byUser = ev.groupBy(_._1)
    rows.foreach { r =>
      val u = byUser(r.getLong(0))
      r.getLong(1) shouldBe (nowUs - u.map(_._2).max) / 86400000000L
      r.getLong(2) shouldBe u.length.toLong
      r.getLong(3) shouldBe u.map(_._3).sum
      r.getString(7) shouldBe s"${r.getInt(4)}${r.getInt(5)}${r.getInt(6)}"
    }
  }
}
