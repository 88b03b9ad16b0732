package graft

import graft.operators.{TextQueries, TimeSeriesQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** q_ts_acf, q_text_zipf, and q_agg_histogram_eqdepth pinned against
  * driver-side BigInt/BigDecimal recomputations and structural
  * invariants (the StatSpec discipline): the DuckDB oracle owns
  * cross-engine equality, these prove the distributed formulations
  * implement the textbook definitions exactly.
  */
class AcfZipfSpec extends SparkTestBase with Matchers {

  test("q_agg_histogram_eqdepth: buckets partition N with ~N/16 mass each") {
    val got = graft.operators.AggQueries.aggHistogramEqdepth.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = got.map(_._4).sum
    n shouldBe Tables.orders(spark, sfTiny).count()
    // bucket ids are a prefix of 0..15, boundaries strictly increase,
    // and intervals never overlap
    got.map(_._1).toSeq shouldBe got.map(_._1).toSeq.sorted
    all(got.map(_._1)) should (be >= 0L and be <= 15L)
    got.sliding(2).foreach {
      case Array(a, b) => b._2 should be > a._3 // next lo > prev hi
      case _           =>
    }
    // equi-depth: every bucket holds ≥ floor(N/16) − maxSingleValueMass
    // and the assignment rule caps a bucket's EXCESS over N/16 by its
    // heaviest single value (a heavy value owns its bucket)
    val maxT = Tables.orders(spark, sfTiny)
      .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
      .groupBy("v").count().agg(max("count")).collect()(0).getLong(0)
    val target = n / 16
    got.foreach { case (_, _, _, rows, _) =>
      rows should be >= math.max(1L, target - maxT)
      rows should be <= target + maxT
    }
    info(s"${got.length} buckets, N=$n, target=$target, maxValueMass=$maxT")
  }

  test("q_ts_acf matches an exact BigInt recomputation and is bounded by 1") {
    val hourly = Tables.events(spark, sfTiny)
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("x"))
      .groupBy("event_type", "h").agg(sum("x").as("x"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), BigInt(r.getLong(2))))
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val n = BigInt(rows.size)
      val sx = rows.map(_._3).sum
      val y = rows.map { case (_, h, x) => h -> (n * x - sx) }.toMap
      val den = y.values.map(v => v * v).sum
      (1 to 3).map { k =>
        val pairs = y.toSeq.flatMap { case (h, v) => y.get(h + k).map(v2 => v * v2) }
        val num = pairs.sum
        val sgn = if (num < 0) BigInt(-1) else BigInt(1)
        val acf = (sgn * ((num.abs * 1000000) / den)).toLong.toDouble / 1000000.0
        ((g, k), (pairs.size.toLong, acf))
      }
    }.toMap
    val got = TimeSeriesQueries.tsAcf.query(spark, sfTiny).collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe expected
    // an autocorrelation is a cosine: |acf| ≤ 1 always
    got.values.foreach { case (_, a) => math.abs(a) should be <= 1.0 }
    info(got.toSeq.sortBy(_._1).take(3)
      .map { case ((g, k), (_, a)) => f"$g@$k=$a%.3f" }.mkString(", "))
  }

  test("q_text_zipf matches an exact recomputation and slopes downward") {
    val counts = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("f"))
      .collect().toSeq.map(r => r.getLong(1))
    val vf = counts.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(-_._1) // rank 1 = most frequent
    var cum = 0L
    def s4(d: Double): BigInt =
      (BigDecimal(java.math.BigDecimal.valueOf(d))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000).toBigIntExact.get
    val pts = vf.map { case (f, t) =>
      val rank2 = 2 * cum + t + 1; cum += t
      (BigInt(t),
        s4(math.log(rank2.toDouble / 2.0) / math.log(2.0)),
        s4(math.log(f.toDouble) / math.log(2.0)))
    }
    val n = pts.map(_._1).sum
    val sx = pts.map(p => p._1 * p._2).sum
    val sy = pts.map(p => p._1 * p._3).sum
    val sxy = pts.map(p => p._1 * p._2 * p._3).sum
    val sxx = pts.map(p => p._1 * p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val den = n * sxx - sx * sx
    def sgn(b: BigInt) = if (b < 0) BigInt(-1) else BigInt(1)
    val slope = (sgn(num) * ((num.abs * 1000000) / den)).toLong.toDouble / 1000000.0
    val inum = sy * den - num * sx
    val intercept = (sgn(inum) * ((inum.abs * 100) / (n * den))).toLong.toDouble / 1000000.0
    val got = TextQueries.textZipf.query(spark, sfTiny).collect()
    got.length shouldBe 1
    got(0).getLong(0) shouldBe n.toLong
    got(0).getDouble(1) shouldBe slope
    got(0).getDouble(2) shouldBe intercept
    // Zipf: frequency falls with rank
    slope should be < 0.0
    info(f"n_types=$n slope=$slope%.4f intercept=$intercept%.4f")
  }
}
