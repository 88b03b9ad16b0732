package graft

import graft.operators.TimeSeriesQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** q_ts_changepoint. The DuckDB oracle owns value equality; this pins the
  * mathematical claim the plan rests on: the window closed form
  * s_t = P_t − min(0, min_{j<t} P_j) equals the textbook sequential CUSUM
  * recursion s_t = max(0, s_{t-1} + (x_t − μ ∓ κ)) — recomputed here per
  * series with plain driver-side BigDecimal arithmetic.
  */
class ChangepointSpec extends SparkTestBase with Matchers {

  test("window closed form equals the sequential CUSUM recursion") {
    val kappa = BigDecimal(25)
    val h = BigDecimal(250)
    val rows = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast("decimal(9,2)").as("v"))
      .collect()
      .map { r =>
        val ldt = r.getAs[java.time.LocalDateTime](2)
        (r.getLong(0), r.getLong(1),
          (ldt.toEpochSecond(java.time.ZoneOffset.UTC), ldt.getNano),
          BigDecimal(r.getDecimal(3)))
      }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      val n = ordered.size
      // scaled-by-n arithmetic to stay exact (μ = S/n is rational)
      val sv = ordered.map(_._4).sum
      var sPos = BigDecimal(0); var sNeg = BigDecimal(0)
      ordered.flatMap { case (_, eid, _, v) =>
        // s' tracked at scale n: s'_t = max(0, s'_{t-1} + n·x − (S ± n·κ))
        sPos = (sPos + v * n - (sv + kappa * n)).max(0)
        sNeg = (sNeg + (sv - kappa * n) - v * n).max(0)
        val out = Seq.newBuilder[(Long, Long, Double, String)]
        if (sPos > h * n)
          out += ((uid, eid, ((sPos * 100).toLongExact).toDouble / (n * 100L), "up"))
        if (sNeg > h * n)
          out += ((uid, eid, ((sNeg * 100).toLongExact).toDouble / (n * 100L), "down"))
        out.result()
      }
    }.toSet
    val got = TimeSeriesQueries.tsChangepoint.query(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    got shouldBe expected
    info(s"${got.size} alarm rows at sf0.001 " +
      s"(${got.count(_._4 == "up")} up / ${got.count(_._4 == "down")} down), " +
      "closed form ≡ recursion")
  }
}
