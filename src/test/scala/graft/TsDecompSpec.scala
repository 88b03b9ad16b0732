package graft

import graft.operators.TimeSeriesQueries
import org.scalatest.matchers.should.Matchers

/** q_ts_stl / q_ts_xcorr. Oracles own value equality; these pin the
  * decomposition identity and the correlation range.
  */
class TsDecompSpec extends SparkTestBase with Matchers {

  test("stl: additive identity holds and seasonal repeats by hour-of-day") {
    val rows = TimeSeriesQueries.tsStl.query(spark, sfTiny).collect()
    rows should not be empty
    rows.foreach { r =>
      val (y, trend, seas, resid) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // resid is defined as y - trend - seasonal on 6dp-rounded components
      math.abs(y - trend - seas - resid) should be < 1e-5
    }
    val byHod = rows.groupBy(_.getString(0).substring(11, 13)).view.mapValues(_.map(_.getDouble(3)).toSet)
    byHod.values.foreach(s => s.size shouldBe 1) // one seasonal value per hour-of-day
    byHod.size should be <= 24
  }

  test("xcorr: 7 lags, each within [-1, 1], on overlapping buckets") {
    val rows = TimeSeriesQueries.tsXcorr.query(spark, sfTiny).collect()
    rows.map(_.getLong(0)) shouldBe Array(0L, 1L, 2L, 3L, 4L, 5L, 6L)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"lag ${r.getLong(0)}: no aligned buckets")
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"lag ${r.getLong(0)}: corr $c out of range")
    }
  }
}
