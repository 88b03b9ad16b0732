package graft

import graft.operators.CdcQueries
import org.scalatest.matchers.should.Matchers

/** q_cdc_scd2. The oracle owns value equality; this pins the SCD2
  * contract: per user, versions tile time with no gaps or overlaps,
  * consecutive versions always change the attribute, and exactly one
  * version is current.
  */
class Scd2Spec extends SparkTestBase with Matchers {

  test("versions tile time, always change value, one current per user") {
    val rows = CdcQueries.cdcScd2.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    rows should not be empty
    rows.groupBy(_._1).foreach { case (user, vs0) =>
      val vs = vs0.sortBy(_._3)
      // exactly one open (current) version, and it is the last
      vs.count(_._5) shouldBe 1
      assert(vs.last._5 && vs.last._4.isEmpty, s"user $user: current version is not the open tail")
      vs.init.foreach { v => assert(v._4.isDefined && !v._5) }
      // intervals tile: each close equals the next open; attribute changes
      vs.zip(vs.tail).foreach { case (a, b) =>
        a._4 shouldBe Some(b._3)
        assert(a._2 != b._2, s"user $user: consecutive versions share value ${a._2}")
      }
    }
  }
}
