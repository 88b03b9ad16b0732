package graft

import graft.operators.CdcQueries
import org.scalatest.matchers.should.Matchers

/** q_cdc_scd2_multi. The oracle owns value equality; this pins the
  * composite-SCD2 contract: versions tile time per user, every version
  * changed at least one tracked column, the per-column flags agree
  * exactly with the observed column deltas between consecutive
  * versions, and the first version of each key flags every column.
  */
class Scd2MultiSpec extends SparkTestBase with Matchers {

  private case class V(user: Long, tpe: String, value: Double,
      chType: Boolean, chValue: Boolean, from: Long, to: Option[Long], current: Boolean)

  test("composite versions tile time; flags match per-column deltas") {
    val rows = CdcQueries.cdcScd2Multi.query(spark, sfTiny).collect().map { r =>
      V(r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3), r.getBoolean(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getBoolean(7))
    }
    rows should not be empty
    // at least one version where only one of the two columns moved,
    // else the composite contract is vacuous on this fixture
    assert(rows.exists(v => v.chType && !v.chValue) || rows.exists(v => !v.chType && v.chValue),
      "fixture never exercises a single-column change")
    rows.groupBy(_.user).foreach { case (user, vs0) =>
      val vs = vs0.sortBy(_.from)
      vs.count(_.current) shouldBe 1
      assert(vs.last.current && vs.last.to.isEmpty, s"user $user: current is not the open tail")
      vs.init.foreach(v => assert(v.to.isDefined && !v.current))
      // first version flags every tracked column
      assert(vs.head.chType && vs.head.chValue, s"user $user: first version must flag all columns")
      vs.zip(vs.tail).foreach { case (a, b) =>
        a.to shouldBe Some(b.from)
        // a new version requires at least one change, and the flags are exact
        assert(b.chType || b.chValue, s"user $user: version opened with no change")
        assert(b.chType == (a.tpe != b.tpe), s"user $user: changed_type flag mismatch")
        assert(b.chValue == (a.value != b.value), s"user $user: changed_value flag mismatch")
      }
    }
  }

  test("version count never below the single-attribute dimension's") {
    // widening the tracked set can only split versions, never merge them
    val single = CdcQueries.cdcScd2.query(spark, sfTiny).count()
    val multi = CdcQueries.cdcScd2Multi.query(spark, sfTiny).count()
    assert(multi >= single, s"multi=$multi < single=$single")
  }
}
