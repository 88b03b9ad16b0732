package graft

import graft.operators.LayoutQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Layout family (q_layout_zorder). The DuckDB oracle owns value equality;
  * this pins the zone-map property the operator exists for: a z-prefix
  * bucket bounds BOTH dimensions simultaneously, so per-bucket min/max
  * footers prune on either column.
  */
class LayoutSpec extends SparkTestBase with Matchers {

  test("z-order buckets bound both dimensions at once") {
    val rows = LayoutQueries.layoutZorder.query(spark, sfTiny).collect()
    rows should not be empty
    val li = Tables.lineitem(spark, sfTiny)
      .agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    val (maxp, maxs) = (li.getLong(0), li.getLong(1))
    // top-4-bit prefix = 2 high bits per dimension -> each bucket covers a
    // quarter of each normalized domain; allow the value->range-id
    // rounding slack (one 1024th of the domain, +1)
    val (pCap, sCap) = ((maxp + 1) / 4 + (maxp + 1) / 1024 + 2,
                        (maxs + 1) / 4 + (maxs + 1) / 1024 + 2)
    rows.foreach { r =>
      val (pw, sw) = (r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(pw <= pCap, s"bucket ${r.getLong(0)} partkey width $pw > $pCap")
      assert(sw <= sCap, s"bucket ${r.getLong(0)} suppkey width $sw > $sCap")
    }
    // buckets partition the table: counts sum to the row count
    rows.map(_.getLong(1)).sum shouldBe Tables.lineitem(spark, sfTiny).count()
    info(s"${rows.length} buckets, partkey width cap $pCap (domain $maxp), " +
      s"suppkey cap $sCap (domain $maxs)")
  }
}
