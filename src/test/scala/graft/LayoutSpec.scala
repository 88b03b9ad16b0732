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

  test("hilbert fold is the exact curve: exhaustive 32x32 permutation + adjacency") {
    import spark.implicits._
    val bits = 5
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val rows = grid
      .withColumn("d", expr(LayoutQueries.hilbertSparkSql("x", "y", bits)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the registered row runs the native codegen'd loop — pin it to the
    // portable HOF fold over the full grid before checking the curve
    val native = grid
      .withColumn("d", call_function(
        graft.functions.GraftFunctions.HilbertIndexName, col("x"), col("y"), lit(bits)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    native.sortBy(t => (t._1, t._2)) shouldBe rows.sortBy(t => (t._1, t._2))
    // a space-filling curve visits every cell exactly once
    rows.map(_._3).sorted shouldBe (0L until (n.toLong * n)).toArray
    // Hilbert's defining property (what Morton order does NOT have):
    // consecutive curve positions are ADJACENT grid cells
    val pos = rows.map { case (x, y, d) => d -> (x, y) }.toMap
    (0L until n.toLong * n - 1).foreach { d =>
      val ((x0, y0), (x1, y1)) = (pos(d), pos(d + 1))
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"curve jump at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("hilbert buckets bound both dimensions; locality no worse than z-order") {
    val hRows = LayoutQueries.layoutHilbert.query(spark, sfTiny).collect()
    hRows should not be empty
    hRows.map(_.getLong(1)).sum shouldBe Tables.lineitem(spark, sfTiny).count()
    // comparable zone maps: same bucket grain (top-4 key bits), so sum of
    // per-bucket bounding-box areas measures how tightly each curve's
    // prefix ranges cluster the 2-D domain — Hilbert's adjacency means no
    // quadrant-boundary jumps inflate a bucket's box
    def volume(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => (r.getLong(3) - r.getLong(2) + 1) * (r.getLong(5) - r.getLong(4) + 1)).sum
    val zRows = LayoutQueries.layoutZorder.query(spark, sfTiny).collect()
    val (hv, zv) = (volume(hRows), volume(zRows))
    info(s"total zone volume: hilbert $hv vs zorder $zv (${hRows.length}/${zRows.length} buckets)")
    assert(hv <= zv, s"hilbert zone volume $hv worse than z-order $zv")
  }
}
