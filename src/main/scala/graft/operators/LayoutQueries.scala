package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side clustering primitives that make
  * 100 TB scans prunable. q_layout_zorder computes the Morton (Z-order)
  * interleave key for two-dimensional clustering and PROVES the zone-map
  * property it buys: bucketing by z-prefix bounds BOTH dimensions at once,
  * so a min/max footer on either column prunes files for predicates on
  * either (the multi-dimensional generalization of the single-column
  * sort the pack store / compacted scan already exploit).
  *
  * The whole computation is scan → scalar projection → hash aggregate:
  * no global sort. Real writers range-partition by the z-key (a sampled
  * repartitionByRange — sampling is why the WRITE is not oracle-checked);
  * here the bucket id is the exact top-4-bits z-prefix, which is the same
  * spatial decomposition with deterministic boundaries, so the zone-map
  * census itself is exact and DuckDB-checkable.
  */
object LayoutQueries {

  /** Bits per dimension in the interleave (20-bit z-value). */
  private val DimBits = 10

  /** Normalized coordinate: v·2^bits DIV (max(v)+1) ∈ [0, 2^bits) for the
    * 0-based synthetic keys — rank-free scaling that adapts to the key
    * domain at any SF (Delta-style z-order maps columns to range ids
    * first; for uniform keys the value-scaled id IS the range id, with
    * zero extra passes). Spark's `div` / DuckDB's `//` are both EXACT
    * integer division — a double `/` + floor could disagree one-off near
    * exact multiples — and the coordinate must stay NON-NEGATIVE or the
    * bit interleave is meaningless (sign bits leak into every lane).
    */
  private def norm(v: String, maxV: String): Column =
    expr(s"CAST($v * ${1 << DimBits} AS BIGINT) div ($maxV + 1)")

  /** Morton interleave of two DimBits-wide longs: x in even bit lanes,
    * y in odd. Disjoint bits, so + stands in for | in both engines.
    */
  private def morton(x: Column, y: Column): Column =
    (0 until DimBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Attach the Morton z-key for two non-negative integral columns as a
    * `z` column — the write-side clustering key a caller hands to
    * repartitionByRange/sortWithinPartitions. Shared by q_layout_zorder
    * and the `zorderKey` facade verb. One broadcast domain scan; the key
    * itself is a codegen'd scalar projection.
    */
  private[graft] def withZKey(df: org.apache.spark.sql.DataFrame,
      xCol: String, yCol: String): org.apache.spark.sql.DataFrame = {
    val dom = df.agg(max(col(xCol)).as("__maxx"), max(col(yCol)).as("__maxy"))
    df.crossJoin(broadcast(dom))
      .withColumn("z", morton(norm(xCol, "__maxx"), norm(yCol, "__maxy")))
      .drop("__maxx", "__maxy")
  }

  val layoutZorder = QueryDef(
    "q_layout_zorder",
    (s, dir) => {
      withZKey(Tables.lineitem(s, dir).select("l_partkey", "l_suppkey"),
          "l_partkey", "l_suppkey")
        .groupBy(shiftright(col("z"), 2 * DimBits - 4).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        .orderBy("bucket")
    },
    oracle = Some {
      val x = "CAST(l_partkey * 1024 AS BIGINT) // (maxp + 1)"
      val y = "CAST(l_suppkey * 1024 AS BIGINT) // (maxs + 1)"
      val z = (0 until DimBits).map { i =>
        s"((((xn >> $i) & 1) << ${2 * i}) + (((yn >> $i) & 1) << ${2 * i + 1}))"
      }.mkString(" + ")
      s"""
      WITH dom AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem),
      nrm AS (SELECT l_partkey, l_suppkey, $x AS xn, $y AS yn FROM lineitem, dom),
      zv AS (SELECT l_partkey, l_suppkey, $z AS z FROM nrm)
      SELECT z >> ${2 * DimBits - 4} AS bucket, count(*) AS n,
             min(l_partkey) AS p_min, max(l_partkey) AS p_max,
             min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
      FROM zv GROUP BY 1 ORDER BY bucket
      """.trim
    },
  )

  def defs: Seq[QueryDef] = Seq(layoutZorder)
}
