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

  // -----------------------------------------------------------------------
  // Hilbert curve — the other write-side clustering key (q_layout_hilbert).
  // -----------------------------------------------------------------------

  /** Spark-SQL fragment computing the Hilbert index d of non-negative
    * integer expressions ($x, $y), each < 2^bits — the classic iterative
    * xy2d transform (quadrant extraction + rotate/reflect per bit level,
    * the public-domain formulation on the Hilbert-curve Wikipedia page),
    * expressed as ONE `aggregate` fold over the bit levels with a
    * (x, y, d) struct state. A runtime fold, not an unrolled expression:
    * the lambda is evaluated bits times per row, so the expression tree
    * stays constant-size (an unrolled 10-level CASE chain would
    * exponentially duplicate subtrees under project collapse). Pure
    * integer arithmetic — codegen-safe, shuffle-free, and exactly
    * reproducible in any engine with a list fold.
    *
    * The quadrant index (3·rx XOR ry) and the conditional reflect are
    * de-branched to arithmetic both engines share: q = 3rx + ry − 2rx·ry,
    * reflect(v) = rx·(2^bits−1) + v·(1−2rx).
    */
  private[graft] def hilbertSparkSql(x: String, y: String, bits: Int): String = {
    val maxC = (1L << bits) - 1
    s"""aggregate(
       |  sequence(${bits - 1}, 0, -1),
       |  named_struct('x', CAST(($x) AS BIGINT), 'y', CAST(($y) AS BIGINT), 'd', CAST(0 AS BIGINT)),
       |  (st, b) -> named_struct(
       |    'x', CASE WHEN (shiftright(st.y, b) & 1) = 1 THEN st.x
       |         ELSE (shiftright(st.x, b) & 1) * $maxC + st.y * (1 - 2 * (shiftright(st.x, b) & 1)) END,
       |    'y', CASE WHEN (shiftright(st.y, b) & 1) = 1 THEN st.y
       |         ELSE (shiftright(st.x, b) & 1) * $maxC + st.x * (1 - 2 * (shiftright(st.x, b) & 1)) END,
       |    'd', st.d + shiftleft(CAST(1 AS BIGINT), 2 * b) *
       |         (3 * (shiftright(st.x, b) & 1) + (shiftright(st.y, b) & 1)
       |          - 2 * (shiftright(st.x, b) & 1) * (shiftright(st.y, b) & 1))),
       |  st -> st.d)""".stripMargin
  }

  /** DuckDB twin of [[hilbertSparkSql]] — the same fold via list_reduce.
    * DuckDB's two-argument list_reduce state must match the element type
    * (BIGINT), so the (x, y, d) state packs into one BIGINT:
    * st = d·2^(2·bits) + x·2^bits + y (total 4·bits ≤ 40 bits — no
    * overflow anywhere near int64). Same de-branched arithmetic, so the
    * two folds cannot drift.
    */
  private[graft] def hilbertDuckSql(x: String, y: String, bits: Int): String = {
    val p = 1L << bits
    val maxC = p - 1
    val levels = ((bits - 1) to 0 by -1).mkString("[", ", ", "]")
    // unpack helpers as textual substitution (constant-size tree)
    val ux = s"((st // $p) % $p)"
    val uy = s"(st % $p)"
    val ud = s"(st // ${p * p})"
    val rx = s"(($ux >> b) & 1)"
    val ry = s"(($uy >> b) & 1)"
    val xn = s"CASE WHEN $ry = 1 THEN $ux ELSE $rx * $maxC + $uy * (1 - 2 * $rx) END"
    val yn = s"CASE WHEN $ry = 1 THEN $uy ELSE $rx * $maxC + $ux * (1 - 2 * $rx) END"
    val dn = s"($ud + (CAST(1 AS BIGINT) << (2 * CAST(b AS INTEGER))) * (3 * $rx + $ry - 2 * $rx * $ry))"
    s"""(list_reduce(
       |  list_prepend(CAST(($x) AS BIGINT) * $p + CAST(($y) AS BIGINT),
       |    list_transform($levels, b -> CAST(b AS BIGINT))),
       |  (st, b) -> ($dn * ${p * p} + ($xn) * $p + ($yn))) // ${p * p})""".stripMargin
  }

  /** Attach the Hilbert clustering key for two non-negative integral
    * columns as an `h` column — same normalization and write-side contract
    * as [[withZKey]], but on the Hilbert curve: unlike Morton order, every
    * consecutive pair of curve positions is an ADJACENT grid cell (no
    * quadrant jumps), so equal-count key ranges cut tighter bounding boxes
    * — the curve behind Delta-style liquid clustering. LayoutSpec proves
    * the adjacency property exhaustively and measures the locality win
    * over z-order on the fixture.
    */
  private[graft] def withHKey(df: org.apache.spark.sql.DataFrame,
      xCol: String, yCol: String): org.apache.spark.sql.DataFrame = {
    val dom = df.agg(max(col(xCol)).as("__maxx"), max(col(yCol)).as("__maxy"))
    df.crossJoin(broadcast(dom))
      .withColumn("__xn", norm(xCol, "__maxx"))
      .withColumn("__yn", norm(yCol, "__maxy"))
      // the native codegen'd xy2d loop (graft.functions.HilbertIndex) —
      // the interpreted `aggregate`-fold twin ([[hilbertSparkSql]], spec-
      // pinned equal) measured 6.5 s/census at sf0.1 vs ~0.1 s native
      .withColumn("h", call_function(graft.functions.GraftFunctions.HilbertIndexName,
        col("__xn"), col("__yn"), lit(DimBits)))
      .drop("__maxx", "__maxy", "__xn", "__yn")
  }

  /** The Hilbert-key zone-map census — q_layout_zorder's exact output
    * shape (top-4-bit key-prefix buckets, per-bucket count + min/max of
    * both dimensions) on the Hilbert key, so the two curves' zone maps
    * are directly comparable row-for-row and the spec can pin the
    * locality claim (Hilbert's bucket bounding boxes are never worse in
    * total area). Same scale shape: scan → scalar fold projection → hash
    * aggregate; no sort, no extra pass.
    */
  val layoutHilbert = QueryDef(
    "q_layout_hilbert",
    (s, dir) => {
      withHKey(Tables.lineitem(s, dir).select("l_partkey", "l_suppkey"),
          "l_partkey", "l_suppkey")
        .groupBy(shiftright(col("h"), 2 * DimBits - 4).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
          min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        .orderBy("bucket")
    },
    oracle = Some {
      val x = "CAST(l_partkey * 1024 AS BIGINT) // (maxp + 1)"
      val y = "CAST(l_suppkey * 1024 AS BIGINT) // (maxs + 1)"
      s"""
      WITH dom AS (SELECT max(l_partkey) AS maxp, max(l_suppkey) AS maxs FROM lineitem),
      hv AS (SELECT l_partkey, l_suppkey,
                    ${hilbertDuckSql(x, y, DimBits)} AS h
             FROM lineitem, dom)
      SELECT h >> ${2 * DimBits - 4} AS bucket, count(*) AS n,
             min(l_partkey) AS p_min, max(l_partkey) AS p_max,
             min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
      FROM hv GROUP BY 1 ORDER BY bucket
      """.trim
    },
  )

  def defs: Seq[QueryDef] = Seq(layoutZorder, layoutHilbert)
}
