package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group E — aggregation operators (SURVEY.md §2.B Group E).
  *
  * Scale design: every query is a shuffle-based hash aggregate with
  * map-side partial aggregation (Spark HashAggregateExec partial+final) —
  * no driver-side computation; group cardinality is tiny relative to input
  * so the final shuffle moves only partial aggregation states.
  *
  * Determinism (SURVEY.md §7.5): measure doubles are cast to DECIMAL(12,4)
  * *before* aggregation. With 12-digit inputs the 2- and 3-factor products
  * stay within 38 digits in BOTH engines (Spark (25,8)/(38,12); DuckDB
  * (24,8)/(36,12)) so no engine ever rounds or truncates an intermediate.
  * Output decimals are widened (never narrowed — DuckDB truncates on
  * scale-down while Spark rounds half-up) to an explicit matching
  * precision/scale. DOUBLE outputs only ever come from an exact decimal
  * whose unscaled value fits in 2^53, so the conversion is exact on both
  * sides.
  */
object AggQueries {
  private val D = DecimalType(12, 4)

  /** TPC-H Q1 shape over lineitem. */
  val aggGroupBy = QueryDef(
    "q_agg_groupby",
    (s, dir) => {
      val one = lit(BigDecimal(1)).cast(D)
      val l = Tables.lineitem(s, dir).select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(D).as("qty"),
        col("l_extendedprice").cast(D).as("price"),
        col("l_discount").cast(D).as("disc"),
        col("l_tax").cast(D).as("tax"))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").cast(DecimalType(38, 4)).as("sum_qty"),
          sum("price").cast(DecimalType(38, 4)).as("sum_base_price"),
          sum(col("price") * (one - col("disc"))).cast(DecimalType(38, 8)).as("sum_disc_price"),
          sum(col("price") * (one - col("disc")) * (one + col("tax"))).cast(DecimalType(38, 12)).as("sum_charge"),
          (sum("qty").cast(DecimalType(38, 4)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum("price").cast(DecimalType(38, 4)).cast(DoubleType) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,8)) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))) AS DECIMAL(38,12)) AS sum_charge,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(aggGroupBy)
}
