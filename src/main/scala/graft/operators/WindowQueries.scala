package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group F — window functions (SURVEY.md §2.B Group F).
  *
  * Scale design: each query is exactly one shuffle on the partition key +
  * an in-partition sort (WindowExec). Partition keys (custkey, user_id) are
  * high-cardinality so partitions stay small at 100 TB; no window here is
  * unpartitioned (a global ORDER BY window would serialize on one task).
  */
object WindowQueries {
  private val D = DecimalType(12, 4)

  /** Ranking trio. Window order includes the unique orderkey so ranks are
    * total and engine-independent.
    */
  val winRank = QueryDef(
    "q_win_rank",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey
    """.trim),
  )

  /** Analytic offsets lag/lead over per-user event time. */
  val winLagLead = QueryDef(
    "q_win_laglead",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id, value,
             LAG(value, 1) OVER w AS prev_value,
             LEAD(value, 1) OVER w AS next_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY user_id, event_id
    """.trim),
  )

  /** Frame aggregates: running (rows) sum of exact-decimal order totals per
    * customer, plus a range frame over the last hour of per-user event time
    * (frame bound on exact epoch micros — both engines see identical longs).
    */
  val winFrame = QueryDef(
    "q_win_frame",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          col("value").cast(DecimalType(9, 2)).as("v"),
          expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      val running = Window.partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastHour = Window.partitionBy("user_id").orderBy(asc("ts_us"))
        .rangeBetween(-3600L * 1000000L, 0L)
      e.select(col("user_id"), col("event_id"), col("ts_us"),
          sum("v").over(running).cast(DecimalType(38, 2)).cast(DoubleType).as("running_sum"),
          sum("v").over(lastHour).cast(DecimalType(38, 2)).cast(DoubleType).as("hour_sum"))
        .orderBy("user_id", "event_id")
    },
    Some("""
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS running_sum,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS hour_sum
      FROM events
      ORDER BY user_id, event_id
    """.trim),
  )

  /** Top-k per group via row_number ≤ 3 — the distributed top-k idiom (no
    * global sort; per-partition heap-ish WindowGroupLimit in Spark 4).
    */
  val winTopk = QueryDef(
    "q_win_topk",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },
    Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(winRank, winLagLead, winFrame, winTopk)
}
