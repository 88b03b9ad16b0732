package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 time-series additions: exponentially-weighted moving average
  * and rolling z-score anomaly detection — the smoothing/outlier pair
  * every metrics pipeline runs per entity over an event stream.
  *
  * Scale design: both are single-window queries — one shuffle on
  * user_id, one frame pass per partition, no self-join, no collect. The
  * EWMA horizon is a fixed 20 rows, so frame state is O(1) per row at
  * any corpus size. Cross-engine float determinism follows the
  * AggQueries playbook: the z-score derives mean/stddev from EXACT
  * decimal frame sums (never a streaming variance), and the EWMA decay
  * is 0.5 — a power of two, so every weight and weighted term is an
  * exact binary scaling — with both engines folding terms in the same
  * most-recent-first order before the 6dp round.
  */
object TimeSeriesQueries {

  /** Per-user EWMA (decay 0.5, pandas adjust=true normalization) over a
    * trailing 20-event horizon, ordered by event time. The finite
    * horizon is what makes the operator scale-exact: weights below
    * 0.5^19 are beneath double noise anyway, and the frame never grows
    * with history length.
    */
  val tsEwma = QueryDef(
    "q_ts_ewma",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(-19, 0)
      Tables.events(s, dir)
        .withColumn("l", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"),
          round(
            expr("aggregate(transform(reverse(l), (x, i) -> x * power(0.5D, i)), 0D, (a, x) -> a + x)") /
              expr("aggregate(transform(reverse(l), (x, i) -> power(0.5D, i)), 0D, (a, x) -> a + x)"),
            6).as("ewma"))
        .orderBy("event_id")
    },
    Some("""
      WITH t AS (
        SELECT event_id, user_id,
               array_agg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
        FROM events)
      SELECT event_id, user_id,
             ROUND(list_sum(list_transform(range(len(l)), i -> l[len(l)-i] * power(0.5, i))) /
                   list_sum(list_transform(range(len(l)), i -> power(0.5, i))), 6) AS ewma
      FROM t
      ORDER BY event_id
    """.trim),
  )

  /** Rolling z-score anomaly detection: each event scored against the
    * mean/stddev of its user's PRECEDING 19..1 events (current row
    * excluded so an outlier can't mask itself), emitting only |z| > 2
    * with at least 5 history rows. Mean and stddev come from exact
    * decimal frame sums, so the filter boundary is bit-identical in
    * both engines.
    */
  val tsAnomaly = QueryDef(
    "q_ts_anomaly",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(-19, -1)
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          col("value").cast(DecimalType(9, 2)).as("v"))
        .withColumn("n", count(col("v")).over(w))
        .withColumn("sum_v", sum(col("v")).over(w).cast(DecimalType(38, 2)).cast(DoubleType))
        .withColumn("sum_v2", sum(col("v") * col("v")).over(w).cast(DecimalType(38, 4)).cast(DoubleType))
        .filter(col("n") >= 5)
        .withColumn("mu", col("sum_v") / col("n"))
        .withColumn("sd", sqrt((col("sum_v2") - col("sum_v") * col("sum_v") / col("n")) / (col("n") - 1)))
        .filter(col("sd") > 0)
        .withColumn("z", round((col("value") - col("mu")) / col("sd"), 6))
        .filter(abs(col("z")) > 2)
        .select("event_id", "user_id", "value", "z")
        .orderBy("event_id")
    },
    Some("""
      WITH t AS (
        SELECT event_id, user_id, value,
               COUNT(v) OVER w AS n,
               CAST(CAST(SUM(v) OVER w AS DECIMAL(38,2)) AS DOUBLE) AS sum_v,
               CAST(CAST(SUM(v * v) OVER w AS DECIMAL(38,4)) AS DOUBLE) AS sum_v2
        FROM (SELECT *, CAST(value AS DECIMAL(9,2)) AS v FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)),
      scored AS (
        SELECT event_id, user_id, value,
               sqrt((sum_v2 - sum_v * sum_v / n) / (n - 1)) AS sd,
               sum_v / n AS mu
        FROM t WHERE n >= 5)
      SELECT event_id, user_id, value, ROUND((value - mu) / sd, 6) AS z
      FROM scored
      WHERE sd > 0 AND ABS(ROUND((value - mu) / sd, 6)) > 2
      ORDER BY event_id
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(tsEwma, tsAnomaly)
}
