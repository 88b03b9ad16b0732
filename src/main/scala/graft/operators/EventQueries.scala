package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group M (round 3) — event-stream analytics over the `events` fixture:
  * the product-analytics operators (sessionization, funnels, cohort
  * retention, interval-frame running aggregates) every event warehouse
  * runs daily.
  *
  * Scale design: everything is window functions partitioned on
  * high-cardinality keys (user_id) or hash aggregates — no self-joins over
  * the event table except the funnel's per-stage min-joins, which reduce
  * each side to one row per user BEFORE joining. Timestamps are compared
  * as epoch micros on both engines (determinism recipe rule 6).
  */
object EventQueries {

  private def eventsUs(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      expr("unix_micros(cast(ts as timestamp))").as("ts_us"))

  /** Batch sessionization via gap detection: a >30-minute silence starts a
    * new session (the lag/flag/cumsum idiom — the exact batch twin of the
    * streaming session_window in s_session, but with explicit session ids
    * and SQL-expressible for the oracle). One shuffle on user_id; both
    * window passes reuse the same (user_id, ts, id) sort.
    */
  val sessionize = QueryDef(
    "q_events_sessionize",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      eventsUs(s, dir)
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"), max("ts_us").as("end_us"))
        .orderBy("user_id", "session_id")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      f AS (SELECT user_id, event_id, ts_us,
              CASE WHEN lag(ts_us) OVER w IS NULL
                     OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      g AS (SELECT user_id, ts_us,
              CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM f)
      SELECT user_id, session_id, COUNT(*) AS n_events,
             MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      FROM g GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """.trim),
  )

  /** Ordered conversion funnel click → view → purchase: a user converts a
    * stage only with an event STRICTLY AFTER their previous stage's first
    * event. Each stage reduces to one row per user before the next join —
    * the joins are user-keyed and never touch the full event table twice.
    */
  val funnel = QueryDef(
    "q_events_funnel",
    (s, dir) => {
      val e = eventsUs(s, dir).select("user_id", "event_type", "ts_us")
      val c = e.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts_us").as("c_ts"))
      val v = e.filter(col("event_type") === "view")
        .join(c, "user_id").filter(col("ts_us") > col("c_ts"))
        .groupBy("user_id").agg(min("ts_us").as("v_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("ts_us") > col("v_ts"))
        .groupBy("user_id").agg(min("ts_us").as("p_ts"))
      c.agg(count(lit(1)).as("n_users")).select(lit("1_click").as("stage"), col("n_users"))
        .unionAll(v.agg(count(lit(1)).as("n_users")).select(lit("2_view_after_click").as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit("3_purchase_after_view").as("stage"), col("n_users")))
        .orderBy("stage")
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      c AS (SELECT user_id, MIN(ts_us) AS c_ts FROM e WHERE event_type = 'click' GROUP BY user_id),
      v AS (SELECT e.user_id, MIN(ts_us) AS v_ts FROM e JOIN c ON e.user_id = c.user_id
            WHERE event_type = 'view' AND ts_us > c_ts GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(ts_us) AS p_ts FROM e JOIN v ON e.user_id = v.user_id
            WHERE event_type = 'purchase' AND ts_us > v_ts GROUP BY e.user_id)
      SELECT stage, n_users FROM (
        SELECT '1_click' AS stage, COUNT(*) AS n_users FROM c
        UNION ALL SELECT '2_view_after_click', COUNT(*) FROM v
        UNION ALL SELECT '3_purchase_after_view', COUNT(*) FROM p)
      ORDER BY stage
    """.trim),
  )

  /** Cohort retention: cohort = the date of a user's first event;
    * n_users = distinct users active k days later, k ∈ [0, 7]. Two hash
    * aggregates and one user-keyed join — the (cohort × offset) output
    * grid is tiny at any corpus size.
    */
  val retention = QueryDef(
    "q_events_retention",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val cohort = e.groupBy("user_id").agg(min("d").as("cohort_d"))
      e.join(cohort, "user_id")
        .withColumn("k", datediff(col("d"), col("cohort_d")))
        .filter(col("k").between(0, 7))
        .groupBy("cohort_d", "k")
        .agg(countDistinct("user_id").as("n_users"))
        .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_date"),
          col("k").cast(IntegerType).as("day_offset"), col("n_users"))
        .orderBy("cohort_date", "day_offset")
    },
    Some("""
      WITH e AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      cohort AS (SELECT user_id, MIN(d) AS cohort_d FROM e GROUP BY user_id)
      SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_date,
             CAST(datediff('day', cohort_d, d) AS INTEGER) AS day_offset,
             COUNT(DISTINCT e.user_id) AS n_users
      FROM e JOIN cohort ON e.user_id = cohort.user_id
      WHERE datediff('day', cohort_d, d) BETWEEN 0 AND 7
      GROUP BY cohort_d, datediff('day', cohort_d, d)
      ORDER BY cohort_date, day_offset
    """.trim),
  )

  /** Value-based RANGE frame: per-type running 1-hour sum ordered by event
    * time — RANGE (not ROWS) so all events inside the trailing hour count
    * regardless of row ties; tie rows share a frame, making the sum
    * order-independent (deterministic without a unique sort key). Exact
    * decimal sums, double only on output.
    */
  val winRange = QueryDef(
    "q_win_range",
    (s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("ts_us")
        .rangeBetween(-3600000000L, 0L)
      eventsUs(s, dir)
        .withColumn("v", col("value").cast(DecimalType(12, 4)))
        .withColumn("hour_sum", sum("v").over(w).cast(DoubleType))
        .select("event_id", "event_type", "ts_us", "hour_sum")
        .orderBy("event_type", "ts_us", "event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                        CAST(value AS DECIMAL(12,4)) AS v FROM events)
      SELECT event_id, event_type, ts_us,
             CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY ts_us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
      FROM e
      ORDER BY event_type, ts_us, event_id
    """.trim),
  )

  /** Peak-concurrency via sweep line: each event opens a 10-minute
    * activity interval; per event type, the maximum number of
    * simultaneously open intervals and the earliest instant it is reached.
    * The classic ±1 delta / running-sum formulation: intervals never pair
    * up (no self-join, no pair blowup) — one explode to 2 delta rows, one
    * (type, t) pre-aggregate so equal-timestamp deltas collapse before the
    * window pass (making the running sum order-independent and hence
    * deterministic), one window cumsum per type. Linear at any scale;
    * state is one running int per partition.
    */
  val tsOverlap = QueryDef(
    "q_ts_overlap",
    (s, dir) => {
      val pts = eventsUs(s, dir)
        .select(col("event_type"), explode(array(
          struct(col("ts_us").as("t"), lit(1L).as("delta")),
          struct((col("ts_us") + 600000000L).as("t"), lit(-1L).as("delta")))).as("p"))
        .select(col("event_type"), col("p.t").as("t"), col("p.delta").as("delta"))
        .groupBy("event_type", "t").agg(sum("delta").as("d"))
      val w = Window.partitionBy("event_type").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val conc = pts.withColumn("conc", sum("d").over(w))
      val wType = Window.partitionBy("event_type")
      conc.withColumn("mx", max("conc").over(wType))
        .filter(col("conc") === col("mx"))
        .groupBy("event_type")
        .agg(max("mx").as("max_concurrent"), min("t").as("first_peak_us"))
        .orderBy("event_type")
    },
    Some("""
      WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      pts AS (
        SELECT event_type, ts_us AS t, 1 AS delta FROM e
        UNION ALL
        SELECT event_type, ts_us + 600000000, -1 FROM e),
      d AS (SELECT event_type, t, SUM(delta) AS d FROM pts GROUP BY event_type, t),
      c AS (SELECT event_type, t,
              SUM(d) OVER (PARTITION BY event_type ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
            FROM d),
      m AS (SELECT event_type, t, conc, MAX(conc) OVER (PARTITION BY event_type) AS mx FROM c)
      SELECT event_type, CAST(MAX(mx) AS BIGINT) AS max_concurrent, MIN(t) AS first_peak_us
      FROM m WHERE conc = mx
      GROUP BY event_type
      ORDER BY event_type
    """.trim),
  )

  /** Longest run of consecutive active days per user — the other classic
    * gaps-and-islands shape (q_events_sessionize is gap-SPLITTING; this is
    * island-MEASURING): distinct active day indexes per user, island id =
    * day − dense row_number (constant exactly while days are consecutive),
    * then the longest island per user, earliest start breaking ties. Two
    * window passes over the same (user_id, day) sort plus one aggregate —
    * shuffles only the skinny distinct (user, day) rows at any scale.
    */
  val winStreak = QueryDef(
    "q_win_streak",
    (s, dir) => {
      val days = eventsUs(s, dir)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val islands = days
        .withColumn("island", col("day") - row_number().over(w))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
      islands.groupBy("user_id")
        .agg(max(struct(col("len"), (-col("start_day")).as("neg_start"))).as("best"))
        .select(col("user_id"), col("best.len").as("longest_streak"),
          (-col("best.neg_start")).as("streak_start_day"))
        .orderBy("user_id")
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      isl AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
        FROM days),
      runs AS (
        SELECT user_id, island, COUNT(*) AS len, MIN(day) AS start_day
        FROM isl GROUP BY user_id, island)
      SELECT user_id,
             CAST(MAX(len) AS BIGINT) AS longest_streak,
             CAST(MIN(start_day) FILTER (WHERE len = best) AS BIGINT) AS streak_start_day
      FROM (SELECT user_id, island, len, start_day,
                   MAX(len) OVER (PARTITION BY user_id) AS best
            FROM runs)
      GROUP BY user_id
      ORDER BY user_id
    """.trim),
  )

  /** Sessionization over the user-bucketed events layout — join-free but
    * the same lever as the bucketed joins: the scan arrives already
    * hash-distributed on user_id and sorted (user_id, ts_us, event_id),
    * which satisfies BOTH window passes' required distribution+ordering
    * AND the per-(user, session) aggregate's clustering, so the whole
    * pipeline up to the output sort runs with zero exchange and zero sort
    * (plan-asserted). Same rows as q_events_sessionize — the shared
    * oracle checks that. At 100 TB this turns the event-analytics
    * family's per-query shuffle of the full event table into a one-time
    * ingest layout cost.
    */
  val sessionizeBucketed = QueryDef(
    "q_events_sessionize_bucketed",
    (s, dir) => sessionizeBucketedStage(s, dir).orderBy("user_id", "session_id"),
    sessionize.oracle,
  )

  /** Stage without the output sort (its range exchange would pollute the
    * plan assertion), mirroring the other bucketed stage functions.
    */
  private[graft] def sessionizeBucketedStage(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    graft.sources.BucketedTables.ensureEvents(s, dir)
    sessionizeOn(s.table(graft.sources.BucketedTables.eventsTable(dir)))
  }

  /** Sessionize logic over any (user_id, ts_us, event_id, ...) events
    * relation — shared by the bucketed stage and the skew spec (which
    * feeds it a synthetic hot-user layout).
    */
  private[graft] def sessionizeOn(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_ts", lag("ts_us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"), max("ts_us").as("end_us"))
  }

  /** Funnel over the user-bucketed layout: every stage aggregate
    * (groupBy user_id) and every stage join (on user_id) is satisfied by
    * the scan's hash(user_id) bucketing, so the ONLY exchanges left are
    * the three single-row global counts (Exchange SinglePartition over
    * one row per partition — free at any scale). Plan-asserted: no
    * hash-partitioning exchange anywhere. Same rows as q_events_funnel —
    * the shared oracle checks that.
    */
  val funnelBucketed = QueryDef(
    "q_events_funnel_bucketed",
    (s, dir) => funnelBucketedStage(s, dir).orderBy("stage"),
    funnel.oracle,
  )

  private[graft] def funnelBucketedStage(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    graft.sources.BucketedTables.ensureEvents(s, dir)
    funnelOn(s.table(graft.sources.BucketedTables.eventsTable(dir)))
  }

  private[graft] def funnelOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val e = events.select("user_id", "event_type", "ts_us")
    val c = e.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("ts_us").as("c_ts"))
    val v = e.filter(col("event_type") === "view")
      .join(c, "user_id").filter(col("ts_us") > col("c_ts"))
      .groupBy("user_id").agg(min("ts_us").as("v_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .join(v, "user_id").filter(col("ts_us") > col("v_ts"))
      .groupBy("user_id").agg(min("ts_us").as("p_ts"))
    c.agg(count(lit(1)).as("n_users")).select(lit("1_click").as("stage"), col("n_users"))
      .unionAll(v.agg(count(lit(1)).as("n_users")).select(lit("2_view_after_click").as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit("3_purchase_after_view").as("stage"), col("n_users")))
  }

  /** Streaks over the user-bucketed layout: distinct (user, day), both
    * window passes, and the per-(user, island) aggregate all cluster on
    * user_id, which the bucketed scan already provides — zero
    * hash-partitioning exchange (the windows still sort locally: `day`
    * is derived from ts_us, so the scan's (user_id, ts_us) order can't
    * be proven to cover it). Same rows as q_win_streak.
    */
  val winStreakBucketed = QueryDef(
    "q_win_streak_bucketed",
    (s, dir) => streakBucketedStage(s, dir).orderBy("user_id"),
    winStreak.oracle,
  )

  private[graft] def streakBucketedStage(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    graft.sources.BucketedTables.ensureEvents(s, dir)
    streaksOn(s.table(graft.sources.BucketedTables.eventsTable(dir)))
  }

  private[graft] def streaksOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val days = events
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val islands = days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"), min("day").as("start_day"))
    islands.groupBy("user_id")
      .agg(max(struct(col("len"), (-col("start_day")).as("neg_start"))).as("best"))
      .select(col("user_id"), col("best.len").as("longest_streak"),
        (-col("best.neg_start")).as("streak_start_day"))
  }

  /** Retention over the user-bucketed layout. Everything user-keyed —
    * the distinct (user, day), the per-user cohort min, the user join —
    * rides the bucketed distribution with zero exchange. The final
    * cohort-grid aggregate is the ONE hash exchange left, and it moves
    * only the post-join skinny (cohort_day, k, user_id) rows the 0–7 day
    * filter already pruned (≤ 8 rows per user at any corpus size):
    * count(*) per grid cell equals countDistinct(user) because the
    * per-user distinct upstream guarantees one row per (user, k).
    * Plan-asserted: exactly one hashpartitioning exchange. Same rows as
    * q_events_retention via the shared oracle.
    */
  val retentionBucketed = QueryDef(
    "q_events_retention_bucketed",
    (s, dir) => retentionBucketedStage(s, dir).orderBy("cohort_date", "day_offset"),
    retention.oracle,
  )

  private[graft] def retentionBucketedStage(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    graft.sources.BucketedTables.ensureEvents(s, dir)
    retentionOn(s.table(graft.sources.BucketedTables.eventsTable(dir)))
  }

  private[graft] def retentionOn(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val days = events
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohort, "user_id")
      .withColumn("k", (col("day") - col("cohort_day")).cast(IntegerType))
      .filter(col("k").between(0, 7))
      .groupBy("cohort_day", "k")
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_format(date_from_unix_date(col("cohort_day").cast(IntegerType)), "yyyy-MM-dd")
          .as("cohort_date"),
        col("k").as("day_offset"), col("n_users"))
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent click within a 24h lookback — the marketing-attribution
    * primitive. One window pass (last non-null carried forward, current
    * row excluded so a purchase can't self-attribute), no join: the
    * event table never meets itself, which is the property that matters
    * when both sides are billions of rows. Same single-shuffle
    * (user_id) + one-sort shape as sessionize.
    */
  val attribution = QueryDef(
    "q_events_attribution",
    (s, dir) => {
      val horizonUs = 86400000000L // 24h
      val w = Window.partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      eventsUs(s, dir)
        .withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts_us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          when(col("click_ts").isNotNull && col("ts_us") - col("click_ts") <= horizonUs,
            col("click_id")).as("attributed_click"),
          when(col("click_ts").isNotNull && col("ts_us") - col("click_ts") <= horizonUs,
            col("ts_us") - col("click_ts")).as("gap_us"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        FROM events),
      t AS (
        SELECT event_id, user_id, event_type, ts_us,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER w AS click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
                 OVER w AS click_ts
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT event_id, user_id,
             CASE WHEN click_ts IS NOT NULL AND ts_us - click_ts <= 86400000000 THEN click_id END AS attributed_click,
             CASE WHEN click_ts IS NOT NULL AND ts_us - click_ts <= 86400000000 THEN ts_us - click_ts END AS gap_us
      FROM t
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """.trim),
  )

  /** Session path analysis — the navigation-pattern mining step after
    * sessionization: top-10 three-step event-type paths (trigrams of
    * consecutive events inside a 30-min-gap session, the
    * q_events_sessionize rule verbatim). One user shuffle builds
    * sessions, two leads per row build the trigram, one path aggregate
    * + bounded top-k — nothing corpus-quadratic; at 100 TB the
    * user-bucketed layout removes the only exchange (the _bucketed
    * precedent). Global top-10 orders the bounded (≤ |event_types|³)
    * path relation.
    */
  val eventsPath = QueryDef(
    "q_events_path",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = eventsUs(s, dir)
        .withColumn("prev_ts", lag("ts_us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_sess").over(run))
      val ws = Window.partitionBy("user_id", "session_id").orderBy("ts_us", "event_id")
      val paths = sess
        .withColumn("t2", lead("event_type", 1).over(ws))
        .withColumn("t3", lead("event_type", 2).over(ws))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
      val wTop = Window.orderBy(desc("n"), asc("path"))
      paths.withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 10)
        .select("rank", "path", "n")
        .orderBy("rank")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      f AS (SELECT user_id, event_id, event_type, ts_us,
              CASE WHEN lag(ts_us) OVER w IS NULL
                     OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      g AS (SELECT user_id, event_id, event_type, ts_us,
              CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM f),
      tri AS (
        SELECT event_type || '>' || lead(event_type, 1) OVER ws || '>' || lead(event_type, 2) OVER ws AS path,
               lead(event_type, 2) OVER ws AS t3
        FROM g WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts_us, event_id)),
      counts AS (SELECT path, COUNT(*) AS n FROM tri WHERE t3 IS NOT NULL GROUP BY path)
      SELECT rank, path, n FROM (
        SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS rank FROM counts)
      WHERE rank <= 10
      ORDER BY rank
    """.trim),
  )

  /** First-order Markov transition matrix over the event stream — the
    * behavioral model behind next-action prediction and funnel-anomaly
    * detection (a transition whose live probability drifts from this
    * baseline is the alert): per (from, to) event-type pair, the count
    * of consecutive-within-user occurrences and the row-normalized
    * probability P(to | from). ONE user-keyed window pass for the lead
    * pairing (the q_events_sessionize sort reused), one hash aggregate
    * on the tiny (from, to) key space, probabilities via a broadcast
    * per-from total — linear in events, and the transition matrix is
    * #types² rows regardless of corpus size. Probability is exact
    * integer-ratio rounded 6dp, so fully oracle-checked.
    */
  val eventsMarkov = QueryDef(
    "q_events_markov",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val pairs = eventsUs(s, dir)
        .withColumn("to_type", lead("event_type", 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("from_type").agg(sum("n").as("from_total"))
      pairs.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast(DoubleType) / col("from_total"), 6).as("p"))
        .orderBy("from_type", "to_type")
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      pairs AS (
        SELECT event_type AS from_type, lead(event_type, 1) OVER w AS to_type
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      counts AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      totals AS (SELECT from_type, SUM(n) AS from_total FROM counts GROUP BY from_type)
      SELECT c.from_type, c.to_type, c.n,
             ROUND(CAST(c.n AS DOUBLE) / t.from_total, 6) AS p
      FROM counts c JOIN totals t ON c.from_type = t.from_type
      ORDER BY c.from_type, c.to_type
    """.trim),
  )

  /** Two-proportion A/B test over a deterministic user split: arm =
    * user_id parity (the hash-bucket assignment an experimentation system
    * uses — reproducible, balanced), conversion = the user purchased
    * within their first 10 events (early-activation; the bare "ever
    * purchased" is 100% on this fixture, which makes the pooled variance
    * 0 and the statistic undefined). Output: one row per arm (users, conversions, rate)
    * plus the pooled two-proportion z statistic on both rows (analysts
    * read it off either arm). Everything reduces to exact integer counts;
    * rate, pooled rate, and z are IEEE-deterministic (divisions and ONE
    * sqrt — sqrt is correctly rounded by IEEE 754, not a libm freedom, so
    * no rounding is needed cross-engine). One aggregate over users, one
    * 2-row cross join: corpus-size-independent after the per-user
    * reduction.
    */
  val eventsAbTest = QueryDef(
    "q_events_ab_test",
    (s, dir) => {
      val byTime = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      val users = Tables.events(s, dir)
        .withColumn("rn", row_number().over(byTime))
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase" && col("rn") <= 10, 1L)
          .otherwise(0L)).as("converted"))
        .withColumn("arm", (col("user_id") % 2).cast(IntegerType))
      val arms = users.groupBy("arm")
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n_users").as("n0"), col("n_conv").as("c0"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n_users").as("n1"), col("n_conv").as("c1"))
      val z = a.crossJoin(b).select(
        (col("c0").cast(DoubleType) / col("n0")).as("p0"),
        (col("c1").cast(DoubleType) / col("n1")).as("p1"),
        ((col("c0") + col("c1")).cast(DoubleType) / (col("n0") + col("n1"))).as("pp"),
        col("n0"), col("c0"), col("n1"), col("c1"))
        .select(col("n0"), col("c0"), col("p0"), col("n1"), col("c1"), col("p1"),
          ((col("p0") - col("p1")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1")))).as("z"))
      arms.crossJoin(broadcast(z.select("z")))
        .select(col("arm"), col("n_users"), col("n_conv"),
          (col("n_conv").cast(DoubleType) / col("n_users")).as("rate"), col("z"))
        .orderBy("arm")
    },
    Some("""
      WITH e AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
      users AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND rn <= 10 THEN 1 ELSE 0 END) AS converted,
               CAST(user_id % 2 AS INTEGER) AS arm
        FROM e GROUP BY user_id),
      arms AS (SELECT arm, count(*) AS n_users, CAST(sum(converted) AS BIGINT) AS n_conv
               FROM users GROUP BY arm),
      ab AS (SELECT
               (SELECT n_users FROM arms WHERE arm = 0) AS n0,
               (SELECT n_conv  FROM arms WHERE arm = 0) AS c0,
               (SELECT n_users FROM arms WHERE arm = 1) AS n1,
               (SELECT n_conv  FROM arms WHERE arm = 1) AS c1),
      zs AS (SELECT
               (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) /
               sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)) AS z
             FROM ab)
      SELECT arm, n_users, n_conv, CAST(n_conv AS DOUBLE) / n_users AS rate, z
      FROM arms, zs
      ORDER BY arm
    """.trim),
  )

  // ------------------------------------------------------------- seqmine

  /** GSP/apriori-style frequent-SUBSEQUENCE mining core over a
    * (user_id, day, sym, ts_us) occurrence frame: length-2 patterns
    * a>b = "some a occurs strictly before some b within a session",
    * length-3 candidates generated apriori-style from frequent pairs
    * ((a,b) ∧ (b,c) frequent ⇒ try a>b>c) and verified exactly.
    *
    * The scale move (and what makes this correct at 100 TB): support
    * tests never touch event pairs. A session supports a>b iff
    * first(a) < last(b), so the whole pair stage runs on the
    * (session, symbol) FIRST/LAST grain — bounded by the alphabet (≤6
    * symbols here), NOT by session length; a million-event mega-session
    * contributes the same ≤6 rows as a 10-event one. The triple verify
    * needs one existential — some b occurrence inside (first(a),
    * last(c)) — which is a semi-join of RAW b occurrences against the
    * alphabet-bounded candidate windows: linear in occurrences, never
    * occurrences². Patterns use pairwise-distinct symbols (repeated-
    * symbol patterns collapse to first<last on the same grain row and
    * are excluded by construction, documented).
    */
  /** Shared session/pattern stages of the sequence-mining family: the
    * (session, symbol) first/last grain `g`, the minsup scalar, and the
    * frequent length-2 patterns — one (session, symbol) aggregate + one
    * alphabet-bounded grain self-join, reused verbatim by [[seqmineOn]]
    * and [[nextstepOn]] so the two operators share the priced shuffles
    * AND the support semantics by construction.
    */
  private def seqFreq2(occ: org.apache.spark.sql.DataFrame,
      minSupFloor: Int, supDivisor: Int): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val g = occ.groupBy("user_id", "day", "sym")
      .agg(min("ts_us").as("first_us"), max("ts_us").as("last_us"))
    val tot = occ.select("user_id", "day").distinct()
      .agg(greatest((count(lit(1)) / supDivisor).cast(LongType), lit(minSupFloor.toLong))
        .as("minsup"))
    val a = g.select(col("user_id"), col("day"), col("sym").as("sa"), col("first_us").as("fa"))
    val b = g.select(col("user_id").as("ub"), col("day").as("db"),
      col("sym").as("sb"), col("last_us").as("lb"))
    val pairSup = a.join(b, col("user_id") === col("ub") && col("day") === col("db")
        && col("sa") =!= col("sb") && col("fa") < col("lb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("support"))
    val freq2 = pairSup.join(broadcast(tot), col("support") >= col("minsup"))
      .select("sa", "sb", "support")
    (g, tot, freq2)
  }

  /** Sessions supporting each (sa, sb, sc) candidate triple: the a/c
    * first/last window join on the grain plus the one existential
    * semi-join of raw b occurrences — shared by the seqmine triple
    * verify and the nextstep distribution.
    */
  private def tripleSupportOf(occ: org.apache.spark.sql.DataFrame,
      g: org.apache.spark.sql.DataFrame,
      cand: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val a = g.select(col("user_id"), col("day"), col("sym").as("sa"), col("first_us").as("fa"))
    val cEnd = g.select(col("user_id").as("uc"), col("day").as("dc"),
      col("sym").as("sc"), col("last_us").as("lc"))
    val windows = a.join(cEnd, col("user_id") === col("uc") && col("day") === col("dc")
        && col("fa") < col("lc"))
      .join(broadcast(cand), Seq("sa", "sc"))
      .select("user_id", "day", "sa", "sb", "sc", "fa", "lc")
    val bOcc = occ.select(col("user_id").as("u2"), col("day").as("d2"),
      col("sym").as("s2"), col("ts_us").as("t2"))
    windows.join(bOcc,
        col("user_id") === col("u2") && col("day") === col("d2") && col("sb") === col("s2")
          && col("t2") > col("fa") && col("t2") < col("lc"), "left_semi")
      .groupBy("sa", "sb", "sc").agg(count(lit(1)).as("support"))
  }

  private[graft] def seqmineOn(occ: org.apache.spark.sql.DataFrame,
      minSupFloor: Int = 2, supDivisor: Int = 20): org.apache.spark.sql.DataFrame = {
    val (g, tot, freq2) = seqFreq2(occ, minSupFloor, supDivisor)
    val cand = freq2.select(col("sa"), col("sb"))
      .join(freq2.select(col("sa").as("sb"), col("sb").as("sc")), "sb")
      .filter(col("sa") =!= col("sc"))
      .select("sa", "sb", "sc")
    val tripleSup = tripleSupportOf(occ, g, cand)
    val freq3 = tripleSup.join(broadcast(tot), col("support") >= col("minsup"))
      .select("sa", "sb", "sc", "support")
    freq2.select(concat(col("sa"), lit(">"), col("sb")).as("pattern"),
        lit(2).as("len"), col("support"))
      .unionByName(freq3.select(
        concat(col("sa"), lit(">"), col("sb"), lit(">"), col("sc")).as("pattern"),
        lit(3).as("len"), col("support")))
      .orderBy(col("len"), desc("support"), col("pattern"))
  }

  /** Frequent event-type subsequences per (user, day) session. The
    * fixture's 5 uniform event types are degenerate for sequence mining
    * (every pattern is equally frequent — SURVEY round-9 note), so the
    * symbol alphabet is SYNTHESIZED skewed from event_id by pure integer
    * threshold compares (the q_fn_url / q_text_normalize
    * synthesize-then-process house pattern): a 6-symbol ~geometric
    * distribution (e5 ≈ 48% … e0 ≈ 5%), exact in both engines — no
    * floats, no log2 ULP hazards. Sessions are (user, WEEK): measured on
    * the fixture, day-grain sessions have median length 2 (no triple
    * ever survives minsup) and whole-user "sessions" saturate every
    * pattern at support ≈ #users; week-grain gives median length 13-14
    * with a 24-of-30 distinct pair-support spread and ~110 surviving
    * triples — the non-degenerate operating point at both sf0.001 and
    * sf0.01. minsup = max(#sessions/20, 2).
    */
  val eventsSeqmine = QueryDef(
    "q_events_seqmine",
    (s, dir) => {
      val v = col("event_id") % 64
      val sym = when(v >= 33, "e5").when(v >= 17, "e4").when(v >= 9, "e3")
        .when(v >= 5, "e2").when(v >= 3, "e1").otherwise("e0")
      seqmineOn(eventsUs(s, dir).select(col("user_id"),
        expr("ts_us div 604800000000").as("day"), sym.as("sym"), col("ts_us")))
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS day,
               CASE WHEN event_id % 64 >= 33 THEN 'e5' WHEN event_id % 64 >= 17 THEN 'e4'
                    WHEN event_id % 64 >= 9 THEN 'e3' WHEN event_id % 64 >= 5 THEN 'e2'
                    WHEN event_id % 64 >= 3 THEN 'e1' ELSE 'e0' END AS sym
        FROM events),
      g AS (SELECT user_id, day, sym, MIN(ts_us) AS first_us, MAX(ts_us) AS last_us
            FROM e GROUP BY 1, 2, 3),
      ns AS (SELECT GREATEST(COUNT(*) // 20, 2) AS minsup
             FROM (SELECT DISTINCT user_id, day FROM e)),
      p AS (SELECT a.sym AS sa, b.sym AS sb, COUNT(*) AS support
            FROM g a JOIN g b ON a.user_id = b.user_id AND a.day = b.day
              AND a.sym != b.sym AND a.first_us < b.last_us
            GROUP BY 1, 2),
      f2 AS (SELECT sa, sb, support FROM p CROSS JOIN ns WHERE support >= minsup),
      cand AS (SELECT x.sa, x.sb, y.sb AS sc FROM f2 x JOIN f2 y ON x.sb = y.sa
               WHERE x.sa != y.sb),
      w AS (SELECT a.user_id, a.day, cand.sa, cand.sb, cand.sc,
                   a.first_us AS fa, c.last_us AS lc
            FROM cand
            JOIN g a ON a.sym = cand.sa
            JOIN g c ON c.sym = cand.sc AND c.user_id = a.user_id AND c.day = a.day
            WHERE a.first_us < c.last_us),
      t3 AS (SELECT sa, sb, sc, COUNT(*) AS support
             FROM w WHERE EXISTS (SELECT 1 FROM e b
               WHERE b.user_id = w.user_id AND b.day = w.day AND b.sym = w.sb
                 AND b.ts_us > w.fa AND b.ts_us < w.lc)
             GROUP BY 1, 2, 3),
      f3 AS (SELECT sa, sb, sc, support FROM t3 CROSS JOIN ns WHERE support >= minsup)
      SELECT sa || '>' || sb AS pattern, 2 AS len, support FROM f2
      UNION ALL
      SELECT sa || '>' || sb || '>' || sc AS pattern, 3 AS len, support FROM f3
      ORDER BY len, support DESC, pattern
    """.trim),
  )

  /** Next-step distribution conditioned on a MINED pattern — the
    * recommendation twin of the single-symbol transition matrix
    * (q_events_markov) built on the seqmine grain (r10 verdict ask 6):
    * for every frequent length-2 pattern sa>sb and every OTHER alphabet
    * symbol sc, the session support of sa>sb>sc (the exact seqmine
    * subsequence semantics, shared code) over the pair's support —
    * p(next = sc | session exhibits sa>sb). Unlike seqmine's freq3, the
    * next candidates are NOT minsup-gated (a recommendation needs the
    * whole conditional distribution, tail included); unlike markov, the
    * condition is a mined multi-event pattern, not one event. Composes
    * [[seqFreq2]] + [[tripleSupportOf]] — the same (session, symbol)
    * grain aggregate and alphabet-bounded joins, no new shuffle shape.
    */
  private[graft] def nextstepOn(occ: org.apache.spark.sql.DataFrame,
      minSupFloor: Int = 2, supDivisor: Int = 20): org.apache.spark.sql.DataFrame = {
    val (g, _, freq2) = seqFreq2(occ, minSupFloor, supDivisor)
    val syms = g.select(col("sym").as("sc")).distinct()
    val cand = freq2.select(col("sa"), col("sb"))
      .crossJoin(broadcast(syms))
      .filter(col("sc") =!= col("sa") && col("sc") =!= col("sb"))
    tripleSupportOf(occ, g, cand)
      .join(freq2.select(col("sa"), col("sb"), col("support").as("pair_support")),
        Seq("sa", "sb"))
      .select(concat(col("sa"), lit(">"), col("sb")).as("pattern"),
        col("sc").as("next_sym"), col("support"), col("pair_support"),
        round(col("support").cast(DoubleType) / col("pair_support"), 6).as("p"))
      .orderBy("pattern", "next_sym")
  }

  val eventsNextstep = QueryDef(
    "q_events_nextstep",
    (s, dir) => {
      val v = col("event_id") % 64
      val sym = when(v >= 33, "e5").when(v >= 17, "e4").when(v >= 9, "e3")
        .when(v >= 5, "e2").when(v >= 3, "e1").otherwise("e0")
      nextstepOn(eventsUs(s, dir).select(col("user_id"),
        expr("ts_us div 604800000000").as("day"), sym.as("sym"), col("ts_us")))
    },
    Some("""
      WITH e AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS day,
               CASE WHEN event_id % 64 >= 33 THEN 'e5' WHEN event_id % 64 >= 17 THEN 'e4'
                    WHEN event_id % 64 >= 9 THEN 'e3' WHEN event_id % 64 >= 5 THEN 'e2'
                    WHEN event_id % 64 >= 3 THEN 'e1' ELSE 'e0' END AS sym
        FROM events),
      g AS (SELECT user_id, day, sym, MIN(ts_us) AS first_us, MAX(ts_us) AS last_us
            FROM e GROUP BY 1, 2, 3),
      ns AS (SELECT GREATEST(COUNT(*) // 20, 2) AS minsup
             FROM (SELECT DISTINCT user_id, day FROM e)),
      p AS (SELECT a.sym AS sa, b.sym AS sb, COUNT(*) AS support
            FROM g a JOIN g b ON a.user_id = b.user_id AND a.day = b.day
              AND a.sym != b.sym AND a.first_us < b.last_us
            GROUP BY 1, 2),
      f2 AS (SELECT sa, sb, support FROM p CROSS JOIN ns WHERE support >= minsup),
      syms AS (SELECT DISTINCT sym AS sc FROM g),
      cand AS (SELECT f2.sa, f2.sb, syms.sc FROM f2 CROSS JOIN syms
               WHERE syms.sc != f2.sa AND syms.sc != f2.sb),
      w AS (SELECT a.user_id, a.day, cand.sa, cand.sb, cand.sc,
                   a.first_us AS fa, c.last_us AS lc
            FROM cand
            JOIN g a ON a.sym = cand.sa
            JOIN g c ON c.sym = cand.sc AND c.user_id = a.user_id AND c.day = a.day
            WHERE a.first_us < c.last_us),
      t3 AS (SELECT sa, sb, sc, COUNT(*) AS support
             FROM w WHERE EXISTS (SELECT 1 FROM e b
               WHERE b.user_id = w.user_id AND b.day = w.day AND b.sym = w.sb
                 AND b.ts_us > w.fa AND b.ts_us < w.lc)
             GROUP BY 1, 2, 3)
      SELECT t3.sa || '>' || t3.sb AS pattern, t3.sc AS next_sym,
             t3.support AS support, f2.support AS pair_support,
             ROUND(CAST(t3.support AS DOUBLE) / f2.support, 6) AS p
      FROM t3 JOIN f2 ON f2.sa = t3.sa AND f2.sb = t3.sb
      ORDER BY pattern, next_sym
    """.trim),
  )

  /** RFM segmentation (recency-frequency-monetary — the classic customer
    * scoring every event warehouse ships): per user R = days since last
    * event (vs the corpus max — a fixed anchor, reproducible), F = event
    * count, M = Σ value cents (exact long). Scores 1–5 by exact rank
    * quintile: sort each metric worst-first with user_id tiebreak,
    * score = ⌊(rn−1)·5/n⌋ + 1 — pure integer arithmetic (NO NTILE: its
    * remainder-spreading is a cross-engine hazard; this formula is the
    * eqdepth bucket rule and reproduces bit-for-bit). The windows run on
    * the USER grain (one row per user, never events); at extreme user
    * counts the same scores come from the bucketed cumulative
    * (StatQueries.withCumBeforeBy) — the machinery exists and is benched.
    */
  /** The RFM scoring tail over an explicit per-user (user_id, last_us,
    * f, m) frame — shared by the registered query and
    * IncrementalRfm.serveRfm (the per-user triple is an associative
    * (max, count-sum, sum) merge, so state-served ≡ one-shot exactly).
    */
  private[graft] def rfmFromUsers(peru: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val anchor = peru.agg(max("last_us").as("now_us"), count(lit(1)).as("n"))
      val base = peru.crossJoin(broadcast(anchor))
        .withColumn("r_days", expr("(now_us - last_us) div 86400000000"))
      val scored = base
        .withColumn("rn_r", row_number().over(
          Window.orderBy(desc("r_days"), asc("user_id"))))
        .withColumn("rn_f", row_number().over(
          Window.orderBy(asc("f"), asc("user_id"))))
        .withColumn("rn_m", row_number().over(
          Window.orderBy(asc("m"), asc("user_id"))))
        // exact integer quintile: never float division near a bucket edge
        .withColumn("r_score", expr("cast((rn_r - 1) * 5 div n as int) + 1"))
        .withColumn("f_score", expr("cast((rn_f - 1) * 5 div n as int) + 1"))
        .withColumn("m_score", expr("cast((rn_m - 1) * 5 div n as int) + 1"))
      scored.select(col("user_id"), col("r_days"), col("f"), col("m"),
          col("r_score"), col("f_score"), col("m_score"),
          concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
        .orderBy("user_id")
  }

  val eventsRfm = QueryDef(
    "q_events_rfm",
    (s, dir) => rfmFromUsers(eventsUs(s, dir)
      .groupBy("user_id")
      .agg(max("ts_us").as("last_us"), count(lit(1)).as("f"),
        sum((col("value").cast(DecimalType(12, 2)) * 100).cast(LongType)).as("m"))),
    Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                 FROM events),
      peru AS (SELECT user_id, MAX(ts_us) AS last_us, COUNT(*) AS f,
                      CAST(SUM(cents) AS BIGINT) AS m
               FROM e GROUP BY user_id),
      anchor AS (SELECT MAX(last_us) AS now_us, COUNT(*) AS n FROM peru),
      base AS (SELECT user_id, (now_us - last_us) // 86400000000 AS r_days, f, m, n
               FROM peru, anchor),
      scored AS (SELECT user_id, r_days, f, m,
                   CAST((ROW_NUMBER() OVER (ORDER BY r_days DESC, user_id) - 1) * 5 // n AS INTEGER) + 1 AS r_score,
                   CAST((ROW_NUMBER() OVER (ORDER BY f ASC, user_id) - 1) * 5 // n AS INTEGER) + 1 AS f_score,
                   CAST((ROW_NUMBER() OVER (ORDER BY m ASC, user_id) - 1) * 5 // n AS INTEGER) + 1 AS m_score
                 FROM base)
      SELECT user_id, r_days, f, m, r_score, f_score, m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
      FROM scored ORDER BY user_id
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(sessionize, funnel, retention, winRange, tsOverlap, winStreak,
    sessionizeBucketed, funnelBucketed, winStreakBucketed, retentionBucketed, attribution,
    eventsPath, eventsMarkov, eventsAbTest, eventsSeqmine, eventsNextstep, eventsRfm)
}
