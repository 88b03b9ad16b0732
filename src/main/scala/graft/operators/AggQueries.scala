package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
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
  * Wide decimals are intermediates ONLY — every output column is DOUBLE
  * (or integral): a precision>18 decimal writes as parquet decimal128,
  * which the two engines' readers render differently (exact Decimal vs
  * lossy float64). DOUBLE outputs only ever come from an exact decimal
  * whose unscaled value fits in 2^53 (scale-8+ sums are first ROUNDed to
  * 2dp — half-away-from-zero on both engines), so the conversion is exact
  * on both sides.
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
      // Outputs are DOUBLE, never wide decimal: parquet decimal128 (p > 18)
      // round-trips differently through the two engines' readers (repr +
      // last-ulp), while an exact decimal with unscaled < 2^53 casts to the
      // same double bits on both sides. Scale-8/12 sums are rounded to 2dp
      // (both engines round half away from zero; sums are positive) so the
      // unscaled value stays far below 2^53.
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("qty").cast(DecimalType(38, 4)).cast(DoubleType).as("sum_qty"),
          sum("price").cast(DecimalType(38, 4)).cast(DoubleType).as("sum_base_price"),
          round(sum(col("price") * (one - col("disc"))), 2).cast(DoubleType).as("sum_disc_price"),
          round(sum(col("price") * (one - col("disc")) * (one + col("tax"))), 2).cast(DoubleType).as("sum_charge"),
          (sum("qty").cast(DecimalType(38, 4)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
          (sum("price").cast(DecimalType(38, 4)).cast(DoubleType) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim),
  )

  /** Exact distinct aggregate — two-phase shuffle (distinct then count). */
  val aggDistinct = QueryDef(
    "q_agg_distinct",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim),
  )

  /** Rollup over region→nation with exact decimal revenue. Subtotal rows
    * carry NULL keys — sorted NULLS FIRST on both sides.
    */
  val aggRollup = QueryDef(
    "q_agg_rollup",
    (s, dir) => {
      val joined = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"), col("o_totalprice").cast(D).as("price"))
      // rollup via the SQL path: the DataFrame rollup+orderBy trips the
      // ambiguous-self-join detector on the Expand-duplicated grouping cols.
      joined.createOrReplaceTempView("graft_rollup_in")
      s.sql("""
        SELECT region, nation,
               CAST(CAST(SUM(price) AS DECIMAL(38,4)) AS DOUBLE) AS revenue, COUNT(*) AS n_orders
        FROM graft_rollup_in
        GROUP BY ROLLUP (region, nation)
        ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST
      """)
    },
    Some("""
      SELECT region, nation,
             CAST(CAST(SUM(price) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM (SELECT r_name AS region, n_name AS nation,
                   CAST(o_totalprice AS DECIMAL(12,4)) AS price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey)
      GROUP BY ROLLUP (region, nation)
      ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST
    """.trim),
  )

  /** Cube over order status × priority. */
  val aggCube = QueryDef(
    "q_agg_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).cast(DecimalType(38, 4)).cast(DoubleType).as("revenue"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """.trim),
  )

  /** Explicit grouping sets with grouping_id, via the SQL path (ANTLR →
    * same Catalyst pipeline).
    */
  val aggGroupingSets = QueryDef(
    "q_agg_gsets",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("graft_documents_gsets")
      s.sql("""
        SELECT lang, source, grouping__id AS gid, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
        FROM graft_documents_gsets
        GROUP BY lang, source GROUPING SETS ((lang), (source), (lang, source))
        ORDER BY gid, lang ASC NULLS FIRST, source ASC NULLS FIRST
      """)
    },
    Some("""
      SELECT lang, source, GROUPING(lang, source) AS gid, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents
      GROUP BY GROUPING SETS ((lang), (source), (lang, source))
      ORDER BY gid, lang ASC NULLS FIRST, source ASC NULLS FIRST
    """.trim),
  )

  /** Approximate distinct (HyperLogLog++). Sketches are impl-specific so no
    * DuckDB oracle; a property spec bounds it against the exact count.
    */
  val aggHll = QueryDef(
    "q_agg_hll",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .orderBy("event_type"),
    None,
  )

  /** Statistical aggregates. stddev is computed from exact decimal sums with
    * the same double formula on both sides (bit-identical); the median uses
    * exact interpolation rounded to 6dp.
    */
  val aggStats = QueryDef(
    "q_agg_stats",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"), col("value"),
        col("value").cast(DecimalType(9, 2)).as("v"))
      e.groupBy("event_type")
        .agg(
          min("value").as("min_value"),
          max("value").as("max_value"),
          count(lit(1)).as("n"),
          sum("v").cast(DecimalType(38, 2)).cast(DoubleType).as("sum_v"),
          sum(col("v") * col("v")).cast(DecimalType(38, 4)).cast(DoubleType).as("sum_v2"),
          round(expr("percentile(value, 0.5)"), 6).as("median_value"))
        .withColumn("stddev_v",
          round(sqrt((col("sum_v2") - col("sum_v") * col("sum_v") / col("n")) / (col("n") - 1)), 6))
        .orderBy("event_type")
    },
    Some("""
      WITH g AS (
        SELECT event_type,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_v,
               CAST(CAST(SUM(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_v2,
               ROUND(quantile_cont(value, 0.5), 6) AS median_value
        FROM events GROUP BY event_type)
      SELECT event_type, min_value, max_value, n, sum_v, sum_v2, median_value,
             ROUND(sqrt((sum_v2 - sum_v * sum_v / n) / (n - 1)), 6) AS stddev_v
      FROM g ORDER BY event_type
    """.trim),
  )

  /** Salted two-phase aggregation — the skew-mitigation idiom for hot keys:
    * phase 1 aggregates on (key, salt) so a hot key's rows spread over 16
    * reducers; phase 2 combines the 16 partials per key. Result is
    * identical to the direct aggregate (decimal sums are associative), which
    * is exactly what the oracle checks. event_type has only 5 values — the
    * worst-case "few hot keys" shape this exists for.
    */
  val aggSalted = QueryDef(
    "q_agg_salted",
    (s, dir) => {
      val salted = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast(DecimalType(9, 2)).as("v"),
          pmod(hash(col("event_id")), lit(16)).as("salt"))
      salted
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum("v").as("psum"))
        .groupBy("event_type")
        .agg(sum("pn").cast(LongType).as("n"),
          sum("psum").cast(DecimalType(38, 2)).cast(DoubleType).as("sum_value"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim),
  )

  /** Histogram: width_bucket of event values into 10 fixed buckets. */
  val aggHistogram = QueryDef(
    "q_agg_histogram",
    (s, dir) =>
      Tables.events(s, dir)
        .select(expr("width_bucket(value, 0.0, 500.0, 10)").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
    Some("""
      -- DuckDB has no width_bucket; identical arithmetic incl. the clamping
      -- width_bucket applies to out-of-range values (underflow → 0,
      -- overflow → 11)
      SELECT LEAST(GREATEST(CAST(FLOOR(value / 50.0) + 1 AS BIGINT), 0), 11) AS bucket, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY bucket
    """.trim),
  )

  /** Pearson correlation + sample covariance per event_type, computed in
    * closed form from exact decimal sums (builtin corr/covar use streaming
    * float algorithms that differ across engines) — value vs. epoch-seconds,
    * both reduced to exact sub-2^53 ingredients.
    */
  val aggCorr = QueryDef(
    "q_agg_corr",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"),
        col("value").cast(DecimalType(9, 2)).as("x"),
        expr("unix_micros(cast(ts as timestamp)) div 1000000 - 1704067200").as("ys")) // sec since 2024-01-01
      val g = e.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("x").cast(DecimalType(38, 2)).cast(DoubleType).as("sx"),
        sum(col("x") * col("x")).cast(DecimalType(38, 4)).cast(DoubleType).as("sxx"),
        sum("ys").cast(DecimalType(38, 0)).cast(DoubleType).as("sy"),
        sum(col("ys") * col("ys")).cast(DecimalType(38, 0)).cast(DoubleType).as("syy"),
        sum(col("x") * col("ys")).cast(DecimalType(38, 2)).cast(DoubleType).as("sxy"))
      g.select(col("event_type"),
          round(((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") - 1) / col("n")), 6).as("covar_samp"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr"))
        .orderBy("event_type")
    },
    Some("""
      WITH g AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(CAST(SUM(x) AS DECIMAL(38,2)) AS DOUBLE) AS sx,
               CAST(CAST(SUM(x * x) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(ys) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
               CAST(CAST(SUM(ys * ys) AS DECIMAL(38,0)) AS DOUBLE) AS syy,
               CAST(CAST(SUM(x * ys) AS DECIMAL(38,2)) AS DOUBLE) AS sxy
        FROM (SELECT event_type, CAST(value AS DECIMAL(9,2)) AS x,
                     epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 - 1704067200 AS ys
              FROM events)
        GROUP BY event_type)
      SELECT event_type,
             ROUND((n * sxy - sx * sy) / (n - 1) / n, 6) AS covar_samp,
             ROUND((n * sxy - sx * sy)
                   / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr
      FROM g ORDER BY event_type
    """.trim),
  )

  /** Exact linear-interpolation percentiles (p25/p50/p75 per event_type)
    * via an EXPLICIT formulation — row_number over the value order plus the
    * shared lo/hi/frac interpolation — instead of each engine's percentile
    * builtin, whose interpolation expression trees differ by a ulp. Both
    * engines evaluate literally the same arithmetic: pos = (n-1)·q (exact
    * doubles: q ∈ {.25,.5,.75} are binary fractions), weight rows lo and
    * hi, sum. Distributed shape: one window sort per type + a hash
    * aggregate — no collect; approx_percentile (spec-bounded in
    * ApproxOpsSpec) is the sketch path when a sort is too expensive.
    */
  val aggPercentile = QueryDef(
    "q_agg_percentile",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("v", "event_id")
      val ranked = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          col("value").cast(DecimalType(12, 4)).cast(DoubleType).as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
      val perQ = qs.map { case (label, q) =>
        val pos = (col("n") - 1).cast(DoubleType) * lit(q)
        val lo = floor(pos)
        val frac = pos - lo
        ranked.withColumn("wgt",
            when(col("rn") - 1 === lo, lit(1.0) - frac).otherwise(lit(0.0))
              + when(col("rn") - 1 === ceil(pos), frac).otherwise(lit(0.0)))
          .filter(col("wgt") =!= 0.0)
          .groupBy("event_type")
          .agg(round(sum(col("v") * col("wgt")), 6).as("pct"))
          .select(col("event_type"), lit(label).as("q"), col("pct"))
      }
      perQ.reduce(_ unionAll _).orderBy("event_type", "q")
    },
    Some("""
      WITH e AS (SELECT event_id, event_type,
                        CAST(CAST(value AS DECIMAL(12,4)) AS DOUBLE) AS v FROM events),
      ranked AS (SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
                 FROM e),
      qs AS (SELECT * FROM (VALUES ('p25', 0.25), ('p50', 0.5), ('p75', 0.75)) AS t(q, qv)),
      weighted AS (
        SELECT event_type, q, v,
               (CASE WHEN rn - 1 = FLOOR((n - 1) * qv)
                     THEN 1.0 - ((n - 1) * qv - FLOOR((n - 1) * qv)) ELSE 0.0 END)
             + (CASE WHEN rn - 1 = CEIL((n - 1) * qv)
                     THEN (n - 1) * qv - FLOOR((n - 1) * qv) ELSE 0.0 END) AS wgt
        FROM ranked CROSS JOIN qs)
      SELECT event_type, q, ROUND(SUM(v * wgt), 6) AS pct
      FROM weighted WHERE wgt <> 0.0
      GROUP BY event_type, q
      ORDER BY event_type, q
    """.trim),
  )

  /** Misra–Gries summary of one partition's tokens: every item with
    * partition count > n_p/k survives (the MG guarantee), so the UNION
    * of per-partition summaries is a SUPERSET of every global item with
    * count > N/k (average argument: Σc_p > Σn_p/k ⇒ some partition is
    * over ITS threshold). Buffer is k counters — O(k) memory per task
    * regardless of partition size.
    */
  private[graft] def mgCandidates(it: Iterator[String], k: Int): Iterator[String] = {
    val counts = scala.collection.mutable.Map[String, Long]()
    it.foreach { t =>
      if (counts.contains(t) || counts.size < k) counts(t) = counts.getOrElse(t, 0L) + 1
      else {
        // decrement-all step; drop zeros
        val dead = scala.collection.mutable.ArrayBuffer[String]()
        counts.keysIterator.foreach { key =>
          val v = counts(key) - 1
          if (v == 0) dead += key else counts(key) = v
        }
        dead.foreach(counts.remove)
      }
    }
    counts.keysIterator.toList.iterator
  }

  /** Exact heavy hitters via the two-phase sketch+verify discipline:
    * phase 1 streams each partition through a k=128-counter Misra–Gries
    * summary (O(k) memory, one pass, no shuffle) whose union provably
    * covers every token with global count > N/64; phase 2 recounts ONLY
    * the candidates (broadcast semi-join) and filters exactly. The
    * OUTPUT is the exact frequent-item set — candidate-set variation
    * across partitionings can never change it, which is what keeps the
    * operator partition-count invariant and fully oracle-checkable
    * (the oracle is a plain count filter). At 100 TB phase 1 touches
    * the corpus once with constant memory and phase 2 aggregates a
    * candidate-pruned stream — the heavy-hitter pipeline every
    * vocabulary/URL/domain frequency audit runs.
    */
  val aggHeavyHitters = QueryDef(
    "q_agg_heavyhitters",
    (s, dir) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select(explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      val cands = toks.as[String].mapPartitions(mgCandidates(_, 128))
        .toDF("token").distinct()
      val total = Tables.documents(s, dir)
        .agg(sum(graft.functions.Tokenize.tokenCount(col("text")).cast(LongType)).as("total"))
      toks.join(broadcast(cands), "token")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .filter(col("n") * 64 > col("total"))
        .select("token", "n")
        .orderBy(desc("n"), asc("token"))
    },
    Some("""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      c AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
      t AS (SELECT COUNT(*) AS total FROM toks)
      SELECT token, n FROM c, t WHERE n * 64 > total
      ORDER BY n DESC, token ASC
    """.trim),
  )

  /** Per-user Shannon entropy (bits) of the event-type distribution — the
    * behavioral-diversity signal (a bot hammering one endpoint scores 0;
    * uniform browsing scores log2 k). Two hash aggregates; float parity
    * via the lm_score recipe: each −p·log2 p term is 8dp-rounded to an
    * exact decimal BEFORE the order-free decimal sum (log2 is libm-backed
    * and may differ by an ulp between engines; p itself is one exact-
    * operand IEEE division), display round at 6dp.
    */
  val aggEntropy = QueryDef(
    "q_agg_entropy",
    (s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("user_id").agg(sum("c").as("n"))
      counts.join(totals, "user_id")
        .withColumn("p", col("c").cast(DoubleType) / col("n"))
        .withColumn("term", round(-col("p") * log2(col("p")), 8).cast(DecimalType(18, 8)))
        .groupBy("user_id")
        .agg(max(col("n")).as("n_events"),
          round(sum("term").cast(DoubleType), 6).as("entropy"))
        .orderBy("user_id")
    },
    Some("""
      WITH counts AS (
        SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2),
      totals AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
      terms AS (
        SELECT counts.user_id, n,
               CAST(ROUND(-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 8) AS DECIMAL(18,8)) AS term
        FROM counts JOIN totals ON counts.user_id = totals.user_id)
      SELECT user_id, max(n) AS n_events, ROUND(CAST(sum(term) AS DOUBLE), 6) AS entropy
      FROM terms GROUP BY user_id ORDER BY user_id
    """.trim),
  )

  /** Per-priority Gini coefficient of order amounts — the concentration
    * audit (how unequal is spend within a tier; a flood of identical
    * synthetic amounts scores 0). The sorted-rank closed form
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over cents-exact integers: one
    * rank window per group + one aggregate, and the ONLY float op is the
    * final division of two exact longs — no libm, no rounding. Σ i·xᵢ is
    * permutation-invariant among tied amounts, so the rank tiebreak
    * can't leak into the value.
    */
  val aggGini = QueryDef(
    "q_agg_gini",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(asc("cents"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("cents"))
        .withColumn("i", row_number().over(w))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("cents").as("sx"),
          sum(col("i") * col("cents")).as("six"))
        .select(col("o_orderpriority"), col("n"),
          ((lit(2L) * col("six") - (col("n") + 1) * col("sx")).cast(DoubleType) /
            (col("n") * col("sx"))).as("gini"))
        .orderBy("o_orderpriority")
    },
    Some("""
      WITH c AS (
        SELECT o_orderpriority, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), o_orderkey) AS i
        FROM orders),
      a AS (SELECT o_orderpriority, count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS sx, CAST(sum(i * cents) AS BIGINT) AS six
            FROM c GROUP BY 1)
      SELECT o_orderpriority, n,
             CAST(2 * six - (n + 1) * sx AS DOUBLE) / (n * sx) AS gini
      FROM a ORDER BY o_orderpriority
    """.trim),
  )

  /** Equi-depth (equi-height) histogram of order amounts, 16 buckets —
    * the ANALYZE-style optimizer statistic (each bucket holds ~N/16
    * rows; boundaries land where the data is dense, unlike
    * q_agg_histogram's fixed-width grid). EXACT by construction: a
    * distinct value v with exclusive cumulative count cb is assigned
    * bucket floor(cb·16/N) — all integer arithmetic over the
    * value-distinct grain (StatQueries.withCumBefore: one shuffle
    * bounded by value cardinality + the bucketed two-pass cumulative,
    * never a single-task sort). A value heavier than N/16 simply owns
    * its bucket — the classic equi-depth skew semantics. Output per
    * bucket: exact (lo, hi, n_rows, n_distinct) in cents.
    */
  val aggHistogramEqdepth = QueryDef(
    "q_agg_histogram_eqdepth",
    (s, dir) => StatQueries.eqdepthOn(
      Tables.orders(s, dir)
        .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
        .groupBy("v").agg(count(lit(1)).as("t")), 16),
    Some("""
      WITH vals AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v, COUNT(*) AS t
        FROM orders GROUP BY 1),
      nn AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM vals),
      ranked AS (
        SELECT v, t,
               COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_t
        FROM vals)
      SELECT CAST((cb_t * 16) // n AS BIGINT) AS bucket,
             MIN(v) AS lo, MAX(v) AS hi,
             CAST(SUM(t) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct
      FROM ranked, nn
      GROUP BY 1 ORDER BY bucket
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    aggGroupBy, aggDistinct, aggRollup, aggCube, aggGroupingSets, aggHll, aggStats, aggSalted,
    aggHistogram, aggCorr, aggPercentile, aggHeavyHitters, aggEntropy, aggGini,
    aggHistogramEqdepth)
}
