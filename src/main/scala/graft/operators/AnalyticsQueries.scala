package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-2 analytics additions: time-series gap filling, mode (most
  * frequent value), conditional aggregates, and the regexp function family.
  *
  * Scale design: gap filling generates the per-group hour grid with
  * `sequence` + `explode` from each group's own bounds — grid size is
  * O(groups × span), never a driver loop or a global calendar crossJoin;
  * the join back to observed counts shuffles on (group, hour), same key
  * the aggregation already used. Mode is a count aggregate plus a
  * per-group top-1 window (WindowGroupLimit in Spark 4 — no full sort of
  * the counts). Conditional aggregates fold into the same single
  * hash-aggregate pass as their unconditional siblings.
  */
object AnalyticsQueries {

  /** Hourly event counts per type with missing hours filled as 0 — the
    * resample-with-gaps primitive every time-series pipeline needs.
    */
  val tsGapfill = QueryDef(
    "q_ts_gapfill",
    (s, dir) => {
      val hourUs = 3600000000L
      val e = Tables.events(s, dir).select(col("event_type"),
        expr("unix_micros(cast(date_trunc('hour', ts) as timestamp))").as("hour_us"))
      val counts = e.groupBy("event_type", "hour_us").agg(count(lit(1)).as("n_obs"))
      val grid = e.groupBy("event_type")
        .agg(min("hour_us").as("lo"), max("hour_us").as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(hourUs))).as("hour_us"))
      grid.join(counts, Seq("event_type", "hour_us"), "left")
        .select(col("event_type"), col("hour_us"), coalesce(col("n_obs"), lit(0L)).as("n"))
        .orderBy("event_type", "hour_us")
    },
    Some("""
      WITH e AS (
        SELECT event_type, epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us
        FROM events),
      counts AS (SELECT event_type, hour_us, COUNT(*) AS n_obs FROM e GROUP BY 1, 2),
      grid AS (
        SELECT event_type, unnest(range(lo, hi + 3600000000, 3600000000)) AS hour_us
        FROM (SELECT event_type, MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM e GROUP BY 1))
      SELECT g.event_type, g.hour_us, COALESCE(c.n_obs, 0) AS n
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.hour_us = c.hour_us
      ORDER BY g.event_type, g.hour_us
    """.trim),
  )

  /** Mode: each user's most frequent event type (deterministic tiebreak:
    * lexicographically smallest type wins).
    */
  val aggMode = QueryDef(
    "q_agg_mode",
    (s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id").orderBy(desc("cnt"), asc("event_type"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_type"), col("cnt").as("mode_n"))
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id, event_type AS mode_type, cnt AS mode_n
      FROM (
        SELECT user_id, event_type, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type ASC) AS rn
        FROM events GROUP BY user_id, event_type)
      WHERE rn = 1
      ORDER BY user_id
    """.trim),
  )

  /** Conditional aggregates: count_if / filtered decimal sums — one
    * hash-aggregate pass, no extra shuffle vs the unconditional versions.
    */
  val aggCondAgg = QueryDef(
    "q_agg_condagg",
    (s, dir) => {
      val zero = lit(BigDecimal(0)).cast(DecimalType(9, 2))
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"), col("value"),
          col("value").cast(DecimalType(9, 2)).as("v"))
        .groupBy("event_type")
        .agg(
          expr("count_if(value > 250)").as("n_big"),
          sum(when(col("user_id") % 2 === 0, col("v")).otherwise(zero))
            .cast(DecimalType(38, 2)).cast(DoubleType).as("sum_even_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type,
             COUNT(*) FILTER (WHERE value > 250) AS n_big,
             CAST(CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(9,2))
                                ELSE CAST(0 AS DECIMAL(9,2)) END) AS DECIMAL(38,2)) AS DOUBLE)
               AS sum_even_users,
             COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim),
  )

  /** Regexp family: extract / replace-all / match / count. DuckDB's
    * regexp_replace needs the 'g' flag to match Spark's replace-all
    * semantics.
    */
  val fnRegexp = QueryDef(
    "q_fn_regexp",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word_re"),
          regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
          col("text").rlike("data").as("has_data"),
          expr("regexp_count(text, ' ')").as("n_spaces"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             regexp_extract(text, '([a-z]+)', 1) AS first_word_re,
             regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
             regexp_matches(text, 'data') AS has_data,
             CAST(len(regexp_extract_all(text, ' ')) AS INTEGER) AS n_spaces
      FROM documents ORDER BY doc_id
    """.trim),
  )

  /** max_by / min_by argmax aggregates: per event_type, the event id of the
    * highest / lowest value (exact-double values; deterministic tiebreak by
    * smallest event_id via struct ordering). DuckDB's arg_max lacks
    * composite comparators, so the oracle uses an equivalent window
    * formulation with the same ordering.
    */
  val aggMinmaxBy = QueryDef(
    "q_agg_minmaxby",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          expr("max_by(event_id, struct(value, -event_id))").as("max_event_id"),
          expr("min_by(event_id, struct(value, event_id))").as("min_event_id"),
          max("value").as("max_value"),
          min("value").as("min_value"))
        .orderBy("event_type"),
    Some("""
      WITH mx AS (
        SELECT event_type, event_id AS max_event_id, value AS max_value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        FROM events),
      mn AS (
        SELECT event_type, event_id AS min_event_id, value AS min_value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn
        FROM events)
      SELECT mx.event_type, mx.max_event_id, mn.min_event_id, mx.max_value, mn.min_value
      FROM mx JOIN mn ON mx.event_type = mn.event_type
      WHERE mx.rn = 1 AND mn.rn = 1
      ORDER BY mx.event_type
    """.trim),
  )

  /** Deterministic mod-sampling — the reproducible-sample idiom for
    * experiment slices at 100 TB: a pure function of the key (no RNG, no
    * seed state), so the same 10% slice falls out on every engine and
    * every run. pmod is not a parquet-pushable predicate, so it evaluates
    * as a post-scan filter — still a single zero-exchange pass.
    */
  val sampleMod = QueryDef(
    "q_sample_mod",
    (s, dir) =>
      Tables.events(s, dir)
        .filter(pmod(col("event_id"), lit(10)) === 0)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id"),
    Some("""
      SELECT event_id, user_id, event_type, value
      FROM events WHERE event_id % 10 = 0
      ORDER BY event_id
    """.trim),
  )

  /** Weighted average — exact decimal numerator/denominator (weight is a
    * deterministic small int), the double emitted only from the exact
    * ratio of two sub-2^53 decimals.
    */
  val aggWeighted = QueryDef(
    "q_agg_weighted",
    (s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"),
        col("value").cast(DecimalType(9, 2)).as("v"),
        (pmod(col("user_id"), lit(10)) + 1).cast(DecimalType(3, 0)).as("w"))
      e.groupBy("event_type")
        .agg(
          sum(col("w") * col("v")).cast(DecimalType(38, 2)).cast(DoubleType).as("wsum"),
          sum("w").cast(DecimalType(38, 0)).cast(DoubleType).as("wtot"))
        .select(col("event_type"), round(col("wsum") / col("wtot"), 6).as("wavg"),
          col("wsum"), col("wtot"))
        .orderBy("event_type")
    },
    Some("""
      WITH e AS (SELECT event_type, CAST(value AS DECIMAL(9,2)) AS v,
                        CAST(user_id % 10 + 1 AS DECIMAL(3,0)) AS w
                 FROM events),
      g AS (SELECT event_type,
                   CAST(CAST(SUM(w * v) AS DECIMAL(38,2)) AS DOUBLE) AS wsum,
                   CAST(CAST(SUM(w) AS DECIMAL(38,0)) AS DOUBLE) AS wtot
            FROM e GROUP BY event_type)
      SELECT event_type, ROUND(wsum / wtot, 6) AS wavg, wsum, wtot
      FROM g ORDER BY event_type
    """.trim),
  )

  /** Bitwise aggregates — flag-set folding (bit_and/bit_or/bit_xor over a
    * derived 8-bit flag per event). Flags come from plain integer
    * arithmetic (Knuth multiplicative hash mod 256 — no engine-specific
    * hash function), so the whole fold is exactly reproducible in SQL.
    */
  val aggBitops = QueryDef(
    "q_agg_bitops",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          // idMod first: event_id * 2654435761 overflows int64 (an ANSI
          // failure) once ids exceed ~3.5e9 — identity on the fixture
          pmod(graft.functions.PortableHash.idMod(col("event_id")) * lit(2654435761L),
            lit(256)).as("flags"))
        .groupBy("event_type")
        .agg(expr("bit_and(flags)").as("and_flags"),
          expr("bit_or(flags)").as("or_flags"),
          expr("bit_xor(flags)").as("xor_flags"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             bit_and(flags) AS and_flags,
             bit_or(flags) AS or_flags,
             bit_xor(flags) AS xor_flags
      FROM (SELECT event_type, ((event_id % 2147483647) * 2654435761) % 256 AS flags FROM events)
      GROUP BY event_type ORDER BY event_type
    """.trim),
  )

  /** Stratified deterministic sampling — per-stratum rates (downsample the
    * dominant event types hard, keep the rare ones dense), the class-
    * rebalancing idiom for training-mix construction. Same pure-key
    * mod-slice as q_sample_mod, so the sample is reproducible across
    * engines and runs; the rate lookup is a map literal evaluated per row
    * (codegen'd, zero-exchange single pass).
    */
  val sampleStratified = QueryDef(
    "q_sample_stratified",
    (s, dir) => {
      val rate = coalesce(
        element_at(map(lit("click"), lit(10L), lit("view"), lit(5L)), col("event_type")),
        lit(2L))
      Tables.events(s, dir)
        .filter(pmod(col("event_id"), rate) === 0)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id, event_type, value
      FROM events
      WHERE event_id % (CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 5 ELSE 2 END) = 0
      ORDER BY event_id
    """.trim),
  )

  /** Winsorization — per-group percentile clipping (p05/p95), the robust-
    * stats step that precedes any mean/variance over heavy-tailed metrics.
    * Bounds come from the SAME explicit linear-interpolation formulation
    * as q_agg_percentile (engines' percentile builtins differ by a ulp);
    * they are 6dp-rounded in both engines BEFORE clipping so the clip
    * comparisons agree exactly. Distributed shape: one window sort per
    * group for the bounds, then the per-group bound table (#groups rows,
    * broadcastable at any scale) joins back into a single linear clip
    * pass over the fact rows. The exact bounds cost a per-group sort; at
    * 100 TB substitute approx_percentile partials for the bound stage
    * (the ApproxOpsSpec-bounded sketch path) — the clip pass is unchanged.
    */
  val aggWinsorize = QueryDef(
    "q_agg_winsorize",
    (s, dir) => {
      val w = Window.partitionBy("event_type").orderBy("v", "event_id")
      val ranked = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          col("value").cast(DecimalType(12, 4)).cast(DoubleType).as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      def bound(q: Double, name: String) = {
        val pos = (col("n") - 1).cast(DoubleType) * lit(q)
        val lo = floor(pos)
        val frac = pos - lo
        ranked.withColumn("wgt",
            when(col("rn") - 1 === lo, lit(1.0) - frac).otherwise(lit(0.0))
              + when(col("rn") - 1 === ceil(pos), frac).otherwise(lit(0.0)))
          .filter(col("wgt") =!= 0.0)
          .groupBy("event_type")
          .agg(round(sum(col("v") * col("wgt")), 6).as(name))
      }
      val bounds = bound(0.05, "p05").join(bound(0.95, "p95"), "event_type")
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          col("value").cast(DecimalType(12, 4)).cast(DoubleType).as("v"))
        .join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"), col("v").as("value"),
          round(least(greatest(col("v"), col("p05")), col("p95")), 6).as("clipped"),
          (col("v") < col("p05") || col("v") > col("p95")).as("was_clipped"))
        .orderBy("event_id")
    },
    Some("""
      WITH e AS (SELECT event_id, event_type,
                        CAST(CAST(value AS DECIMAL(12,4)) AS DOUBLE) AS v
                 FROM events),
      r AS (SELECT event_id, event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM e),
      b AS (SELECT event_type,
                   ROUND(SUM(v * (CASE WHEN rn - 1 = floor((n-1)*0.05)
                                  THEN 1.0 - ((n-1)*0.05 - floor((n-1)*0.05)) ELSE 0.0 END
                                + CASE WHEN rn - 1 = ceil((n-1)*0.05)
                                  THEN (n-1)*0.05 - floor((n-1)*0.05) ELSE 0.0 END)), 6) AS p05,
                   ROUND(SUM(v * (CASE WHEN rn - 1 = floor((n-1)*0.95)
                                  THEN 1.0 - ((n-1)*0.95 - floor((n-1)*0.95)) ELSE 0.0 END
                                + CASE WHEN rn - 1 = ceil((n-1)*0.95)
                                  THEN (n-1)*0.95 - floor((n-1)*0.95) ELSE 0.0 END)), 6) AS p95
            FROM r GROUP BY event_type)
      SELECT e.event_id, e.event_type, e.v AS value,
             ROUND(least(greatest(e.v, b.p05), b.p95), 6) AS clipped,
             (e.v < b.p05 OR e.v > b.p95) AS was_clipped
      FROM e JOIN b USING (event_type)
      ORDER BY e.event_id
    """.trim),
  )

  /** Deterministic train/val/test split — the assignment every training
    * pipeline makes before anything else, done the only way that survives
    * corpus growth: each document's split is a pure function of its OWN
    * key (affine scramble of doc_id over the Mersenne prime, PortableHash
    * family — NOT raw doc_id % 100, which would correlate with any
    * id-ordered ingest pattern), so adding documents never reassigns
    * existing ones (rank/percentile splits reshuffle everything on every
    * ingest) and any engine can recompute membership from the key alone.
    * 80/10/10 on the scrambled bucket; the assignment itself is zero
    * shuffles and embarrassingly parallel. The audit columns (per-split
    * doc count + char mass) come from a 3-row partial-aggregated stats
    * frame BROADCAST back onto the rows — NOT a window partitioned by
    * split, which would funnel 80% of a 100 TB corpus through one task.
    */
  val sampleSplit = QueryDef(
    "q_sample_split",
    (s, dir) => {
      import graft.functions.PortableHash
      // idMod first: doc_id * A overflows int64 on wide-strided ids
      val bucket = pmod(PortableHash.idMod(col("doc_id")) * lit(PortableHash.A)
        + lit(PortableHash.BStep), lit(PortableHash.SeedMod)) % 100
      val assigned = Tables.documents(s, dir).select(
        col("doc_id"), col("n_chars"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"))
      val stats = assigned.groupBy("split").agg(
        count(lit(1)).as("split_docs"), sum("n_chars").as("split_chars"))
      assigned.join(broadcast(stats), "split")
        .select("doc_id", "split", "split_docs", "split_chars")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH a AS (
        SELECT doc_id, n_chars,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id, n_chars,
                ((${graft.functions.PortableHash.idModSql("doc_id")} * ${graft.functions.PortableHash.A} + ${graft.functions.PortableHash.BStep})
                  % ${graft.functions.PortableHash.SeedMod}) % 100 AS b
              FROM documents))
      SELECT doc_id, split,
             COUNT(*) OVER (PARTITION BY split) AS split_docs,
             CAST(SUM(n_chars) OVER (PARTITION BY split) AS BIGINT) AS split_chars
      FROM a ORDER BY doc_id
    """.trim),
  )

  /** Distributed reservoir sampling — fixed-size k-per-stratum uniform
    * sample as a TOP-K BY HASH PRIORITY (the standard distributed
    * reservoir reduction: assigning each row a pseudo-random priority
    * and keeping the k smallest per stratum is exactly reservoir
    * sampling, but shuffle-friendly — per-partition top-k partials merge
    * associatively instead of needing sequential stream state). Priority
    * is two composed PortableHash affine scrambles of doc_id — engine-
    * reproducible (unlike rand(), which no oracle could replay) while
    * breaking the linear id structure a single affine map would leak.
    * 20 docs per lang; ranked output so downstream joins are stable.
    */
  val sampleReservoir = QueryDef(
    "q_sample_reservoir",
    (s, dir) => {
      val P = graft.functions.PortableHash.SeedMod
      val pr = ((graft.functions.PortableHash.idMod(col("doc_id"))
        * graft.functions.PortableHash.Scramble1Mul
        + graft.functions.PortableHash.Scramble1Add) % P
        * graft.functions.PortableHash.Scramble2Mul
        + graft.functions.PortableHash.Scramble2Add) % P
      val w = Window.partitionBy("lang").orderBy(asc("priority"), asc("doc_id"))
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), pr.as("priority"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select("lang", "rank", "doc_id", "priority")
        .orderBy("lang", "rank")
    },
    Some {
      val ph = graft.functions.PortableHash
      s"""
      WITH pri AS (
        SELECT lang, doc_id,
               ((${ph.idModSql("doc_id")} * ${ph.Scramble1Mul} + ${ph.Scramble1Add}) % ${ph.SeedMod}
                 * ${ph.Scramble2Mul} + ${ph.Scramble2Add}) % ${ph.SeedMod} AS priority
        FROM documents)
      SELECT lang, rank, doc_id, priority FROM (
        SELECT lang, doc_id, priority,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority ASC, doc_id ASC) AS rank
        FROM pri)
      WHERE rank <= 20
      ORDER BY lang, rank
      """.trim
    },
  )

  def defs: Seq[QueryDef] = Seq(tsGapfill, aggMode, aggCondAgg, fnRegexp, aggMinmaxBy, sampleMod,
    aggWeighted, aggBitops, sampleStratified, aggWinsorize, sampleSplit, sampleReservoir)
}
