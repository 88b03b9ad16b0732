package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classical statistical hypothesis tests as engine operators — the
  * inference layer every experimentation / data-quality platform runs on
  * top of its aggregates: Mann-Whitney U, two-sample Kolmogorov-Smirnov,
  * Kruskal-Wallis H, Spearman rank correlation, chi-square independence,
  * and per-group OLS regression.
  *
  * Determinism discipline (the house rule — see AggQueries header,
  * q_events_ab_test, q_ts_changepoint): every statistic reduces to EXACT
  * integer/decimal moments first; the only floating-point ops are final
  * closed-form combinations whose expression trees are written identically
  * in Spark and the DuckDB oracle — long→double casts (exactly-rounded,
  * hardware-deterministic, unlike decimal→double which goes through
  * radix-10 paths), +,-,*,/ (IEEE correctly rounded), and sqrt (correctly
  * rounded by IEEE 754, not a libm freedom). Where a sum of per-group
  * float terms is needed (Kruskal), each term is 8dp-rounded to an exact
  * decimal BEFORE the order-free decimal sum (the lm_score/entropy
  * recipe), and the decimal total is kept small enough (≤15 significant
  * digits) that its double render is exact. Where a quotient of
  * beyond-double integers is needed (OLS), it is produced by EXACT
  * integer division at 1e6 scale (the q_ts_changepoint recipe) — floor
  * division applied to non-negative operands so Spark `div` (truncate)
  * and DuckDB `//` agree by construction.
  *
  * Rank machinery at 100 TB: ranking is the classic distributed-sort
  * shape. All rank-based tests here (MW / KS / KW / Spearman) rank via a
  * VALUE-DISTINCT aggregate (one shuffle, output bounded by value
  * cardinality, never row count) followed by a bucketed two-pass
  * cumulative: per-bucket windows run in parallel, only the ≤1024-row
  * bucket-total frame sees a global window. No operator ever sorts the
  * full fact in one task.
  */
object StatQueries {

  /** Exact cents of a fixture money double (the q_agg_gini cast). */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(12, 2)) * 100).cast(LongType)

  /** Bucketed two-pass exclusive cumulative sums over a distinct-value
    * frame. `vals` has one row per `v` (long) plus count columns; for each
    * requested column c this appends `cb_<c>` = Σ of c over all rows with
    * smaller v. Pass 1: per-bucket window (parallel, bucket = value range
    * from a broadcast min/max — 1024 buckets). Pass 2: a global window
    * over the ≤1024-row bucket-total frame, broadcast back. This is how a
    * distributed engine computes a global ECDF without a single-task sort.
    */
  private[operators] def withCumBefore(vals0: DataFrame, cols: Seq[String],
      preMaterialized: Boolean = false): DataFrame = {
    // The value-distinct frame is the design's bounded-size object
    // (cardinality of v, never rows) — materialize it ONCE so the
    // min/max probe, the bucket pass, and the bucket totals don't each
    // re-scan and re-aggregate the fact underneath. preMaterialized
    // (r17): a caller that already holds the frame behind a barrier
    // (kruskal/KS share the SAME vals with their moment aggregates)
    // skips the redundant second materialization.
    val vals = if (preMaterialized) vals0 else vals0.localCheckpoint()
    val mm = vals.agg(min("v").as("lo"), max("v").as("hi"))
    val b = vals.crossJoin(broadcast(mm))
      .withColumn("bkt", expr("((v - lo) * 1024) div (hi - lo + 1)"))
      .drop("lo", "hi")
    val wIn = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = cols.foldLeft(b) { (df, c) =>
      df.withColumn(s"in_$c", coalesce(sum(col(c)).over(wIn), lit(0L)))
    }
    val btAggs = cols.map(c => sum(col(c)).as(s"bt_$c"))
    val bt = b.groupBy("bkt").agg(btAggs.head, btAggs.tail: _*)
    val wB = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val pre = cols.foldLeft(bt) { (df, c) =>
      df.withColumn(s"pre_$c", coalesce(sum(col(s"bt_$c")).over(wB), lit(0L)))
    }.select(col("bkt") +: cols.map(c => col(s"pre_$c")): _*)
    val joined = withIn.join(broadcast(pre), "bkt")
    cols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"cb_$c", col(s"in_$c") + col(s"pre_$c"))
        .drop(s"in_$c", s"pre_$c")
    }.drop("bkt")
  }

  /** Per-PARTITION twin of [[withCumBefore]]: exclusive cumulative of
    * `cols` over ascending `v` WITHIN each `part` group, same bucketed
    * two-pass shape (per-group 1024-bucket grid from a per-group min/max
    * probe; the within-bucket window sorts only one bucket's distinct
    * values, the bucket-prefix window only the ≤1024 bucket totals per
    * group) — no single task ever sorts a group's full distinct-value
    * set. `part` must be low-cardinality enough to broadcast its
    * min/max dim (group-keyed statistics always are).
    */
  private[operators] def withCumBeforeBy(vals0: DataFrame, part: Seq[String],
      cols: Seq[String], preMaterialized: Boolean = false): DataFrame = {
    // preMaterialized (r16): a caller that already localCheckpoint'd the
    // frame (madOnHist materializes the hist ONCE for its two consumers)
    // must not pay a second, byte-identical materialization here
    val vals = if (preMaterialized) vals0 else vals0.localCheckpoint()
    val mm = vals.groupBy(part.map(col): _*).agg(min("v").as("lo"), max("v").as("hi"))
    val b = vals.join(broadcast(mm), part)
      .withColumn("bkt", expr("((v - lo) * 1024) div (hi - lo + 1)"))
      .drop("lo", "hi")
    val wIn = Window.partitionBy((part :+ "bkt").map(col): _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = cols.foldLeft(b) { (df, c) =>
      df.withColumn(s"in_$c", coalesce(sum(col(c)).over(wIn), lit(0L)))
    }
    val btAggs = cols.map(c => sum(col(c)).as(s"bt_$c"))
    val bt = b.groupBy((part :+ "bkt").map(col): _*).agg(btAggs.head, btAggs.tail: _*)
    val wB = Window.partitionBy(part.map(col): _*).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = cols.foldLeft(bt) { (df, c) =>
      df.withColumn(s"pre_$c", coalesce(sum(col(s"bt_$c")).over(wB), lit(0L)))
    }.select((part :+ "bkt").map(col) ++ cols.map(c => col(s"pre_$c")): _*)
    val joined = withIn.join(broadcast(pre), part :+ "bkt")
    cols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"cb_$c", col(s"in_$c") + col(s"pre_$c"))
        .drop(s"in_$c", s"pre_$c")
    }.drop("bkt")
  }

  /** Per-group exact weighted median over a (grp, v, t) histogram, in
    * DOUBLED units so the even-count midpoint average stays an integer:
    * med2 = v@⌊(n−1)/2⌋ + v@⌊n/2⌋ (0-based positions over the cumulative).
    */
  private[operators] def median2On(hist: DataFrame,
      preMaterialized: Boolean = false): DataFrame =
    withCumBeforeBy(hist, Seq("grp"), Seq("t"), preMaterialized)
      .withColumn("n", sum("t").over(Window.partitionBy("grp")))
      .withColumn("m1", expr("(n - 1) div 2"))
      .withColumn("m2", expr("n div 2"))
      .groupBy("grp").agg(
        max("n").cast(LongType).as("n"),
        (sum(when(col("cb_t") <= col("m1")
            && col("m1") < col("cb_t") + col("t"), col("v")).otherwise(0L))
          + sum(when(col("cb_t") <= col("m2")
            && col("m2") < col("cb_t") + col("t"), col("v")).otherwise(0L)))
          .cast(LongType).as("med2"))

  /** MAD core over a (grp, v) frame — all-integer: median in 2× units,
    * deviations d = |2v − med2| (2× units), MAD-median in 4× units, the
    * outlier test 2d > 3·mad4 an exact integer compare. Both medians run
    * on value-distinct grains through the bucketed two-pass cumulative.
    */
  private[graft] def madOn(base: DataFrame): DataFrame =
    madOnHist(base.groupBy("grp", "v").agg(count(lit(1)).as("t")))

  /** MAD over the (grp, v, t) histogram grain directly — the
    * serve-from-state entry point (IncrementalStats.serveMad): the same
    * value-distinct histogram that serves the rank tests serves MAD, and
    * every step is exact integer arithmetic, so state-served ≡ one-shot
    * bit-for-bit.
    */
  private[graft] def madOnHist(hist0: DataFrame): DataFrame = {
    // TWO materialization barriers, not four (r17 — the verdict's
    // fixed-floor item: this row ran ~10 driver-sequenced tiny jobs and
    // 5 materializations per rep, pure scheduling wall-clock at any
    // scale). The med→dev→mad dependency chain is inherently sequential,
    // but the med and mad frames themselves need no barriers: dev
    // CARRIES med's (n, med2) through its group keys (constant per grp,
    // so the grouping — and every downstream number — is unchanged),
    // making med single-consumer, and the mad median broadcast-joins the
    // final aggregate directly, making mad single-consumer. Only the
    // frames with ≥2 consumers stay materialized: the hist (median
    // machinery + deviation rebucket) and dev (mad median + outlier
    // aggregate). Values bit-identical: same histograms, same exact
    // integer medians, same outlier predicate.
    val hist = hist0.localCheckpoint()
    val med = median2On(hist, preMaterialized = true)
    val dev = hist.join(broadcast(med), "grp")
      .groupBy(col("grp"), col("n"), col("med2"),
        abs(lit(2L) * col("v") - col("med2")).as("v"))
      .agg(sum("t").cast(LongType).as("t"))
      .localCheckpoint()
    val mad = median2On(dev.select("grp", "v", "t"), preMaterialized = true)
      .select(col("grp"), col("med2").as("mad4"))
    dev.join(broadcast(mad), "grp")
      .groupBy("grp").agg(
        max("n").as("n"),
        max("med2").as("med2"),
        max("mad4").as("mad4"),
        sum(when(lit(2L) * col("v") > lit(3L) * col("mad4"), col("t")).otherwise(0L))
          .cast(LongType).as("n_outliers"))
      .select(col("grp"), col("n"),
        (col("med2").cast(DoubleType) / 2.0).as("median"),
        (col("mad4").cast(DoubleType) / 4.0).as("mad"),
        col("n_outliers"))
      .orderBy("grp")
  }

  /** Median absolute deviation per order priority — the robust
    * dispersion/outlier statistic (Hampel's 3-MAD rule): median and MAD
    * exact via the doubled/quadrupled integer units (no float midpoint
    * averaging anywhere), outlier count from an exact integer compare.
    * Everything runs on value-distinct grains (bounded by value
    * cardinality, never rows) through the per-group bucketed two-pass
    * cumulative — the stat-family scale contract.
    */
  val statMad = QueryDef(
    "q_stat_mad",
    (s, dir) => madOn(
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("v"))),
    Some("""
      WITH base AS (
        SELECT o_orderpriority AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders),
      h AS (SELECT grp, v, COUNT(*) AS t FROM base GROUP BY grp, v),
      r AS (SELECT grp, v, t,
              COALESCE(SUM(t) OVER (PARTITION BY grp ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
              SUM(t) OVER (PARTITION BY grp) AS n
            FROM h),
      med AS (SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN cb <= (n - 1) // 2 AND (n - 1) // 2 < cb + t THEN v ELSE 0 END)
                   + SUM(CASE WHEN cb <= n // 2 AND n // 2 < cb + t THEN v ELSE 0 END) AS BIGINT) AS med2
              FROM r GROUP BY grp),
      dh AS (SELECT b.grp, ABS(2 * b.v - m.med2) AS v, COUNT(*) AS t
             FROM base b JOIN med m USING (grp) GROUP BY 1, 2),
      r2 AS (SELECT grp, v, t,
               COALESCE(SUM(t) OVER (PARTITION BY grp ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
               SUM(t) OVER (PARTITION BY grp) AS n
             FROM dh),
      mad AS (SELECT grp,
                CAST(SUM(CASE WHEN cb <= (n - 1) // 2 AND (n - 1) // 2 < cb + t THEN v ELSE 0 END)
                   + SUM(CASE WHEN cb <= n // 2 AND n // 2 < cb + t THEN v ELSE 0 END) AS BIGINT) AS mad4
              FROM r2 GROUP BY grp),
      outl AS (SELECT dh.grp,
                 CAST(SUM(CASE WHEN 2 * dh.v > 3 * mad.mad4 THEN dh.t ELSE 0 END) AS BIGINT) AS n_outliers
               FROM dh JOIN mad USING (grp) GROUP BY dh.grp)
      SELECT med.grp, med.n,
             CAST(med.med2 AS DOUBLE) / 2.0 AS median,
             CAST(mad.mad4 AS DOUBLE) / 4.0 AS mad,
             outl.n_outliers
      FROM med JOIN mad USING (grp) JOIN outl ON outl.grp = med.grp
      ORDER BY med.grp
    """.trim),
  )

  /** Equi-depth histogram core over a (v, t) value-distinct frame —
    * q_agg_histogram_eqdepth's machinery, reused by the
    * GraftFrame.equiDepthHistogram verb: bucket(v) = floor(cb·k/N) over
    * the exclusive cumulative, all exact integers.
    */
  private[graft] def eqdepthOn(vals0: DataFrame, k: Int): DataFrame = {
    // materialize the value-distinct frame ONCE (r17): the N probe and
    // the cumulative machinery both consume it, and previously each
    // re-ran the fact aggregation underneath
    val vals = vals0.localCheckpoint()
    val n = vals.agg(sum("t").cast(LongType).as("n"))
    withCumBefore(vals, Seq("t"), preMaterialized = true)
      .crossJoin(broadcast(n))
      .withColumn("bucket", expr(s"(cb_t * $k) div n"))
      .groupBy("bucket").agg(
        min("v").as("lo"), max("v").as("hi"),
        sum("t").cast(LongType).as("n_rows"),
        count(lit(1)).as("n_distinct"))
      .orderBy("bucket")
  }

  /** Two-sample distinct-value grain: input (grp, v) rows, output one row
    * per v with total count t and sample-1 count t1. The first shuffle of
    * both MW and KS.
    */
  private def twoSampleValsOn(base: DataFrame, sample1: String): DataFrame =
    base.groupBy("v").agg(
      count(lit(1)).as("t"),
      sum(when(col("grp") === sample1, 1L).otherwise(0L)).as("t1"))

  /** Mann-Whitney core over a (grp, v) frame — see q_stat_mannwhitney. */
  private[graft] def mannWhitneyOn(base: DataFrame, sample1: String): DataFrame =
    mannWhitneyOnVals(twoSampleValsOn(base, sample1))

  /** Mann-Whitney over the value-distinct grain (v, t, t1) directly —
    * the entry point for serve-from-state (IncrementalStats): the
    * histogram is the ONLY state the test needs, and every step from
    * here is exact, so state-served ≡ one-shot by arithmetic, not
    * tolerance.
    */
  private[graft] def mannWhitneyOnVals(vals: DataFrame): DataFrame = {
    val ranked = withCumBefore(vals, Seq("t"))
    ranked.agg(
        sum(col("t1")).cast(LongType).as("n1"),
        sum(col("t") - col("t1")).cast(LongType).as("n2"),
        sum(col("t1") * (lit(2L) * col("cb_t") + col("t") + 1)).cast(LongType).as("r1x2"),
        sum(col("t") * col("t") * col("t") - col("t")).cast(LongType).as("tie"))
      .withColumn("u1", (col("r1x2") - col("n1") * (col("n1") + 1)).cast(DoubleType) / lit(2.0))
      .withColumn("u2", (col("n1") * col("n2")).cast(DoubleType) - col("u1"))
      // try_divide: an empty sample (or an all-tied pooled sample) has
      // zero rank variance — the statistic is undefined and must surface
      // as NULL, not an ANSI DIVIDE_BY_ZERO crash (StatDegenerateSpec);
      // identical to plain division whenever the denominator is nonzero
      .withColumn("z", expr(
        "try_divide(u1 - cast(n1 * n2 as double) / 2.0D, " +
          "sqrt((cast(n1 as double) * cast(n2 as double) / 12.0D) * " +
          "(cast(n1 + n2 + 1 as double) - try_divide(cast(tie as double), " +
          "cast(n1 + n2 as double) * cast(n1 + n2 - 1 as double)))))"))
      .select("n1", "n2", "u1", "u2", "z")
  }

  /** KS core over a (grp, v) frame — see q_stat_ks. */
  private[graft] def ksOn(base: DataFrame, sample1: String): DataFrame =
    ksOnVals(twoSampleValsOn(base, sample1))

  /** KS over the value-distinct grain (v, t, t1) — serve-from-state
    * entry point, see mannWhitneyOnVals.
    */
  private[graft] def ksOnVals(vals0: DataFrame): DataFrame = {
    // the sample totals are moments of VALS, not of the ranked frame —
    // aggregating the materialized vals directly (r17) stops the tot
    // probe from re-running the whole bucketed-cumulative machinery
    val vals = vals0.localCheckpoint()
    val ranked = withCumBefore(vals, Seq("t", "t1"), preMaterialized = true)
      .withColumn("c1", col("cb_t1") + col("t1"))
      .withColumn("c2", col("cb_t") + col("t") - col("cb_t1") - col("t1"))
    val tot = vals.agg(sum("t1").cast(LongType).as("n1"),
      sum(col("t") - col("t1")).cast(LongType).as("n2"))
    ranked.crossJoin(broadcast(tot))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("d_num"))
      // try_divide: an empty sample (n1·n2 = 0) leaves D undefined →
      // NULL, not a crash; identical otherwise
      .withColumn("d", expr("try_divide(cast(d_num as double), cast(n1 * n2 as double))"))
      // EMPTY input (both samples absent): Spark's global agg emits one
      // all-NULL row while the oracle's GROUP BY n1, n2 emits zero rows —
      // drop it so one-shot, state-served (serveKs before batch 0), and
      // oracle all agree on the zero-row empty shape (StatDegenerateSpec)
      .filter(col("n1").isNotNull)
      .select("n1", "n2", "d_num", "d")
  }

  /** Kruskal-Wallis core over a (grp, v) frame — see q_stat_kruskal. */
  private[graft] def kruskalOn(base: DataFrame): DataFrame =
    kruskalOnHist(base.groupBy("grp", "v").agg(count(lit(1)).as("tg")))

  /** Kruskal-Wallis over the (grp, v, tg) histogram grain — the
    * serve-from-state entry point (IncrementalStats). Exact: Σtg per v
    * reproduces the row counts bit-for-bit.
    */
  private[graft] def kruskalOnHist(hist0: DataFrame): DataFrame = {
    // materialize the (grp, v, tg) hist ONCE (r17): the pooled value
    // hist and the per-group rank join both consume it, and previously
    // each re-ran the full fact aggregation underneath. Same for the
    // pooled vals (rank machinery + the N/tie moments — the moments are
    // sums over VALS, so they no longer re-run the whole cumulative),
    // and for the 5-row perGrp frame (term build + final assembly).
    val hist = hist0.localCheckpoint()
    val vals = hist.groupBy("v").agg(sum("tg").cast(LongType).as("t"))
      .localCheckpoint()
    val ranked = withCumBefore(vals, Seq("t"), preMaterialized = true)
      .withColumn("rank2", lit(2L) * col("cb_t") + col("t") + 1)
    val perGrp = hist
      .join(ranked.select("v", "rank2"), "v")
      .groupBy("grp")
      .agg(sum("tg").cast(LongType).as("n_g"),
        sum(col("tg") * col("rank2")).cast(LongType).as("rg2"))
      .localCheckpoint()
    val tot = vals.agg(sum("t").cast(LongType).as("n"),
      sum(col("t") * col("t") * col("t") - col("t")).cast(LongType).as("tie"))
    val terms = perGrp.crossJoin(broadcast(tot))
      .withColumn("term",
        round(lit(12.0) * (col("rg2").cast(DoubleType) / lit(2.0)) * (col("rg2").cast(DoubleType) / lit(2.0)) /
          (col("n_g").cast(DoubleType) * col("n").cast(DoubleType) * (col("n") + 1).cast(DoubleType)), 8)
          .cast(DecimalType(24, 8)))
    val h = terms.agg(max("n").as("n"), max("tie").as("tie"),
        sum("term").cast(DoubleType).as("s"))
      .withColumn("h", col("s") - lit(3.0) * (col("n") + 1).cast(DoubleType))
      // try_divide: an all-tied sample (tie = n³−n) or n ≤ 1 leaves the
      // correction undefined → NULL, not a crash; identical otherwise
      .withColumn("h_adj", expr(
        "try_divide(h, 1.0D - try_divide(cast(tie as double), cast(n * n * n - n as double)))"))
      .select("h", "h_adj")
    perGrp.crossJoin(broadcast(h))
      .select(col("grp"), col("n_g"),
        (col("rg2").cast(DoubleType) / lit(2.0)).as("r_g"), col("h"), col("h_adj"))
      .orderBy("grp")
  }

  /** Spearman core over an (x, y) long-column frame — see q_stat_spearman.
    * Kept in its two-separate-rank-maps shape ON MEASURED EVIDENCE (r17):
    * fusing the x/y cumulatives through a dim-tagged union was tried and
    * REGRESSED ~1.5× (3.3 s vs 2.2 s at sf0.1/32) — the union doubles the
    * hist shuffle and the fused rank frame needs its own materialization,
    * which costs more than the second (cheap, 50-distinct-value x side)
    * cumulative pass it saves. The scan side is already minimal: each
    * rank hist is a two-column parquet scan + one aggregate.
    */
  private[graft] def spearmanOn(rows: DataFrame): DataFrame = {
    val xr = withCumBefore(
      rows.groupBy(col("x").as("v")).agg(count(lit(1)).as("t")), Seq("t"))
      .select(col("v").as("x"), (lit(2L) * col("cb_t") + col("t") + 1).as("rx2"))
    val yr = withCumBefore(
      rows.groupBy(col("y").as("v")).agg(count(lit(1)).as("t")), Seq("t"))
      .select(col("v").as("y"), (lit(2L) * col("cb_t") + col("t") + 1).as("ry2"))
    val n1 = rows.agg(count(lit(1)).as("n"))
    rows.join(xr, "x").join(yr, "y")
      .crossJoin(broadcast(n1))
      .select(((col("rx2") - (col("n") + 1)).as("cx")),
        (col("ry2") - (col("n") + 1)).as("cy"), col("n"))
      .agg(max("n").as("n"),
        sum(col("cx") * col("cy")).cast(LongType).as("sxy"),
        sum(col("cx") * col("cx")).cast(LongType).as("sxx"),
        sum(col("cy") * col("cy")).cast(LongType).as("syy"))
      // try_divide: a constant column has zero rank variance → rho NULL
      // (not a crash); identical to / when sxx·syy > 0
      .withColumn("rho", expr(
        "try_divide(cast(sxy as double), sqrt(cast(sxx as double)) * sqrt(cast(syy as double)))"))
      .select("n", "sxy", "sxx", "syy", "rho")
  }

  /** Chi-square core over an (a, b) categorical frame — see q_stat_chisq. */
  private[graft] def chisqOn(base: DataFrame): DataFrame = {
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ra = base.groupBy("a").agg(count(lit(1)).as("r"))
    val cb = base.groupBy("b").agg(count(lit(1)).as("c"))
    val tot = base.agg(count(lit(1)).as("n"),
      countDistinct("a").as("nr"), countDistinct("b").as("nc"))
    cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .withColumn("dv", (col("o") * col("n") - col("r") * col("c")).cast(DoubleType))
      .withColumn("term",
        round(col("dv") * col("dv") / (col("r") * col("c") * col("n")).cast(DoubleType), 8)
          .cast(DecimalType(24, 8)))
      .agg(max("n").as("n"), max("nr").as("nr"), max("nc").as("nc"),
        sum("term").cast(DoubleType).as("chisq"))
      .withColumn("dof", ((col("nr") - 1) * (col("nc") - 1)).cast(LongType))
      .withColumn("cramers_v",
        sqrt(col("chisq") / (col("n").cast(DoubleType) * least(col("nr") - 1, col("nc") - 1).cast(DoubleType))))
      .select("n", "dof", "chisq", "cramers_v")
  }

  /** OLS core over a (grp, x, y) long-column frame — see q_stat_ols. */
  private[graft] def olsOn(base0: DataFrame): DataFrame = {
    val D38 = DecimalType(38, 0)
    val base = base0.select(col("grp"), col("x").cast(D38).as("x"), col("y").cast(D38).as("y"))
    val m = base.groupBy("grp").agg(
      count(lit(1)).cast(D38).as("n"),
      sum("x").cast(D38).as("sx"), sum("y").cast(D38).as("sy"),
      sum(col("x") * col("y")).cast(D38).as("sxy"),
      sum(col("x") * col("x")).cast(D38).as("sxx"),
      sum(col("y") * col("y")).cast(D38).as("syy"))
    m.withColumn("num", (col("n") * col("sxy") - col("sx") * col("sy")).cast(D38))
      .withColumn("den", (col("n") * col("sxx") - col("sx") * col("sx")).cast(D38))
      .withColumn("deny", (col("n") * col("syy") - col("sy") * col("sy")).cast(D38))
      .withColumn("anum", abs(col("num")))
      .withColumn("sgn", when(col("num") < 0, lit(-1L)).otherwise(lit(1L)))
      // when-guards (den/deny = 0: constant x or constant y in a group)
      // → NULL statistics, not a crash; untouched otherwise
      .withColumn("slope_e6", when(col("den") =!= 0,
        col("sgn") * expr("(anum * 1000000) div den")))
      .withColumn("inum", (col("sy") * col("den") - col("num") * col("sx")).cast(D38))
      .withColumn("intercept_e6", when(col("den") =!= 0,
        when(col("inum") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(abs(inum) * 1000000) div (n * den)")))
      .withColumn("a2", when(col("den") =!= 0, expr("anum div den")).cast(D38))
      .withColumn("rem", (col("anum") - col("a2") * col("den")).cast(D38))
      .withColumn("nsqd",
        (col("a2") * col("anum") + when(col("den") =!= 0,
          expr("(rem * anum) div den")).cast(D38)).cast(D38))
      .withColumn("r2_e6", when(col("deny") =!= 0, expr("(nsqd * 1000000) div deny")))
      .select(col("grp"), col("n").cast(LongType).as("n"),
        (col("slope_e6").cast(DoubleType) / lit(1000000.0)).as("slope"),
        (col("intercept_e6").cast(DoubleType) / lit(1000000.0)).as("intercept"),
        (col("r2_e6").cast(DoubleType) / lit(1000000.0)).as("r2"))
      .orderBy("grp")
  }

  /** Mann-Whitney U (Wilcoxon rank-sum), 'O' vs 'F' order amounts. Ranks
    * use midranks for ties, carried as rank2 = 2·avgrank = 2·cumBefore +
    * t + 1 — an exact INTEGER per distinct value — so the rank sum, the U
    * statistics, and the tie term Σ(t³−t) are all exact longs; u1/u2 are
    * halves of even/odd longs (one exact-operand IEEE division by 2.0)
    * and z is the textbook normal approximation with tie-corrected
    * variance, written as the identical double expression in both
    * engines (one sqrt). One value-distinct shuffle + the bucketed
    * cumulative: rank cost is bounded by distinct amounts, not rows.
    */
  val statMannWhitney = QueryDef(
    "q_stat_mannwhitney",
    (s, dir) => mannWhitneyOn(
      Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("O", "F"))
        .select(col("o_orderstatus").as("grp"), cents(col("o_totalprice")).as("v")),
      "O"),
    Some("""
      WITH base AS (
        SELECT o_orderstatus AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders WHERE o_orderstatus IN ('O','F')),
      vals AS (
        SELECT v, COUNT(*) AS t,
               SUM(CASE WHEN grp = 'O' THEN 1 ELSE 0 END) AS t1
        FROM base GROUP BY v),
      ranked AS (
        SELECT v, t, t1,
               COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_t
        FROM vals),
      agg AS (
        SELECT CAST(SUM(t1) AS BIGINT) AS n1,
               CAST(SUM(t - t1) AS BIGINT) AS n2,
               CAST(SUM(t1 * (2 * cb_t + t + 1)) AS BIGINT) AS r1x2,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie
        FROM ranked),
      u AS (
        SELECT n1, n2, r1x2, tie,
               CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1
        FROM agg)
      SELECT n1, n2, u1,
             CAST(n1 * n2 AS DOUBLE) - u1 AS u2,
             (u1 - CAST(n1 * n2 AS DOUBLE) / 2.0) /
             sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0) *
                  (CAST(n1 + n2 + 1 AS DOUBLE) -
                   CAST(tie AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))) AS z
      FROM u
    """.trim),
  )

  /** Two-sample Kolmogorov-Smirnov over the same 'O'/'F' amounts. The
    * statistic is computed as an exact integer: D = max_v |F1(v) − F2(v)|
    * = max_v |c1(v)·n2 − c2(v)·n1| / (n1·n2) where c1/c2 are INCLUSIVE
    * cumulative counts — the numerator and n1·n2 are exact longs, so d is
    * one exact-operand IEEE division. Same value-distinct + bucketed-
    * cumulative shape as MW: the ECDF never materializes per row.
    */
  val statKs = QueryDef(
    "q_stat_ks",
    (s, dir) => ksOn(
      Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("O", "F"))
        .select(col("o_orderstatus").as("grp"), cents(col("o_totalprice")).as("v")),
      "O"),
    Some("""
      WITH base AS (
        SELECT o_orderstatus AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders WHERE o_orderstatus IN ('O','F')),
      vals AS (
        SELECT v, COUNT(*) AS t,
               SUM(CASE WHEN grp = 'O' THEN 1 ELSE 0 END) AS t1
        FROM base GROUP BY v),
      ranked AS (
        SELECT v, t, t1,
               CAST(SUM(t1) OVER (ORDER BY v) AS BIGINT) AS c1,
               CAST(SUM(t - t1) OVER (ORDER BY v) AS BIGINT) AS c2
        FROM vals),
      tot AS (SELECT CAST(SUM(t1) AS BIGINT) AS n1, CAST(SUM(t - t1) AS BIGINT) AS n2 FROM vals)
      SELECT n1, n2,
             CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
             CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS d
      FROM ranked, tot GROUP BY n1, n2
    """.trim),
  )

  /** Kruskal-Wallis H across the five order priorities. Midranks via the
    * same integer rank2; per-group rank sums Rg2 are exact longs and
    * r_g = Rg2/2.0 is an exact half. The H sum needs per-group float
    * terms combined order-free, so each term
    * 12·R_g²/(n_g·N·(N+1)) is computed as an identical double expression
    * (Rg2 ≤ 2·N·n_g keeps the long→double cast exact at fixture scales),
    * 8dp-rounded to decimal, decimal-summed (order-free), and the total —
    * ≈3(N+1)+H, ≤15 significant digits — renders back to double exactly.
    * H = S − 3(N+1); the tie correction divides by the exact long N³−N.
    */
  val statKruskal = QueryDef(
    "q_stat_kruskal",
    (s, dir) => kruskalOn(
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("v"))),
    Some("""
      WITH base AS (
        SELECT o_orderpriority AS grp,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        FROM orders),
      vals AS (SELECT v, COUNT(*) AS t FROM base GROUP BY v),
      ranked AS (
        SELECT v, t,
               2 * COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS rank2
        FROM vals),
      pergrp AS (
        SELECT grp, CAST(SUM(tg) AS BIGINT) AS n_g, CAST(SUM(tg * rank2) AS BIGINT) AS rg2
        FROM (SELECT grp, v, COUNT(*) AS tg FROM base GROUP BY grp, v) g
        JOIN ranked USING (v) GROUP BY grp),
      tot AS (
        SELECT CAST(SUM(t) AS BIGINT) AS n,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie
        FROM vals),
      terms AS (
        SELECT grp, n_g, rg2, n, tie,
               CAST(ROUND(12.0 * (CAST(rg2 AS DOUBLE) / 2.0) * (CAST(rg2 AS DOUBLE) / 2.0) /
                          (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)), 8) AS DECIMAL(24,8)) AS term
        FROM pergrp, tot),
      hh AS (
        SELECT MAX(n) AS n, MAX(tie) AS tie, CAST(SUM(term) AS DOUBLE) AS s
        FROM terms),
      h2 AS (
        SELECT s - 3.0 * CAST(n + 1 AS DOUBLE) AS h,
               (s - 3.0 * CAST(n + 1 AS DOUBLE)) /
               (1.0 - CAST(tie AS DOUBLE) / CAST(n * n * n - n AS DOUBLE)) AS h_adj
        FROM hh)
      SELECT grp, n_g, CAST(rg2 AS DOUBLE) / 2.0 AS r_g, h, h_adj
      FROM pergrp, h2 ORDER BY grp
    """.trim),
  )

  /** Spearman rank correlation between lineitem quantity and extended
    * price. Midranks carried as integer rank2; the key exactness trick:
    * the mean of rank2 over N rows is EXACTLY N+1 (Σ rank2 = N(N+1)), so
    * centered ranks cx = rank2 − (N+1) are exact integers and the three
    * Pearson moments Σcx·cy, Σcx², Σcy² are exact longs (|cx| ≤ N keeps
    * Σ ≤ N³ within int64 an order of magnitude past sf0.1). rho is then
    * one identical double expression with two sqrt. Ranking is the
    * value-distinct shape per variable; the quantity rank map (50 rows)
    * broadcasts, the price rank map joins on its value key.
    */
  val statSpearman = QueryDef(
    "q_stat_spearman",
    (s, dir) => spearmanOn(
      Tables.lineitem(s, dir)
        .select(col("l_quantity").cast(LongType).as("x"), cents(col("l_extendedprice")).as("y"))),
    Some("""
      WITH rows_ AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM lineitem),
      xr AS (
        SELECT v AS x, 2 * COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS rx2
        FROM (SELECT x AS v, COUNT(*) AS t FROM rows_ GROUP BY x) q),
      yr AS (
        SELECT v AS y, 2 * COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS ry2
        FROM (SELECT y AS v, COUNT(*) AS t FROM rows_ GROUP BY y) q),
      nn AS (SELECT COUNT(*) AS n FROM rows_),
      cent AS (
        SELECT rx2 - (n + 1) AS cx, ry2 - (n + 1) AS cy, n
        FROM rows_ JOIN xr USING (x) JOIN yr USING (y), nn),
      agg AS (
        SELECT MAX(n) AS n,
               CAST(SUM(cx * cy) AS BIGINT) AS sxy,
               CAST(SUM(cx * cx) AS BIGINT) AS sxx,
               CAST(SUM(cy * cy) AS BIGINT) AS syy
        FROM cent)
      SELECT n, sxy, sxx, syy,
             CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))) AS rho
      FROM agg
    """.trim),
  )

  /** Chi-square test of independence over the orderstatus × orderpriority
    * contingency table. Each cell's term (O − E)²/E is algebraically
    * (O·N − r·c)²/(r·c·N): O·N − r·c and r·c·N are exact longs whose
    * double casts are exact at fixture scales, the term is an identical
    * double expression, 8dp-rounded to decimal for the order-free sum
    * over the 15 cells, and the small total renders to double exactly.
    * Cramér's V adds one sqrt on the rounded statistic. Two hash
    * aggregates (cells + margins, both broadcast); the contingency table
    * is #statuses × #priorities regardless of corpus size.
    */
  val statChisq = QueryDef(
    "q_stat_chisq",
    (s, dir) => chisqOn(
      Tables.orders(s, dir).select(col("o_orderstatus").as("a"), col("o_orderpriority").as("b"))),
    Some("""
      WITH base AS (SELECT o_orderstatus AS a, o_orderpriority AS b FROM orders),
      cells AS (SELECT a, b, COUNT(*) AS o FROM base GROUP BY a, b),
      ra AS (SELECT a, COUNT(*) AS r FROM base GROUP BY a),
      cb AS (SELECT b, COUNT(*) AS c FROM base GROUP BY b),
      tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT a) AS nr, COUNT(DISTINCT b) AS nc FROM base),
      terms AS (
        SELECT n, nr, nc,
               CAST(ROUND(CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE) /
                          CAST(r * c * n AS DOUBLE), 8) AS DECIMAL(24,8)) AS term
        FROM cells JOIN ra USING (a) JOIN cb USING (b), tot),
      agg AS (
        SELECT MAX(n) AS n, MAX(nr) AS nr, MAX(nc) AS nc,
               CAST(SUM(term) AS DOUBLE) AS chisq
        FROM terms)
      SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof, chisq,
             sqrt(chisq / (CAST(n AS DOUBLE) * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE))) AS cramers_v
      FROM agg
    """.trim),
  )

  /** Per-priority OLS regression of order value (cents) on basket size
    * (lineitem count per order) — slope = marginal cents per additional
    * line item. ZERO float ops until display: the five moments are exact
    * DECIMAL(38,0) sums; num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)²,
    * deny = n·Σy² − (Σy)² are exact decimals; slope/intercept/r² are
    * produced by exact integer division at 1e6 scale on NON-NEGATIVE
    * operands (sign reapplied), so Spark `div` and DuckDB `//` agree by
    * construction. r² = num²/(den·deny) decomposes as
    * floor(num²/den) = a2·|num| + floor(rem·|num|/den) (a2 = |num| div
    * den, rem = |num| − a2·den — exact because num² = (a2·den+rem)·|num|),
    * keeping every `div` quotient within int64 while DuckDB mirrors it
    * with plain HUGEINT floor division — identical results since the
    * decomposition is exact. Final display columns are scaled-int / 1e6
    * — one exact-operand IEEE division each (the changepoint recipe).
    * One join shuffle (basket size onto orders) + one hash aggregate.
    */
  val statOls = QueryDef(
    "q_stat_ols",
    (s, dir) => {
      val nx = Tables.lineitem(s, dir).groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x"))
      olsOn(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("y"))
        .join(nx, "o_orderkey")
        .select(col("grp"), col("x"), col("y")))
    },
    Some("""
      WITH nx AS (SELECT l_orderkey AS o_orderkey, COUNT(*) AS x FROM lineitem GROUP BY l_orderkey),
      base AS (
        SELECT o_orderpriority AS grp, CAST(x AS HUGEINT) AS x,
               CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT) AS y
        FROM orders JOIN nx USING (o_orderkey)),
      m AS (
        SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy
        FROM base GROUP BY grp),
      d AS (
        SELECT grp, n,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS den,
               n * syy - sy * sy AS deny,
               sy, sx
        FROM m),
      e AS (
        SELECT grp, n, num, den, deny,
               CASE WHEN num < 0 THEN -1 ELSE 1 END * ((abs(num) * 1000000) // den) AS slope_e6,
               CASE WHEN sy * den - num * sx < 0 THEN -1 ELSE 1 END *
                 ((abs(sy * den - num * sx) * 1000000) // (n * den)) AS intercept_e6,
               (((abs(num) // den) * abs(num) +
                 ((abs(num) - (abs(num) // den) * den) * abs(num)) // den) * 1000000) // deny AS r2_e6
        FROM d)
      SELECT grp, CAST(n AS BIGINT) AS n,
             CAST(slope_e6 AS DOUBLE) / 1000000.0 AS slope,
             CAST(intercept_e6 AS DOUBLE) / 1000000.0 AS intercept,
             CAST(r2_e6 AS DOUBLE) / 1000000.0 AS r2
      FROM e ORDER BY grp
    """.trim),
  )

  /** Welch t-test core over a (grp, v) long frame with exactly two group
    * values — see q_stat_ttest. Per-group exact moments (n, Σv, Σv² in
    * D38); a_g = se² component ·1e6 and dm_e6 = mean-diff ·1e6 come from
    * exact integer division on non-negative operands (sign reapplied) so
    * Spark `div` and DuckDB `//` agree by construction; the quotients fit
    * int64/2^53 by the magnitude audit in the registration scaladoc. t
    * and the Welch–Satterthwaite df are then identical double expressions
    * over those exactly-cast longs (+,·,/, one sqrt — all IEEE
    * correctly rounded).
    */
  private[graft] def ttestOn(base: DataFrame, sample1: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    ttestFromMoments(base
      .withColumn("g", when(col("grp") === sample1, lit(1)).otherwise(lit(2)))
      .groupBy("g").agg(
        count(lit(1)).cast(D38).as("n"),
        sum(col("v").cast(D38)).as("s"),
        sum((col("v").cast(D38) * col("v").cast(D38))).as("ss")))
  }

  /** Welch t-test over the (grp, v, t) histogram grain — serve-from-
    * state entry point: the three moments are exact Σt, Σt·v, Σt·v², so
    * histogram-served ≡ row-aggregated bit-for-bit.
    */
  private[graft] def ttestOnHist(hist: DataFrame, sample1: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    ttestFromMoments(hist
      .withColumn("g", when(col("grp") === sample1, lit(1)).otherwise(lit(2)))
      .groupBy("g").agg(
        sum(col("t").cast(D38)).cast(D38).as("n"),
        sum(col("t").cast(D38) * col("v").cast(D38)).cast(D38).as("s"),
        sum(col("t").cast(D38) * col("v").cast(D38) * col("v").cast(D38)).cast(D38).as("ss")))
  }

  /** Shared Welch closed form over the 2-row (g, n, s, ss) moment frame. */
  private def ttestFromMoments(m0: DataFrame): DataFrame = {
    val D38 = DecimalType(38, 0)
    val m = m0
      .withColumn("vnum", (col("n") * col("ss") - col("s") * col("s")).cast(D38))
      // a = floor(1e6 · vnum / (n·(n−1)·n)) — exact, identical floor both
      // engines; when-guard: a single-row sample has no variance → NULL
      // (StatDegenerateSpec), untouched otherwise
      .withColumn("a", when(col("n") > 1,
        expr("(vnum * 1000000) div (n * (n - 1) * n)")))
    val one = m.filter(col("g") === 1).select(
      col("n").cast(LongType).as("n1"), col("s").as("s1"), col("a").as("a1"))
    val two = m.filter(col("g") === 2).select(
      col("n").cast(LongType).as("n2"), col("s").as("s2"), col("a").as("a2"))
    one.crossJoin(broadcast(two))
      .withColumn("dnum", (col("s1") * col("n2") - col("s2") * col("n1")).cast(D38))
      .withColumn("dm_e6",
        when(col("dnum") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(abs(dnum) * 1000000) div (cast(n1 as decimal(38,0)) * n2)"))
      .withColumn("se", sqrt((col("a1") + col("a2")).cast(DoubleType) / lit(1000000.0)))
      .withColumn("mean_diff", col("dm_e6").cast(DoubleType) / lit(1000000.0))
      // try_divide: two zero-variance samples (se = 0) leave t/df
      // undefined → NULL, not a crash; identical when variances exist
      .withColumn("t", expr("try_divide(mean_diff, se)"))
      .withColumn("df", expr(
        "try_divide(cast(a1 + a2 as double) * cast(a1 + a2 as double), " +
          "try_divide(cast(a1 as double) * cast(a1 as double), cast(n1 - 1 as double)) + " +
          "try_divide(cast(a2 as double) * cast(a2 as double), cast(n2 - 1 as double)))"))
      .select("n1", "n2", "mean_diff", "t", "df")
  }

  /** One-way ANOVA core over a (grp, v) long frame — see q_stat_anova.
    * The statistic is DEFINED on floored sums of squares so every
    * intermediate is an exact integer: floor(s²/n) is decomposed as
    * q·s + floor(r·s/n) with q = s div n, r = s − q·n (exact since
    * s² = (q·n + r)·s), which keeps each `div` QUOTIENT within int64
    * while the decimal terms live in D38. T = Σ_g floor(s_g²/n_g),
    * SSN = floor(S²/N), SSB = T − SSN, SSW = Σv² − T; F and η² are
    * 1e6-scaled exact integer divisions rendered by one exact-operand
    * IEEE division each.
    */
  private[graft] def anovaOn(base: DataFrame): DataFrame = {
    val D38 = DecimalType(38, 0)
    anovaFromGroupMoments(base.groupBy("grp").agg(
      count(lit(1)).cast(D38).as("ng"),
      sum(col("v").cast(D38)).as("sg"),
      sum(col("v").cast(D38) * col("v").cast(D38)).as("ssg")))
  }

  /** One-way ANOVA over the (grp, v, t) histogram grain — serve-from-
    * state entry point; see ttestOnHist for the exactness argument.
    */
  private[graft] def anovaOnHist(hist: DataFrame): DataFrame = {
    val D38 = DecimalType(38, 0)
    anovaFromGroupMoments(hist.groupBy("grp").agg(
      sum(col("t").cast(D38)).cast(D38).as("ng"),
      sum(col("t").cast(D38) * col("v").cast(D38)).cast(D38).as("sg"),
      sum(col("t").cast(D38) * col("v").cast(D38) * col("v").cast(D38)).cast(D38).as("ssg")))
  }

  /** Shared floored-SS ANOVA closed form over (grp, ng, sg, ssg). */
  private def anovaFromGroupMoments(g: DataFrame): DataFrame = {
    val D38 = DecimalType(38, 0)
    def floorSqDiv(s: String, n: String) =
      // floor(s²/n) with int64-bounded quotients; operands non-negative
      expr(s"($s div $n) * $s + (($s - ($s div $n) * $n) * $s) div $n").cast(D38)
    val agg = g.agg(
      count(lit(1)).cast(LongType).as("k"),
      sum("ng").cast(D38).as("n"),
      sum("sg").cast(D38).as("s"),
      sum("ssg").cast(D38).as("ssq"),
      sum(floorSqDiv("sg", "ng")).cast(D38).as("t"))
    agg
      .withColumn("ssn", floorSqDiv("s", "n"))
      .withColumn("ssb", (col("t") - col("ssn")).cast(D38))
      .withColumn("ssw", (col("ssq") - col("t")).cast(D38))
      // when-guards: zero within-group variance (SSW = 0) or a single
      // group (k = 1) or zero total variance leave F/η² undefined →
      // NULL, not an ANSI DIVIDE_BY_ZERO crash (StatDegenerateSpec);
      // the guarded branch is untouched on non-degenerate input
      .withColumn("f_e6",
        when(col("k") > 1 && col("ssw") =!= 0,
          expr("(ssb * (n - k) * 1000000) div (ssw * (k - 1))")))
      .withColumn("eta2_e6",
        when((col("ssq") - col("ssn")) =!= 0,
          expr("(ssb * 1000000) div (ssq - ssn)")))
      .select(col("k"), col("n").cast(LongType).as("n"),
        (col("f_e6").cast(DoubleType) / lit(1000000.0)).as("f"),
        (col("eta2_e6").cast(DoubleType) / lit(1000000.0)).as("eta2"))
  }

  /** Kaplan-Meier core over a per-subject (dur, event) frame (dur: long
    * duration grain, event: 1 = observed terminal event, 0 = right-
    * censored) — see q_stat_survival. The life table is exact integers
    * (n_risk via the bucketed cumulative, never a per-row ECDF); the
    * survival curve is carried in LOG2 space: each factor
    * log2((n_r − d)/n_r) is one exactly-cast-operand IEEE division and a
    * libm log2 masked by the house 8dp rounding (the entropy recipe), and
    * the running sum over event times is an order-FIXED decimal window on
    * the ≤|distinct durations| life-table frame.
    */
  private[graft] def kaplanMeierOn(subjects: DataFrame): DataFrame = {
    val vals = subjects.groupBy(col("dur").as("v")).agg(
      sum(col("event")).as("d"),
      sum(lit(1L) - col("event")).as("c"))
    val n = subjects.agg(count(lit(1)).cast(LongType).as("n"))
    val lifeTable = withCumBefore(vals, Seq("d", "c"))
      .crossJoin(broadcast(n))
      .withColumn("n_risk", col("n") - col("cb_d") - col("cb_c"))
      .filter(col("d") > 0)
      .withColumn("term",
        round(log2((col("n_risk") - col("d")).cast(DoubleType) / col("n_risk").cast(DoubleType)), 8)
          .cast(DecimalType(24, 8)))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    lifeTable
      .withColumn("log2_surv", sum(col("term")).over(w).cast(DoubleType))
      .select(col("v").as("dur"), col("n_risk"),
        col("d").as("n_event"), col("c").as("n_censor"), col("log2_surv"))
      .orderBy("dur")
  }

  /** Welch two-sample t-test on customer account balance (cents),
    * BUILDING vs MACHINERY market segments. Magnitude audit at sf0.1
    * (the binding scale): n_g ≈ 3·10³, Σv ≈ 1.4·10⁹, Σv² ≈ 9.5·10¹⁴ —
    * vnum = n·Σv² − (Σv)² ≈ 2.8·10¹⁸ exact in D38; the div quotients
    * a_g = 1e6·var_g/n_g ≈ 10¹⁴ and dm_e6 ≈ 7·10⁹ are inside int64 AND
    * 2^53, so their double casts are exact. One hash aggregate to the
    * 2-row moment frame; everything after is driver-free scalar algebra
    * on a 1-row crossJoin of broadcast 1-row frames.
    */
  val statTtest = QueryDef(
    "q_stat_ttest",
    (s, dir) => ttestOn(
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("grp"), cents(col("c_acctbal")).as("v")),
      "BUILDING"),
    Some("""
      WITH base AS (
        SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 2 END AS g,
               CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT) AS v
        FROM customer WHERE c_mktsegment IN ('BUILDING','MACHINERY')),
      m AS (
        SELECT g, CAST(COUNT(*) AS HUGEINT) AS n, SUM(v) AS s, SUM(v * v) AS ss
        FROM base GROUP BY g),
      a AS (
        SELECT g, n, s,
               ((n * ss - s * s) * 1000000) // (n * (n - 1) * n) AS a
        FROM m),
      j AS (
        SELECT m1.n AS n1, m2.n AS n2, m1.s AS s1, m2.s AS s2, m1.a AS a1, m2.a AS a2
        FROM (SELECT * FROM a WHERE g = 1) m1, (SELECT * FROM a WHERE g = 2) m2),
      e AS (
        SELECT n1, n2, a1, a2,
               CASE WHEN s1 * n2 - s2 * n1 < 0 THEN -1 ELSE 1 END *
                 ((abs(s1 * n2 - s2 * n1) * 1000000) // (n1 * n2)) AS dm_e6
        FROM j)
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(dm_e6 AS DOUBLE) / 1000000.0 AS mean_diff,
             (CAST(dm_e6 AS DOUBLE) / 1000000.0) /
               sqrt(CAST(a1 + a2 AS DOUBLE) / 1000000.0) AS t,
             (CAST(a1 + a2 AS DOUBLE) * CAST(a1 + a2 AS DOUBLE)) /
               (CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE) / CAST(n1 - 1 AS DOUBLE) +
                CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE) / CAST(n2 - 1 AS DOUBLE)) AS df
      FROM e
    """.trim),
  )

  /** One-way ANOVA of order value (cents) across the five order
    * priorities. Floored-SS definition (see anovaOn): at sf0.1 the
    * decomposition's div quotients are q = s_g div n_g ≈ 2.5·10⁷ and
    * floor(r·s_g/n_g) < s_g ≈ 7.5·10¹¹ — both comfortably int64 — while
    * the D38 terms reach only ~10¹⁹ against the 10³⁸ ceiling; another
    * 1000× of data still fits. One hash aggregate per grain (group, then
    * global); F and η² render from ≤1e6-ish scaled longs.
    */
  val statAnova = QueryDef(
    "q_stat_anova",
    (s, dir) => anovaOn(
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("v"))),
    Some("""
      WITH base AS (
        SELECT o_orderpriority AS grp,
               CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS HUGEINT) AS v
        FROM orders),
      g AS (
        SELECT grp, CAST(COUNT(*) AS HUGEINT) AS ng, SUM(v) AS sg, SUM(v * v) AS ssg
        FROM base GROUP BY grp),
      agg AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(ng) AS n, SUM(sg) AS s, SUM(ssg) AS ssq,
               SUM((sg // ng) * sg + ((sg - (sg // ng) * ng) * sg) // ng) AS t
        FROM g),
      e AS (
        SELECT k, n, ssq, t,
               (s // n) * s + ((s - (s // n) * n) * s) // n AS ssn
        FROM agg),
      f AS (
        SELECT k, n, t - ssn AS ssb, ssq - t AS ssw, ssq - ssn AS sst
        FROM e)
      SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
             CAST((ssb * (n - k) * 1000000) // (ssw * (k - 1)) AS DOUBLE) / 1000000.0 AS f,
             CAST((ssb * 1000000) // sst AS DOUBLE) / 1000000.0 AS eta2
      FROM f
    """.trim),
  )

  /** Kaplan-Meier churn survival over the events stream: a user's
    * lifetime runs from first to last activity hour; users whose last
    * activity is more than 24 h before the corpus end are CHURNED
    * (observed event), the rest right-censored. Hour grain =
    * epoch_us div 3.6e9, floor on positive operands both engines. The
    * life table (n_risk / n_event / n_censor per churn duration) is
    * exact integers; log2-survival accumulates 8dp-rounded factors in an
    * order-fixed decimal window over the ≤720-row duration frame. One
    * user aggregate + one tiny duration aggregate; nothing per-event
    * survives the first shuffle.
    */
  val statSurvival = QueryDef(
    "q_stat_survival",
    (s, dir) => {
      val hours = Tables.events(s, dir)
        .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      val u = hours.groupBy("user_id").agg(min("h").as("fh"), max("h").as("lh"))
      val m = u.agg(max("lh").as("mh"))
      kaplanMeierOn(
        u.crossJoin(broadcast(m))
          .select((col("lh") - col("fh")).as("dur"),
            when(col("mh") - col("lh") > 24, 1L).otherwise(0L).as("event")))
    },
    Some("""
      WITH hours AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h FROM events),
      u AS (SELECT user_id, MIN(h) AS fh, MAX(h) AS lh FROM hours GROUP BY user_id),
      m AS (SELECT MAX(lh) AS mh FROM u),
      subj AS (
        SELECT lh - fh AS dur,
               CASE WHEN mh - lh > 24 THEN 1 ELSE 0 END AS event
        FROM u, m),
      vals AS (
        SELECT dur AS v, CAST(SUM(event) AS BIGINT) AS d,
               CAST(SUM(1 - event) AS BIGINT) AS c
        FROM subj GROUP BY dur),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subj),
      lt AS (
        SELECT v, d, c,
               CAST(n - COALESCE(SUM(d + c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        FROM vals, nn),
      ev AS (
        SELECT v, d, c, n_risk,
               CAST(ROUND(log2(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 8) AS DECIMAL(24,8)) AS term
        FROM lt WHERE d > 0)
      SELECT v AS dur, n_risk, d AS n_event, c AS n_censor,
             CAST(SUM(term) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS log2_surv
      FROM ev ORDER BY dur
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(statMannWhitney, statKs, statKruskal,
    statSpearman, statChisq, statOls, statTtest, statAnova, statSurvival, statMad)
}
