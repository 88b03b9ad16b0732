package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Further operator coverage: value window functions, lateral joins, bag
  * set-ops, and collect aggregation (scalarized for oracle stability).
  */
object MoreQueries {

  /** first_value / last_value / nth_value with explicit frames. */
  val winFirstLast = QueryDef(
    "q_win_firstlast",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(asc("o_totalprice"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          first("o_totalprice").over(w).as("cheapest"),
          last("o_totalprice").over(w).as("priciest"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_cheapest"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             FIRST_VALUE(o_totalprice) OVER w AS cheapest,
             LAST_VALUE(o_totalprice) OVER w AS priciest,
             NTH_VALUE(o_totalprice, 2) OVER w AS second_cheapest
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey
    """.trim),
  )

  /** Lateral (correlated derived-table) join: each customer's two most
    * expensive orders, via the SQL path.
    */
  val joinLateral = QueryDef(
    "q_join_lateral",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_lat_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_lat_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM graft_lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM graft_lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
        ORDER BY c_custkey, o_orderkey
      """)
    },
    Some("""
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
      ORDER BY c_custkey, o_orderkey
    """.trim),
  )

  private def tierKeys(s: org.apache.spark.sql.SparkSession, dir: String, lo: Double) =
    Tables.orders(s, dir).filter(col("o_totalprice") > lo).select(col("o_custkey").as("custkey"))

  /** Bag intersection: multiplicity = min of the two sides' counts. */
  val setIntersectAll = QueryDef(
    "q_set_intersect_all",
    (s, dir) => tierKeys(s, dir, 100000.0).intersectAll(tierKeys(s, dir, 200000.0)).orderBy("custkey"),
    Some("""
      SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000.0
        INTERSECT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
      ) ORDER BY custkey
    """.trim),
  )

  /** Bag difference: multiplicity = left count − right count. */
  val setExceptAll = QueryDef(
    "q_set_except_all",
    (s, dir) => tierKeys(s, dir, 100000.0).exceptAll(tierKeys(s, dir, 200000.0)).orderBy("custkey"),
    Some("""
      SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000.0
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
      ) ORDER BY custkey
    """.trim),
  )

  /** Collect aggregation, scalarized: sorted collect_list/collect_set
    * reduced to joined strings and counts so the oracle compare stays
    * type-simple (array column parity is fragile).
    */
  val aggCollect = QueryDef(
    "q_agg_collect",
    (s, dir) =>
      Tables.nation(s, dir)
        .groupBy("n_regionkey")
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), ",").as("nations_csv"),
          size(collect_set(col("n_name"))).as("n_distinct"))
        .orderBy("n_regionkey"),
    Some("""
      SELECT n_regionkey,
             string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
             CAST(COUNT(DISTINCT n_name) AS INTEGER) AS n_distinct
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """.trim),
  )

  /** Bloom-filter pre-filtering (sketch family, next to HLL): build a
    * 4096-bit / 5-hash bloom filter over BUILDING-segment custkeys as a
    * 66-row (63-bit word, bits) bitmap via bit_or aggregation, probe every order
    * with a broadcast join. At scale this is the semi-join pre-filter that
    * skips shuffling rows that cannot match. Hashing is plain multiplicative
    * arithmetic (not an engine-specific hash), so the entire sketch —
    * including its false positives — is bit-reproducible in DuckDB and
    * oracle-checked. fp rate here ≈ (set bits / m)^5 ≈ 0.7 %.
    */
  val sketchBloom = QueryDef(
    "q_sketch_bloom",
    (s, dir) => {
      val seeds = explode(array((0 until 5).map(lit(_)): _*)).as("i")
      def pos(key: Column) =
        // idMod first: key * ~2^31 overflows int64 on wide-strided ids
        ((graft.functions.PortableHash.idMod(key)
          * (lit(2654435761L) + lit(40503L) * col("i")) + col("i") * lit(97L))
          % lit(2147483647L)) % lit(4096L)
      val bitmap = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"), seeds)
        .withColumn("p", pos(col("key")))
        .select(expr("p div 63").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("bit"))
        .groupBy("w").agg(expr("bit_or(bit)").as("bits"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("key"), seeds)
        .withColumn("p", pos(col("key")))
        .withColumn("pw", expr("p div 63"))
        .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))"))
        .join(broadcast(bitmap), col("pw") === col("w"), "left")
        .groupBy("o_orderkey")
        .agg(expr("bool_and(bits IS NOT NULL AND (bits & bit) != 0)").as("maybe_building"))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH seeds AS (SELECT unnest([0, 1, 2, 3, 4]) AS i),
      build AS (
        SELECT (p // 63) AS w,
               bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS bits
        FROM (SELECT (((c_custkey % 2147483647) * (2654435761 + 40503*i) + i*97) % 2147483647) % 4096 AS p
              FROM customer CROSS JOIN seeds WHERE c_mktsegment = 'BUILDING')
        GROUP BY 1),
      probe AS (
        SELECT o_orderkey,
               (((o_custkey % 2147483647) * (2654435761 + 40503*i) + i*97) % 2147483647) % 4096 AS p
        FROM orders CROSS JOIN seeds)
      SELECT o_orderkey,
             bool_and(b.bits IS NOT NULL
               AND (b.bits & (CAST(1 AS BIGINT) << CAST(pr.p % 63 AS INTEGER))) != 0) AS maybe_building
      FROM probe pr LEFT JOIN build b ON (pr.p // 63) = b.w
      GROUP BY o_orderkey
      ORDER BY o_orderkey
    """.trim),
  )

  /** Count-min sketch (sketch family, next to the bloom filter): a 4×512
    * counter matrix over event user_ids; every user's frequency estimate
    * is the min of its 4 counters. The sketch is the mergeable
    * heavy-hitter structure for 100 TB streams: the (depth, bucket) count
    * table merges across partitions/days by elementwise SUM (it is itself
    * just a groupBy-count, so Spark's partial aggregation IS the sketch
    * merge), size is fixed (2048 longs) regardless of key cardinality,
    * and estimates never undercount — est ≥ true always, est ≤ true +
    * εN with prob ≥ 1−(1/2)^4 for ε = 2/512 (CmsSpec pins both bounds).
    * Like q_sketch_bloom the hash family is plain multiplicative
    * arithmetic, so the whole sketch INCLUDING its collisions is
    * bit-reproducible in DuckDB and the estimates are oracle-checked —
    * rare for a sketch operator.
    */
  val sketchCms = QueryDef(
    "q_sketch_cms",
    (s, dir) => {
      val seeds = explode(array((0 until 4).map(lit(_)): _*)).as("d")
      def pos(key: Column) =
        ((graft.functions.PortableHash.idMod(key)
          * (lit(2654435761L) + lit(40503L) * col("d")) + col("d") * lit(97L))
          % lit(2147483647L)) % lit(512L)
      val ev = Tables.events(s, dir).select(col("user_id"))
      val sketch = ev.select(col("user_id"), seeds)
        .withColumn("b", pos(col("user_id")))
        .groupBy("d", "b").agg(count(lit(1)).as("cnt"))
      val truth = ev.groupBy("user_id").agg(count(lit(1)).as("true_n"))
      truth.select(col("user_id"), col("true_n"), seeds)
        .withColumn("b", pos(col("user_id")))
        .join(broadcast(sketch), Seq("d", "b"))
        .groupBy("user_id", "true_n").agg(min("cnt").as("est_n"))
        .select(col("user_id"), col("true_n"), col("est_n"),
          (col("est_n") - col("true_n")).as("overcount"))
        .orderBy("user_id")
    },
    Some("""
      WITH ds AS (SELECT unnest(range(4)) AS d),
      r AS (SELECT user_id, d,
              (((user_id % 2147483647) * (2654435761 + 40503 * d) + d * 97) % 2147483647) % 512 AS b
            FROM events CROSS JOIN ds),
      sketch AS (SELECT d, b, COUNT(*) AS cnt FROM r GROUP BY d, b),
      truth AS (SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id),
      probes AS (SELECT user_id, true_n, d,
              (((user_id % 2147483647) * (2654435761 + 40503 * d) + d * 97) % 2147483647) % 512 AS b
            FROM truth CROSS JOIN ds)
      SELECT p.user_id, p.true_n, MIN(s.cnt) AS est_n, MIN(s.cnt) - p.true_n AS overcount
      FROM probes p JOIN sketch s USING (d, b)
      GROUP BY p.user_id, p.true_n
      ORDER BY user_id
    """.trim),
  )

  /** Mergeable t-digest quantile sketch per event type (δ=100): p50/p95/
    * p99 estimates from bounded centroid digests — the quantile member of
    * the sketch family (bloom / CMS / HLL). Each (group × partition)
    * ships a few-KB digest, partials merge associatively map-side; no
    * hash oracle (estimates are merge-order-dependent like HLL) —
    * SketchSpec bounds rank error vs exact percentiles and partitioning
    * drift.
    */
  val sketchQuantile = QueryDef(
    "q_sketch_quantile",
    (s, dir) => {
      val tdigest = udaf(new graft.functions.TDigestSketch(100, Seq(0.5, 0.95, 0.99)))
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(tdigest(col("value")).as("qs"))
        .select(col("event_type"),
          col("qs").getItem(0).as("p50_est"),
          col("qs").getItem(1).as("p95_est"),
          col("qs").getItem(2).as("p99_est"))
        // count-visible gate: count() needs only group cardinality, so
        // column pruning would drop the digest UDAF itself (34× under
        // count, PERF §r13.4)
        .transform(graft.QueryDef.countGate(_, "p50_est", "p95_est", "p99_est"))
        .orderBy("event_type")
    },
    None,
  )

  /** Data-quality audit — the rule-based validation gate a pipeline runs
    * before promoting a snapshot: referential integrity (lineitem rows
    * whose order key has no order — one anti-join), domain ranges
    * (quantity/discount bounds — scan-side predicates), null checks, and
    * primary-key uniqueness (orders keys seen more than once — one
    * aggregate). Each rule reduces to a single count, so the whole audit
    * is a handful of linear passes unioned into a #rules-row report —
    * nothing here grows with the data except the scans themselves, and
    * every rule is independently parallelizable. The report shape (rule,
    * n_violations, n_checked) is what a quality dashboard consumes.
    */
  val dqAudit = QueryDef(
    "q_dq_audit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      def rule(name: String, violations: Column, checked: Column, src: org.apache.spark.sql.DataFrame) =
        src.agg(coalesce(sum(when(violations, 1L).otherwise(0L)), lit(0L)).as("n_violations"),
            coalesce(sum(when(checked, 1L).otherwise(0L)), lit(0L)).as("n_checked"))
          .select(lit(name).as("rule"), col("n_violations"), col("n_checked"))
      val fkOrphans = li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_lineitem_orderkey").as("rule"), col("n_violations"),
          lit(null).cast(LongType).as("n_checked"))
        // n_checked for the FK rule is the full lineitem row count
        .crossJoin(li.agg(count(lit(1)).as("nc")))
        .select(col("rule"), col("n_violations"), col("nc").as("n_checked"))
      val qtyRange = rule("range_l_quantity_1_50",
        col("l_quantity") < 1 || col("l_quantity") > 50, lit(true), li)
      val discRange = rule("range_l_discount_0_1",
        col("l_discount") < 0 || col("l_discount") > 1, lit(true), li)
      val priceNull = rule("notnull_o_totalprice", col("o_totalprice").isNull, lit(true), o)
      val pkDup = o.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(when(col("n") > 1, 1L).otherwise(0L)), lit(0L)).as("n_violations"),
          count(lit(1)).as("n_checked"))
        .select(lit("unique_o_orderkey").as("rule"), col("n_violations"), col("n_checked"))
      fkOrphans.unionAll(qtyRange).unionAll(discRange).unionAll(priceNull).unionAll(pkDup)
        .orderBy("rule")
    },
    Some("""
      SELECT 'fk_lineitem_orderkey' AS rule,
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
             (SELECT COUNT(*) FROM lineitem) AS n_checked
      UNION ALL
      SELECT 'range_l_quantity_1_50',
             (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50),
             (SELECT COUNT(*) FROM lineitem)
      UNION ALL
      SELECT 'range_l_discount_0_1',
             (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1),
             (SELECT COUNT(*) FROM lineitem)
      UNION ALL
      SELECT 'notnull_o_totalprice',
             (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL),
             (SELECT COUNT(*) FROM orders)
      UNION ALL
      SELECT 'unique_o_orderkey',
             (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)),
             (SELECT COUNT(DISTINCT o_orderkey) FROM orders)
      ORDER BY rule
    """.trim),
  )

  /** HLL sketch set operations — the mergeable-sketch discipline at its
    * most load-bearing: two overlapping id sets are sketched
    * INDEPENDENTLY (hll_sketch_agg, lgK=12, a Datasketches HLL whose
    * register state is an order-free max-merge — partition- and
    * batch-split-invariant by construction), their union cardinality
    * comes from hll_union of the two sketches, and the intersection from
    * inclusion-exclusion — never from rescanning either side. This is
    * how a 100 TB dedup/reach pipeline answers "how many distinct across
    * these N corpus slices" with one tiny sketch per slice: slices
    * sketch once at ingest, every later set-algebra question is
    * register-level arithmetic. Non-oracle by declaration (the sketch
    * hash family is engine-specific); ApproxOpsSpec bounds the estimates
    * against exact counts (lgK=12 → ~1.6% standard error).
    */
  val sketchHllSetops = QueryDef(
    "q_sketch_hll_setops",
    (s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
      val a = ids.filter(col("doc_id") % 3 =!= 0)
        .agg(expr("hll_sketch_agg(doc_id, 12)").as("sk_a"))
      val b = ids.filter(col("doc_id") % 2 === 0)
        .agg(expr("hll_sketch_agg(doc_id, 12)").as("sk_b"))
      a.crossJoin(b)
        .select(
          expr("hll_sketch_estimate(sk_a)").as("est_a"),
          expr("hll_sketch_estimate(sk_b)").as("est_b"),
          expr("hll_sketch_estimate(hll_union(sk_a, sk_b))").as("est_union"))
        .withColumn("est_intersect",
          col("est_a") + col("est_b") - col("est_union"))
    },
    None, // sketch hash family is engine-specific — accuracy spec instead
  )

  /** Column-profile audit over orders — the "describe my table" primitive
    * a pipeline runs before trusting a new corpus drop: per column, row
    * count, nulls, exact distinct count, and min/max (numeric columns in
    * a DOUBLE lane, string columns in a STRING lane — never a
    * cross-engine number-to-string format). ONE aggregate computes every
    * stat (Spark expands the multi-countDistinct into one shuffle); the
    * per-column rows are a constant-width unpivot of that single row, so
    * the whole profile is one corpus pass at any scale.
    */
  val dqProfile = QueryDef(
    "q_dq_profile",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val agg = o.agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("nn_ok"),
        countDistinct(col("o_orderkey")).as("nd_ok"),
        min(col("o_orderkey")).cast(DoubleType).as("mn_ok"),
        max(col("o_orderkey")).cast(DoubleType).as("mx_ok"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn_ck"),
        countDistinct(col("o_custkey")).as("nd_ck"),
        min(col("o_custkey")).cast(DoubleType).as("mn_ck"),
        max(col("o_custkey")).cast(DoubleType).as("mx_ck"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nn_tp"),
        countDistinct(col("o_totalprice")).as("nd_tp"),
        min(col("o_totalprice")).as("mn_tp"),
        max(col("o_totalprice")).as("mx_tp"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("nn_st"),
        countDistinct(col("o_orderstatus")).as("nd_st"),
        min(col("o_orderstatus")).as("mn_st"),
        max(col("o_orderstatus")).as("mx_st"))
      def numRow(name: String, sfx: String) = agg.select(
        lit(name).as("col_name"), col("n"), col(s"nn_$sfx").as("n_null"),
        col(s"nd_$sfx").as("n_distinct"),
        col(s"mn_$sfx").as("min_num"), col(s"mx_$sfx").as("max_num"),
        lit(null).cast(StringType).as("min_str"), lit(null).cast(StringType).as("max_str"))
      val strRow = agg.select(
        lit("o_orderstatus").as("col_name"), col("n"), col("nn_st").as("n_null"),
        col("nd_st").as("n_distinct"),
        lit(null).cast(DoubleType).as("min_num"), lit(null).cast(DoubleType).as("max_num"),
        col("mn_st").as("min_str"), col("mx_st").as("max_str"))
      numRow("o_orderkey", "ok").unionAll(numRow("o_custkey", "ck"))
        .unionAll(numRow("o_totalprice", "tp")).unionAll(strRow)
        .orderBy("col_name")
    },
    Some("""
      WITH a AS (
        SELECT count(*) AS n,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ok,
               count(DISTINCT o_orderkey) AS nd_ok,
               CAST(min(o_orderkey) AS DOUBLE) AS mn_ok, CAST(max(o_orderkey) AS DOUBLE) AS mx_ok,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_ck,
               count(DISTINCT o_custkey) AS nd_ck,
               CAST(min(o_custkey) AS DOUBLE) AS mn_ck, CAST(max(o_custkey) AS DOUBLE) AS mx_ck,
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_tp,
               count(DISTINCT o_totalprice) AS nd_tp,
               min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp,
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_st,
               count(DISTINCT o_orderstatus) AS nd_st,
               min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st
        FROM orders)
      SELECT 'o_orderkey' AS col_name, n, nn_ok AS n_null, nd_ok AS n_distinct,
             mn_ok AS min_num, mx_ok AS max_num, NULL AS min_str, NULL AS max_str FROM a
      UNION ALL
      SELECT 'o_custkey', n, nn_ck, nd_ck, mn_ck, mx_ck, NULL, NULL FROM a
      UNION ALL
      SELECT 'o_totalprice', n, nn_tp, nd_tp, mn_tp, mx_tp, NULL, NULL FROM a
      UNION ALL
      SELECT 'o_orderstatus', n, nn_st, nd_st, NULL, NULL, mn_st, mx_st FROM a
      ORDER BY col_name
    """.trim),
  )

  /** Benford first-digit expected frequencies, log10(1+1/d) pinned as 6dp
    * LITERALS in both engines (computing log10 at runtime would compare
    * two libm implementations under an exact hash). */
  private val BenfordExp: Map[Int, Double] = Map(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153, 9 -> 0.045757)

  /** Benford first-digit audit of o_totalprice — the synthetic-data /
    * fabricated-numbers detector (a corpus whose amounts were generated
    * uniformly, like this fixture's, FAILS Benford loudly — the audit's
    * point is to measure that deviation, whichever way it falls). The
    * first significant digit is extracted EXACTLY: cents as BIGINT, then
    * the first character of the integer's decimal string (bigint→string
    * is scientific-notation-free in both engines) — never floor(log10)
    * at a power-of-ten boundary. One hash aggregate; frequencies and
    * deviations are single IEEE ops over exact counts and pinned
    * literals.
    */
  val dqBenford = QueryDef(
    "q_dq_benford",
    (s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 0)
        .select(substring(
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).cast(StringType),
          1, 1).cast(IntegerType).as("digit"))
      val counts = o.groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val expDf = s.createDataFrame(BenfordExp.toSeq.sortBy(_._1))
        .toDF("digit", "expected")
      val total = counts.agg(sum("n_obs").as("n")).select(col("n"))
      counts.join(broadcast(expDf), "digit").crossJoin(broadcast(total))
        .select(col("digit"), col("n_obs"),
          (col("n_obs").cast(DoubleType) / col("n")).as("freq"),
          col("expected"),
          (col("n_obs").cast(DoubleType) / col("n") - col("expected")).as("deviation"))
        .orderBy("digit")
    },
    Some {
      val expVals = BenfordExp.toSeq.sortBy(_._1)
        .map { case (d, e) => s"($d, $e)" }.mkString(", ")
      s"""
      WITH d AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders WHERE o_totalprice > 0),
      counts AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
      t AS (SELECT sum(n_obs) AS n FROM counts),
      exp AS (SELECT * FROM (VALUES $expVals) AS e(digit, expected))
      SELECT counts.digit AS digit, n_obs,
             CAST(n_obs AS DOUBLE) / n AS freq,
             expected,
             CAST(n_obs AS DOUBLE) / n - expected AS deviation
      FROM counts JOIN exp ON counts.digit = exp.digit, t
      ORDER BY counts.digit
      """.trim
    },
  )

  /** k-anonymity audit (k = 4) over the quasi-identifier tuple
    * (nation, market segment, account-balance sign) — the
    * re-identification risk check a privacy-aware curation pipeline runs
    * before release: any QI group smaller than k is individually
    * re-identifiable and must be suppressed or generalized. One hash
    * aggregate on the QI key; group count is bounded by the QI domain
    * (|nations|·|segments|·2 here), never by rows — the same grain at
    * any corpus size. (Fixture-measured: 201 groups / 73 risky at
    * sf0.01 — a real mix, not a degenerate all-or-nothing flag.)
    */
  val dqKanon = QueryDef(
    "q_dq_kanon",
    (s, dir) => Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        (col("c_acctbal") >= 0).as("acct_nonneg"))
      .agg(count(lit(1)).as("group_size"))
      .withColumn("risky", col("group_size") < 4)
      .orderBy("c_nationkey", "c_mktsegment", "acct_nonneg"),
    Some("""
      SELECT c_nationkey, c_mktsegment, c_acctbal >= 0 AS acct_nonneg,
             COUNT(*) AS group_size, COUNT(*) < 4 AS risky
      FROM customer GROUP BY 1, 2, 3
      ORDER BY c_nationkey, c_mktsegment, acct_nonneg
    """.trim),
  )

  /** Deterministic Laplace noise for one group key: an inverse-CDF draw
    * whose uniform comes from the PortableHash affine scramble of the
    * canonical key string (q_sample_reservoir's priority recipe — the
    * scramble is an affine permutation of Z_p, so u is equidistributed
    * over (0,1) across keys), b = sensitivity/eps = 1/eps for counts,
    * 6dp-rounded so both engines agree past any last-ulp ln drift.
    * Deterministic-by-key is the reproducibility contract of this
    * engine's whole sketch/sample family — a release pipeline that must
    * re-randomize per release concatenates a release nonce into the key.
    */
  private[graft] def laplaceNoise(key: Column, eps: Double): Column = {
    val ph = graft.functions.PortableHash
    val pr = ((ph.tokenHash(key) * ph.Scramble1Mul + ph.Scramble1Add) % ph.SeedMod
      * ph.Scramble2Mul + ph.Scramble2Add) % ph.SeedMod
    val u = (pr.cast(DoubleType) + lit(1.0)) / lit(ph.SeedMod.toDouble + 1.0)
    val c = u - lit(0.5)
    round(lit(-1.0 / eps) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c)), 6)
  }

  /** The SQL twin of [[laplaceNoise]] over a VARCHAR key expression. */
  private[graft] def laplaceNoiseSql(key: String, eps: Double): String = {
    val ph = graft.functions.PortableHash
    val pr = s"((((${ph.tokenHashSql(key)}) * ${ph.Scramble1Mul} + ${ph.Scramble1Add}) % ${ph.SeedMod})" +
      s" * ${ph.Scramble2Mul} + ${ph.Scramble2Add}) % ${ph.SeedMod}"
    s"ROUND(${-1.0 / eps} * sign((($pr) + 1.0) / 2147483648.0 - 0.5)" +
      s" * ln(1.0 - 2.0 * abs((($pr) + 1.0) / 2147483648.0 - 0.5)), 6)"
  }

  /** Differentially-noised release of the q_dq_kanon QI group counts —
    * the privacy family's RELEASE mechanism (r10 verdict ask 4): after
    * the k-anonymity audit says which groups are risky, what a pipeline
    * actually publishes is eps-DP noised counts, never raw ones. Laplace
    * mechanism at eps = 1 (count sensitivity 1), noise drawn
    * deterministically per group by [[laplaceNoise]] — fully
    * engine-reproducible, so unlike textbook rand() DP this row carries
    * a FULL DuckDB oracle; DpNoiseSpec proves the draw actually has
    * Laplace's magnitude distribution and that eps scales it. `released`
    * clamps at 0 (counts are non-negative; clamping is post-processing,
    * DP-safe). Same bounded-domain grain as the audit: |QI domain|
    * groups at any corpus size.
    */
  val dqDpnoise = QueryDef(
    "q_dq_dpnoise",
    (s, dir) => {
      val g = Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          (col("c_acctbal") >= 0).as("acct_nonneg"))
        .agg(count(lit(1)).as("n"))
      // canonical key = '|'-joined string casts of the group values —
      // EXACTLY the GraftFrame.noisedCounts verb's derivation (booleans
      // render 'true'/'false' in both engines), so verb ≡ registered row
      val key = concat_ws("|", col("c_nationkey").cast(StringType),
        col("c_mktsegment").cast(StringType), col("acct_nonneg").cast(StringType))
      g.withColumn("noise", laplaceNoise(key, eps = 1.0))
        .select(col("c_nationkey"), col("c_mktsegment"), col("acct_nonneg"),
          round(col("n") + col("noise"), 6).as("noised_count"),
          round(greatest(col("n") + col("noise"), lit(0.0)), 6).as("released"))
        .orderBy("c_nationkey", "c_mktsegment", "acct_nonneg")
    },
    Some(s"""
      WITH g AS (
        SELECT c_nationkey, c_mktsegment, c_acctbal >= 0 AS acct_nonneg, COUNT(*) AS n
        FROM customer GROUP BY 1, 2, 3),
      k AS (SELECT *, CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' ||
              CAST(acct_nonneg AS VARCHAR) AS gkey FROM g),
      nz AS (SELECT *, ${laplaceNoiseSql("gkey", eps = 1.0)} AS noise FROM k)
      SELECT c_nationkey, c_mktsegment, acct_nonneg,
             ROUND(n + noise, 6) AS noised_count,
             ROUND(greatest(n + noise, 0.0), 6) AS released
      FROM nz
      ORDER BY c_nationkey, c_mktsegment, acct_nonneg
    """.trim),
  )

  /** The PSI plan over any (k = slice key BIGINT, xc = exact value cents
    * BIGINT) frame — factored out so the spec can calibrate on synthetic
    * stable/shifted slices.
    */
  private[graft] def psiFrom(o: DataFrame): DataFrame = {
    val dom = o.agg(min("xc").as("mn"), max("xc").as("mx"))
    val binned = o.crossJoin(broadcast(dom))
      .withColumn("bin", least(lit(9L), expr("((xc - mn) * 10) div (mx - mn + 1)")))
      // pmod, not %: truncated modulo maps negative odd keys to -1, which
      // matches NEITHER slice — those rows would silently vanish from the
      // PSI. The oracle's non-negative fixture keys make the twins agree.
      .withColumn("slice", pmod(col("k"), lit(2)).cast(IntegerType))
    val counts = binned.groupBy("bin")
      .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("slice") === 1, 1L).otherwise(0L)).as("n_cur"))
    val tot = counts.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    val grid = o.sparkSession.range(0, 10).select(col("id").as("bin"))
    val rows = grid.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(broadcast(tot))
      .withColumn("p_ref", (col("n_ref") + 1).cast(DoubleType) / (col("tr") + 10).cast(DoubleType))
      .withColumn("p_cur", (col("n_cur") + 1).cast(DoubleType) / (col("tc") + 10).cast(DoubleType))
      .withColumn("term",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 8)
          .cast(DecimalType(18, 8)))
      .localCheckpoint()
    val psi = rows.agg(round(sum("term").cast(DoubleType), 6).as("psi"))
    rows.crossJoin(broadcast(psi))
      .select(col("bin").cast(IntegerType).as("bin"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
        col("term").cast(DoubleType).as("psi_term"), col("psi"))
      .orderBy("bin")
  }

  /** Population stability index between the even- and odd-key halves of
    * the order amounts — the standard feature-drift audit next to the
    * text/embedding drift monitors (q_text_drift / q_vec_drift): 10
    * equal-width bins over the GLOBAL value domain (all-integer cents
    * binning — `div` on exact longs, no float edge can disagree between
    * engines), add-one-smoothed bin probabilities (no zero-bin epsilon
    * hacks), PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref). The one libm call
    * (ln) rides the entropy recipe: 8dp-round each term to an exact
    * decimal BEFORE the order-free sum, so last-ulp ln drift cannot
    * surface. One row per bin with the shared psi total; the fixture's
    * random split reads ≈ 0 (the calibrated "no drift" band is < 0.1;
    * DqPsiSpec pins a shifted slice scoring far above it).
    */
  val dqPsi = QueryDef(
    "q_dq_psi",
    (s, dir) => psiFrom(Tables.orders(s, dir)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(LongType).as("xc"))),
    Some("""
      WITH o AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS xc
        FROM orders),
      dom AS (SELECT MIN(xc) AS mn, MAX(xc) AS mx FROM o),
      b AS (SELECT least(9, ((xc - mn) * 10) // (mx - mn + 1)) AS bin,
                   k % 2 AS slice
            FROM o, dom),
      c AS (SELECT bin,
                   CAST(SUM(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
            FROM b GROUP BY bin),
      tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr, CAST(SUM(n_cur) AS BIGINT) AS tc FROM c),
      grid AS (SELECT CAST(range AS BIGINT) AS bin FROM range(10)),
      r AS (SELECT g.bin,
                   COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur,
                   CAST(COALESCE(c.n_ref, 0) + 1 AS DOUBLE) / CAST(tr + 10 AS DOUBLE) AS p_ref,
                   CAST(COALESCE(c.n_cur, 0) + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE) AS p_cur
            FROM grid g LEFT JOIN c ON c.bin = g.bin, tot),
      t AS (SELECT *,
                   CAST(ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 8) AS DECIMAL(18,8)) AS term
            FROM r),
      p AS (SELECT ROUND(CAST(SUM(term) AS DOUBLE), 6) AS psi FROM t)
      SELECT CAST(t.bin AS INTEGER) AS bin, n_ref, n_cur,
             ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
             CAST(term AS DOUBLE) AS psi_term, p.psi
      FROM t, p ORDER BY bin
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(dqProfile, dqBenford, dqKanon, dqDpnoise, dqPsi,
    winFirstLast, joinLateral, setIntersectAll, setExceptAll, aggCollect, sketchBloom, sketchCms,
    sketchQuantile, dqAudit, sketchHllSetops)
}
