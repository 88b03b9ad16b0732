package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Group D — joins (SURVEY.md §2.B Group D).
  *
  * Scale design: equi-joins shuffle on their keys (or broadcast the small
  * side — `broadcast(part)` / dimension tables); the planner picks
  * shuffled-hash vs sort-merge via stats + AQE. The theta/interval joins are
  * deliberately blocked on an equi-key (nationkey / user_id) so Spark plans
  * a hash join with a residual condition instead of a cartesian product —
  * that's the property that survives a 100× scale-up. The as-of join avoids
  * any join blowup entirely: it's a single shuffle on user_id + one ordered
  * window pass (last non-null click carried forward), linear in events.
  */
object JoinQueries {

  /** Inner equi-join. */
  val joinInner = QueryDef(
    "q_join_inner",
    (s, dir) =>
      Tables.orders(s, dir).join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, c_custkey, c_name, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """.trim),
  )

  /** Broadcast hash join — small side explicitly broadcast (plan-asserted). */
  val joinBroadcast = QueryDef(
    "q_join_broadcast",
    (s, dir) =>
      Tables.lineitem(s, dir).join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_brand", "p_type")
        // duplicate (l_orderkey, l_linenumber) keys exist — total order
        .orderBy("l_orderkey", "l_linenumber", "p_brand", "p_type"),
    Some("""
      SELECT l_orderkey, l_linenumber, p_brand, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      ORDER BY l_orderkey, l_linenumber, p_brand, p_type
    """.trim),
  )

  /** Join-only stage of the bucketed co-located join — both sides read
    * from 8-bucket layouts hashed+sorted on the join key, so the merge join
    * needs NO exchange and NO sort on either side (PlanShapeSpec asserts
    * both). Exposed separately so the plan assertion isn't polluted by the
    * output ordering's range exchange.
    */
  def bucketedJoin(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    graft.sources.BucketedTables.ensure(s, dir)
    val o = s.table(graft.sources.BucketedTables.ordersTable(dir))
    val c = s.table(graft.sources.BucketedTables.customerTable(dir))
    // merge hint: customer is small at fixture scale, so the planner would
    // otherwise broadcast — at 100 TB both sides are large, which is the
    // case bucketing exists for.
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
  }

  /** Bucketed co-located join: the pre-bucketed twin of q_join_sortmerge's
    * shape — same results as a plain join (which is what the oracle
    * checks), zero shuffle at join time.
    */
  val joinBucketed = QueryDef(
    "q_join_bucketed",
    (s, dir) => bucketedJoin(s, dir).orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """.trim),
  )

  /** Salted join — the skew-join idiom for hot keys, join-side twin of
    * q_agg_salted: events join a per-type dimension on event_type, which
    * has only 5 values (worst-case hot keys — a plain shuffle join sends
    * each key's entire volume to ONE reducer). The big side gets a
    * deterministic salt in [0, 8); the SMALL side is replicated 8× with
    * every salt value; joining on (key, salt) spreads each hot key over 8
    * reducers. Results are identical to the unsalted join — exactly what
    * the oracle checks. (The merge hint forces the shuffle path the idiom
    * exists for; at fixture scale the dim would otherwise broadcast, which
    * is the right plan when the dim IS small — salting is for when both
    * sides are too big to broadcast AND keys are hot.)
    */
  val joinSalted = QueryDef(
    "q_join_salted",
    (s, dir) => {
      val salts = 8
      val events = Tables.events(s, dir)
      val dim = events.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("type_users"))
      val dimSalted = dim.withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
      val big = events.select(col("event_id"), col("event_type"),
        pmod(hash(col("event_id")), lit(salts)).as("salt"))
      big.hint("merge").join(dimSalted, Seq("event_type", "salt"))
        .select("event_id", "event_type", "type_users")
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, event_type, type_users
      FROM events
      JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS type_users
            FROM events GROUP BY event_type) USING (event_type)
      ORDER BY event_id
    """.trim),
  )

  /** Sort-merge join — forced via hint (plan-asserted). */
  val joinSortMerge = QueryDef(
    "q_join_sortmerge",
    (s, dir) =>
      Tables.lineitem(s, dir).hint("merge")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus")
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ORDER BY l_orderkey, l_linenumber
    """.trim),
  )

  /** Left outer join — customers without orders kept (null orderkeys sort
    * first in both engines: Spark asc default, DuckDB `NULLS FIRST`).
    */
  val joinLeft = QueryDef(
    "q_join_left",
    (s, dir) =>
      Tables.customer(s, dir).join(
          Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(asc("c_custkey"), asc("o_orderkey")),
    Some("""
      SELECT c_custkey, o_orderkey, o_totalprice
      FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        ON c_custkey = o_custkey
      ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST
    """.trim),
  )

  /** Full outer join of per-nation aggregates (exercises unmatched keys on
    * both sides without an m×n blowup).
    */
  val joinFull = QueryDef(
    "q_join_full",
    (s, dir) => {
      val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_suppliers"))
      val cus = Tables.customer(s, dir).groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_customers"))
      sup.join(cus, col("s_nationkey") === col("c_nationkey"), "full")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"))
        .orderBy("nationkey")
    },
    Some("""
      SELECT COALESCE(s.s_nationkey, c.c_nationkey) AS nationkey,
             COALESCE(s.n_suppliers, 0) AS n_suppliers,
             COALESCE(c.n_customers, 0) AS n_customers
      FROM (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY s_nationkey) s
      FULL JOIN (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey) c
        ON s.s_nationkey = c.c_nationkey
      ORDER BY nationkey
    """.trim),
  )

  /** Left semi join (EXISTS). */
  val joinSemi = QueryDef(
    "q_join_semi",
    (s, dir) =>
      Tables.customer(s, dir).join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey
    """.trim),
  )

  /** Left anti join (NOT EXISTS). Right side filtered to high-value orders
    * so the anti set is non-empty at every fixture scale.
    */
  val joinAnti = QueryDef(
    "q_join_anti",
    (s, dir) =>
      Tables.customer(s, dir).join(
          Tables.orders(s, dir).filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
      ORDER BY c_custkey
    """.trim),
  )

  /** Cross join (5 × 25 — intentionally tiny; a cartesian product is never
    * a scale path).
    */
  val joinCross = QueryDef(
    "q_join_cross",
    (s, dir) =>
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey"),
    Some("""
      SELECT r_regionkey, r_name, n_nationkey, n_name
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey
    """.trim),
  )

  /** Theta join: equi-key on nationkey + inequality residual — plans as a
    * hash join with a post-join filter, not a nested loop.
    */
  val joinTheta = QueryDef(
    "q_join_theta",
    (s, dir) =>
      Tables.supplier(s, dir).join(
          Tables.customer(s, dir),
          col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
        .orderBy("s_suppkey", "c_custkey"),
    Some("""
      SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      ORDER BY s_suppkey, c_custkey
    """.trim),
  )

  /** Interval join: purchase within 10 minutes after a click, same user.
    * Blocked on user_id (equi) with a ts-range residual.
    */
  val joinInterval = QueryDef(
    "q_join_interval",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      clicks.join(purchases,
          col("cu") === col("pu")
            && col("purchase_ts") > col("click_ts")
            && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
        .select(col("click_id"), col("purchase_id"), col("cu").as("user_id"))
        .orderBy("click_id", "purchase_id")
    },
    Some("""
      SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id AS user_id
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND CAST(p.ts AS TIMESTAMP) > CAST(c.ts AS TIMESTAMP)
       AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
      ORDER BY click_id, purchase_id
    """.trim),
  )

  /** As-of join: each purchase matched to the latest click at-or-before it,
    * per user. Spark has no native as-of join; formulated as one window pass
    * over the tagged union — O(n log n) per user partition, no pair blowup.
    * Oracle is DuckDB's native ASOF JOIN. Output carries click_ts (epoch
    * micros) rather than click_id so same-ts tie rows are deterministic.
    */
  val joinAsof = QueryDef(
    "q_join_asof",
    (s, dir) => {
      val e = Tables.events(s, dir).filter(col("event_type").isin("click", "purchase"))
        .select(
          col("event_id"), col("user_id"), col("ts"),
          // clicks sort before purchases at equal ts so an equal-ts click is
          // visible to the purchase (DuckDB ASOF uses <=).
          when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("kind"),
          when(col("event_type") === "click", expr("unix_micros(cast(ts as timestamp))")).as("click_us"))
      val w = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("click_ts_us", last(col("click_us"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("click_ts_us").isNotNull)
        .select(col("event_id").as("purchase_id"), col("user_id"), col("click_ts_us"))
        .orderBy("purchase_id")
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts
      ORDER BY purchase_id
    """.trim),
  )

  /** Same query through the native as-of operator (plans/AsOfJoin.scala —
    * custom LogicalPlan + Strategy + sort-merge SparkPlan). Checked against
    * the same DuckDB ASOF JOIN oracle as q_join_asof; AsOfJoinNativeSpec
    * additionally pins row-for-row equality with the window formulation and
    * the exchange-elision property that motivates the native operator.
    */
  val joinAsofNative = QueryDef(
    "q_join_asof_native",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
          // payload is a function of (key, ts), so equal-ts click ties
          // resolve to identical output (operator tie order is unpinned)
          expr("unix_micros(cast(ts as timestamp))").as("c_us"))
      graft.plans.AsOfJoin.asof(purchases, clicks,
          Seq("user_id"), Seq("c_user_id"), "ts", "c_ts")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("c_us").as("click_ts_us"))
        .orderBy("purchase_id")
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts
      ORDER BY purchase_id
    """.trim),
  )

  /** The same interval join as q_join_interval, executed as a BINNED
    * equi-join — the 100 TB shape. q_join_interval's plan is an equi-join
    * on user_id with the ts range as a post-join residual, which is fine
    * while per-user event counts are small but degrades to per-key
    * quadratic when one user has millions of events. Binning makes the
    * time dimension part of the JOIN KEY: with bin width = the interval
    * length (10 min), a matching click lies in the purchase's bin or the
    * one before, so each click registers under (user, bin) and (user,
    * bin+1) and the join is a pure equi-join on (user_id, bin) — hash
    * join / SMJ, shuffle on both key columns, per-key groups bounded by
    * the bin width regardless of how hot the user is. The exact range
    * predicate filters inside the join, and each (click, purchase) pair
    * meets at most once (the two click bins are distinct), so no dedup
    * pass is needed. Same rows as q_join_interval — the shared oracle
    * checks exactly that.
    */
  val joinRangeBinned = QueryDef(
    "q_join_range_binned",
    (s, dir) => {
      val binUs = 600000000L // 10 min, micros — bin width = interval length
      val e = Tables.events(s, dir)
        .withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"),
          col("ts_us").as("c_us"), expr(s"ts_us div ${binUs}L").as("cbin"))
        .select(col("cu"), col("click_id"), col("c_us"),
          explode(array(col("cbin"), col("cbin") + 1)).as("jbin"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_us"), expr(s"ts_us div ${binUs}L").as("pbin"))
      clicks.join(purchases,
          col("cu") === col("pu") && col("jbin") === col("pbin")
            && col("p_us") > col("c_us") && col("p_us") <= col("c_us") + binUs)
        .select(col("click_id"), col("purchase_id"), col("cu").as("user_id"))
        .orderBy("click_id", "purchase_id")
    },
    joinInterval.oracle,
  )

  /** Runtime bloom-filter join (InjectRuntimeFilter) — the modern sibling
    * of DPP for non-partition keys: the dim side's selective predicate is
    * turned into a bloom filter evaluated as `might_contain` on the fact
    * side BEFORE its shuffle, so at 100 TB the fact scan ships only rows
    * that can possibly join instead of the full table. The demo runs in an
    * isolated `newSession()` (same SparkContext, own conf) because at
    * fixture scale the dim broadcasts — and InjectRuntimeFilter only fires
    * for probable shuffle joins, the 100 TB regime where a multi-GB dim
    * CANNOT broadcast; disabling autoBroadcast inside the child session
    * reproduces that regime without polluting the shared session's plans.
    * Revenue sums are exact decimals per the §7.5 determinism rules.
    */
  val joinBloomFilter = QueryDef(
    "q_join_bloomfilter",
    (s, dir) => {
      val s2 = s.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val o = Tables.orders(s2, dir).filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderstatus")
      val l = Tables.lineitem(s2, dir)
        .select(col("l_orderkey"), col("l_extendedprice").cast(DecimalType(12, 2)).as("price"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_items"),
          sum("price").cast(DecimalType(38, 2)).cast(DoubleType).as("revenue"))
        .orderBy("o_orderstatus")
    },
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n_items,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """.trim),
  )

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): suppliers whose
    * nationkey is deterministically nulled (every 5th) still match a
    * synthetic UNKNOWN dim row — the dimension-with-null-member idiom.
    * `<=>` keeps the join a plain hash/broadcast equi-join (null becomes
    * an ordinary key value) instead of the null-dropping inner join plus
    * a union patch-up; the null "key group" is as skew-safe as any other
    * hot key because the dim side has exactly one UNKNOWN row.
    */
  val joinNullSafe = QueryDef(
    "q_join_nullsafe",
    (s, dir) => {
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          when(col("s_suppkey") % 5 === 0, lit(null)).otherwise(col("s_nationkey"))
            .as("nk"))
      val dim = Tables.nation(s, dir).select(col("n_nationkey").as("nk"), col("n_name"))
        .unionAll(s.range(1).select(lit(null).cast("long").as("nk"), lit("UNKNOWN").as("n_name")))
      sup.join(broadcast(dim), sup("nk") <=> dim("nk"))
        .select(col("s_suppkey"), col("n_name"))
        .orderBy("s_suppkey")
    },
    Some("""
      WITH sup AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END AS nk
        FROM supplier),
      dim AS (
        SELECT n_nationkey AS nk, n_name FROM nation
        UNION ALL SELECT NULL, 'UNKNOWN')
      SELECT s_suppkey, n_name
      FROM sup JOIN dim ON sup.nk IS NOT DISTINCT FROM dim.nk
      ORDER BY s_suppkey
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    joinInner, joinBroadcast, joinSortMerge, joinBucketed, joinSalted, joinLeft, joinFull,
    joinSemi, joinAnti, joinCross, joinTheta, joinInterval, joinAsof, joinAsofNative,
    joinRangeBinned, joinBloomFilter, joinNullSafe)
}
