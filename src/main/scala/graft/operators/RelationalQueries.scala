package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Groups B (scans), C (project/filter), G (sort/limit), H (set ops) —
  * SURVEY.md §2.B.
  *
  * Scale design notes:
  *  - scans stay declarative so Catalyst pushes predicates + prunes columns
  *    into the parquet reader (asserted by PlanShapeSpec);
  *  - q_limit_topk relies on TakeOrderedAndProject (no global sort);
  *  - set ops are shuffle hash-based distincts — at 100 TB they partition by
  *    the full row hash, no driver involvement.
  */
object RelationalQueries {
  private val D = DecimalType(12, 4)

  /** Parquet scan + projection, total order. */
  val scanParquet = QueryDef(
    "q_scan_parquet",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — order by
        // every output column for a total order (same in all sorts below)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
    """.trim),
  )

  /** Column-pruned, predicate-pushed scan (pushdown asserted in unit test). */
  val scanPruned = QueryDef(
    "q_scan_pruned",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 49)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem WHERE l_quantity > 49
      ORDER BY l_orderkey, l_linenumber, l_quantity
    """.trim),
  )

  /** Partitioned scan + dynamic partition pruning — the 100 TB scan story:
    * the fact side is the date-partitioned events layout
    * (PartitionedEvents), the dimension is the distinct Mondays derived from
    * the flat fixture. DPP turns the dimension's filter into a runtime
    * partition filter on the fact scan (PlanShapeSpec asserts
    * `dynamicpruningexpression` in PartitionFilters), so only matching
    * `event_date=...` directories are read — at scale that is the
    * difference between scanning one weekday's partitions and the whole
    * fact table.
    */
  val scanPartitioned = QueryDef(
    "q_scan_partitioned",
    (s, dir) => {
      val base = graft.sources.PartitionedEvents.ensureWritten(s, dir)
      val fact = s.read.parquet(base)
      val dim = Tables.events(s, dir)
        .select(to_date(col("ts")).as("event_date")).distinct()
        .filter(dayofweek(col("event_date")) === 2) // Mondays (Spark: 1=Sun)
      fact.join(broadcast(dim), "event_date")
        .groupBy("event_date")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(9, 2))).cast(DecimalType(38, 2)).cast(DoubleType)
            .as("sum_value"))
        // DATE stays the partition/grouping type; the OUTPUT column is the
        // canonical yyyy-MM-dd string — a raw DATE column renders
        // differently through the two engines' pandas readers
        .select(date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
          col("n"), col("sum_value"))
        .orderBy("event_date")
    },
    Some("""
      SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS event_date,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM events
      WHERE dayofweek(CAST(CAST(ts AS TIMESTAMP) AS DATE)) = 1  -- DuckDB: 0=Sun, so 1=Monday
      GROUP BY 1 ORDER BY event_date
    """.trim),
  )

  /** Computed columns: revenue computed as exact decimal (Spark (25,8) /
    * DuckDB (24,8) products), emitted as DOUBLE — the per-row unscaled value
    * (≤ ~5e14 at scale 8) is < 2^53 so the cast is exact and bit-identical
    * on both engines; no decimal128 column reaches the output schema.
    */
  val projectExpr = QueryDef(
    "q_project_expr",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast(D) * (lit(BigDecimal(1)).cast(D) - col("l_discount").cast(D)))
            .cast(DecimalType(30, 8)).cast(DoubleType).as("revenue"),
          (col("l_quantity").cast(D) * col("l_extendedprice").cast(D))
            .cast(DecimalType(30, 8)).cast(DoubleType).as("gross"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "gross"),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(30,8)) AS DOUBLE) AS revenue,
             CAST(CAST(CAST(l_quantity AS DECIMAL(12,4)) * CAST(l_extendedprice AS DECIMAL(12,4)) AS DECIMAL(30,8)) AS DOUBLE) AS gross
      FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, gross
    """.trim),
  )

  /** Conjunctive/disjunctive predicates, BETWEEN, IN, IS NOT NULL. */
  val filterPred = QueryDef(
    "q_filter_pred",
    (s, dir) =>
      Tables.orders(s, dir)
        .filter(
          col("o_orderdate").between(lit("1995-01-01").cast(TimestampNTZType), lit("1996-12-31").cast(TimestampNTZType))
            && col("o_orderstatus").isin("O", "F")
            && (col("o_totalprice") > 100000.0 || col("o_orderpriority") === "1-URGENT")
            && col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        AND o_orderstatus IN ('O', 'F')
        AND (o_totalprice > 100000.0 OR o_orderpriority = '1-URGENT')
        AND o_custkey IS NOT NULL
      ORDER BY o_orderkey
    """.trim),
  )

  /** Multi-key sort: desc / asc with unique tiebreaker. */
  val sortMulti = QueryDef(
    "q_sort_multi",
    (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_totalprice, o_orderdate
      FROM orders ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    """.trim),
  )

  /** Global top-k without full sort (TakeOrderedAndProject; plan-asserted).
    * Revenue is computed as exact decimal then emitted as an exact DOUBLE
    * (unscaled < 2^53) so the ordering — and the bits — are identical in
    * both engines.
    */
  val limitTopk = QueryDef(
    "q_limit_topk",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast(D) * (lit(BigDecimal(1)).cast(D) - col("l_discount").cast(D)))
            .cast(DecimalType(30, 8)).cast(DoubleType).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(10),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(30,8)) AS DOUBLE) AS revenue
      FROM lineitem
      ORDER BY revenue DESC, l_orderkey ASC, l_linenumber ASC
      LIMIT 10
    """.trim),
  )

  // Set-op inputs: custkeys in the BUILDING segment vs custkeys with >5
  // orders. Both reproduce as plain subqueries in DuckDB.
  private def buildingKeys(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
  private def busyKeys(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.orders(s, dir).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 5).select(col("o_custkey").as("custkey"))
  val setUnionAll = QueryDef(
    "q_set_union_all",
    (s, dir) => buildingKeys(s, dir).unionAll(busyKeys(s, dir)).orderBy("custkey"),
    Some("""
      SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
      ) ORDER BY custkey
    """.trim),
  )

  val setUnion = QueryDef(
    "q_set_union",
    (s, dir) => buildingKeys(s, dir).union(busyKeys(s, dir)).distinct().orderBy("custkey"),
    Some("""
      SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
      ) ORDER BY custkey
    """.trim),
  )

  val setIntersect = QueryDef(
    "q_set_intersect",
    (s, dir) => buildingKeys(s, dir).intersect(busyKeys(s, dir)).orderBy("custkey"),
    Some("""
      SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
      ) ORDER BY custkey
    """.trim),
  )

  val setExcept = QueryDef(
    "q_set_except",
    (s, dir) => buildingKeys(s, dir).except(busyKeys(s, dir)).orderBy("custkey"),
    Some("""
      SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5
      ) ORDER BY custkey
    """.trim),
  )

  /** Symmetric difference — composed from the engine's own set operators
    * ((A except B) union all (B except A); operands are already distinct
    * sets so union all is safe and skips a needless dedup shuffle).
    */
  val setSymdiff = QueryDef(
    "q_set_symdiff",
    (s, dir) => {
      val a = buildingKeys(s, dir)
      val b = busyKeys(s, dir)
      a.except(b).unionAll(b.except(a)).orderBy("custkey")
    },
    Some("""
      WITH a AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      b AS (SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5)
      SELECT custkey FROM (
        SELECT custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        UNION ALL
        SELECT custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
      ) ORDER BY custkey
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    scanParquet, scanPruned, scanPartitioned, projectExpr, filterPred,
    sortMulti, limitTopk,
    setUnionAll, setUnion, setIntersect, setExcept, setSymdiff)
}
