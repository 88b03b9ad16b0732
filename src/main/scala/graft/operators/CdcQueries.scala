package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-5 change-data-capture apply: the MERGE INTO primitive —
  * applying a batch of upserts and deletes to a base snapshot — as a
  * pure relational plan, since the engine targets plain parquet/object
  * storage without a transactional table format.
  *
  * Scale design: one full-outer shuffle join on the primary key is the
  * whole operator — the same cost profile as Delta/Iceberg's MERGE
  * rewrite path, minus the transaction log. At 100 TB the snapshot side
  * would be bucketed on the key (BucketedTables) so repeated change
  * batches co-locate for free, and the change batch — typically orders
  * of magnitude smaller — shuffles to meet it.
  */
object CdcQueries {

  /** Apply a change batch to the orders snapshot. The batch is derived
    * from the same table to stay self-contained and oracle-checkable:
    * even keys are upserts carrying a re-priced row (+10.00 surcharge —
    * an exact 2dp double addition, so no cross-engine rounding-mode
    * divergence; an insert when the key is outside the snapshot, an
    * update when inside), keys
    * divisible by 5 are deletes — and a key divisible by 10 is BOTH in
    * the batch, exercising delete-wins precedence. Output carries the
    * per-row disposition so downstream audit (q_pipeline_audit pattern)
    * can count applied changes.
    */
  /** The merge itself, generic over where the orders relation comes from
    * (plain parquet or the PK-bucketed layout) — shared by both
    * registered variants and the plan-shape spec.
    */
  private[graft] def applyStage(orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val snap = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val changes = orders.filter(col("o_orderkey") % 2 === 0 || col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("o_custkey").as("c_custkey"),
        (col("o_totalprice") + 10.0).as("new_price"))
    snap.join(changes, Seq("o_orderkey"), "full")
      .filter(col("op").isNull || col("op") === "U")
      .select(
        col("o_orderkey"),
        coalesce(col("c_custkey"), col("o_custkey")).as("o_custkey"),
        coalesce(col("new_price"), col("o_totalprice")).as("o_totalprice"),
        when(col("op").isNull, lit("kept"))
          .when(col("o_custkey").isNull, lit("inserted"))
          .otherwise(lit("updated")).as("disposition"))
  }

  val cdcUpsert = QueryDef(
    "q_cdc_upsert",
    (s, dir) => applyStage(Tables.orders(s, dir)).orderBy("o_orderkey"),
    Some("""
      WITH snap AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
      changes AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op,
               o_custkey AS c_custkey,
               o_totalprice + 10.0 AS new_price
        FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 5 = 0)
      SELECT COALESCE(s.o_orderkey, c.o_orderkey) AS o_orderkey,
             COALESCE(c.c_custkey, s.o_custkey) AS o_custkey,
             COALESCE(c.new_price, s.o_totalprice) AS o_totalprice,
             CASE WHEN c.op IS NULL THEN 'kept'
                  WHEN s.o_custkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS disposition
      FROM snap s FULL OUTER JOIN changes c ON s.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op = 'U'
      ORDER BY o_orderkey
    """.trim),
  )

  /** The same merge over the PK-bucketed snapshot layout: both the
    * snapshot and the change batch read the orders table bucketed+sorted
    * on o_orderkey, so the full-outer merge joins co-located buckets
    * with zero exchange and zero sort on either side (plan-asserted).
    * This is the repeated-ingest shape at 100 TB: maintain the snapshot
    * bucketed on its key once, and every change batch written through
    * the same bucketer merges for the price of a local merge scan.
    */
  private[graft] def bucketedApplyStage(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    graft.sources.BucketedTables.ensureOrdersPk(s, dir)
    applyStage(s.table(graft.sources.BucketedTables.ordersPkTable(dir)))
  }

  val cdcUpsertBucketed = QueryDef(
    "q_cdc_upsert_bucketed",
    (s, dir) => bucketedApplyStage(s, dir).orderBy("o_orderkey"),
    cdcUpsert.oracle,
  )

  /** CDC DERIVE — the inverse of the apply: given two snapshot versions
    * of a keyed table, emit the change set that transforms old into new
    * (insert / update / delete per key, with before/after values for
    * updates). One full-outer join on the primary key, a null-safe value
    * compare for the update arm — the snapshot-diff every backfill
    * validation and late-landing-data reconciliation needs when the
    * upstream doesn't publish a change log. Unchanged keys are filtered
    * before the output sort, so the result is |changes| rows, not
    * |snapshot|. Both snapshots derive deterministically from orders
    * (new = re-priced evens minus the %7 keys) so the op is
    * oracle-checkable end to end; at 100 TB both sides read the
    * PK-bucketed layout and the join is co-located (q_cdc_upsert_bucketed's
    * plan shape).
    */
  val cdcDerive = QueryDef(
    "q_cdc_derive",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val oldSnap = orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val newSnap = orders.filter(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"),
          col("o_custkey"),
          when(col("o_orderkey") % 2 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        // inserted keys (outside the old key space) so all three arms fire
        .unionAll(orders.filter(col("o_orderkey") % 11 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice")))
      oldSnap.select(col("o_orderkey").as("k1"), col("o_custkey").as("c1"), col("o_totalprice").as("p1"))
        .join(newSnap.select(col("o_orderkey").as("k2"), col("o_custkey").as("c2"), col("o_totalprice").as("p2")),
          col("k1") === col("k2"), "full_outer")
        .withColumn("op",
          when(col("k1").isNull, lit("I"))
            .when(col("k2").isNull, lit("D"))
            .when(!(col("c1") <=> col("c2")) || !(col("p1") <=> col("p2")), lit("U")))
        .filter(col("op").isNotNull)
        .select(coalesce(col("k1"), col("k2")).as("o_orderkey"), col("op"),
          col("p1").as("old_price"), col("p2").as("new_price"))
        .orderBy("o_orderkey")
    },
    Some("""
      WITH old_snap AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      new_snap AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 11 = 0)
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'I'
                  WHEN b.o_orderkey IS NULL THEN 'D'
                  ELSE 'U' END AS op,
             a.o_totalprice AS old_price, b.o_totalprice AS new_price
      FROM old_snap a FULL OUTER JOIN new_snap b ON a.o_orderkey = b.o_orderkey
      WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
         OR a.o_custkey IS DISTINCT FROM b.o_custkey
         OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
      ORDER BY o_orderkey
    """.trim),
  )

  /** Slowly-changing-dimension Type 2 build — the warehouse-standard
    * versioned dimension: each user's event stream is read as changes to
    * a tracked attribute (event_type), consecutive duplicates are
    * suppressed (a new version opens only when the value CHANGES — the
    * SCD2 rule), and each surviving version gets its validity interval
    * [valid_from, valid_to) from the next change, with the open tail
    * flagged current. Validity bounds are exact epoch-micros longs, so
    * the interval arithmetic is engine-independent by construction.
    *
    * Shape: ONE shuffle on user_id feeds both window passes (change
    * detection via lag, interval close via lead) — the q_events_
    * sessionize cost profile; nothing is corpus-quadratic and a
    * bucketed-events layout makes it exchange-free (the _bucketed
    * precedent).
    */
  val cdcScd2 = QueryDef(
    "q_cdc_scd2",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          .as("ts_us"))
      val changes = ev
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
      changes
        .withColumn("valid_to_us", lead("ts_us", 1).over(w2))
        .select(col("user_id"), col("event_type"),
          col("ts_us").as("valid_from_us"), col("valid_to_us"),
          col("valid_to_us").isNull.as("is_current"))
        .orderBy("user_id", "valid_from_us", "event_type")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
               datediff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
        FROM events),
      ch AS (
        SELECT user_id, event_id, event_type, ts_us,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        FROM ev),
      ch2 AS (
        SELECT user_id, event_id, event_type, ts_us FROM ch
        WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type, ts_us AS valid_from_us,
             LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
             LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL AS is_current
      FROM ch2
      ORDER BY user_id, valid_from_us, event_type
    """.trim),
  )

  /** SCD Type 2 over a COMPOSITE tracked attribute set — the standard
    * warehouse dimension shape where several columns are versioned
    * together. Tracks (event_type, value) per user: a new version opens
    * when ANY tracked column changes (null-safe compare, so nulls
    * version like values), and each version carries per-column change
    * flags (changed_type / changed_value — a key dimension-audit field:
    * which attribute actually moved). The first version of a key flags
    * every column changed. Interval machinery is identical to
    * q_cdc_scd2: exact epoch-micros [valid_from, valid_to) bounds from
    * lead over the surviving change rows, open tail flagged current.
    *
    * Scale: still ONE shuffle on user_id feeding both window passes —
    * widening the tracked set adds lag/lead columns inside the same
    * window partition, zero extra exchanges. `value` is compared as the
    * raw parquet double (no arithmetic), so the null-safe compare and
    * the emitted values are bit-identical across engines.
    */
  val cdcScd2Multi = QueryDef(
    "q_cdc_scd2_multi",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("value"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
          .as("ts_us"))
      val flagged = ev
        .withColumn("prev_id", lag("event_id", 1).over(w))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("changed_type",
          col("prev_id").isNull || !(col("event_type") <=> col("prev_type")))
        .withColumn("changed_value",
          col("prev_id").isNull || !(col("value") <=> col("prev_value")))
        .filter(col("changed_type") || col("changed_value"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
      flagged
        .withColumn("valid_to_us", lead("ts_us", 1).over(w2))
        .select(col("user_id"), col("event_type"), col("value"),
          col("changed_type"), col("changed_value"),
          col("ts_us").as("valid_from_us"), col("valid_to_us"),
          col("valid_to_us").isNull.as("is_current"))
        .orderBy("user_id", "valid_from_us", "event_type", "value")
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_id, event_type, value,
               datediff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_us
        FROM events),
      ch AS (
        SELECT user_id, event_id, event_type, value, ts_us,
               LAG(event_id) OVER w AS prev_id,
               LAG(event_type) OVER w AS prev_type,
               LAG(value) OVER w AS prev_value
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      ver AS (
        SELECT user_id, event_id, event_type, value, ts_us,
               (prev_id IS NULL OR event_type IS DISTINCT FROM prev_type) AS changed_type,
               (prev_id IS NULL OR value IS DISTINCT FROM prev_value) AS changed_value
        FROM ch
        WHERE prev_id IS NULL
           OR event_type IS DISTINCT FROM prev_type
           OR value IS DISTINCT FROM prev_value)
      SELECT user_id, event_type, value, changed_type, changed_value,
             ts_us AS valid_from_us,
             LEAD(ts_us) OVER w2 AS valid_to_us,
             LEAD(ts_us) OVER w2 IS NULL AS is_current
      FROM ver
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      ORDER BY user_id, valid_from_us, event_type, value
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(cdcUpsert, cdcUpsertBucketed, cdcDerive, cdcScd2, cdcScd2Multi)
}
