package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental SCD Type-2 maintenance — the streaming upkeep of
  * q_cdc_scd2's versioned dimension, shaped for the dimension's own
  * physics: a CLOSED version never changes again, so closed versions
  * land APPEND-ONLY (one parquet segment per batch — the
  * IncrementalIndex posting discipline), while the bounded one-row-per-
  * user CURRENT table is rewritten behind a _CURRENT version swap (the
  * IncrementalAgg matview discipline). Per batch: seed each affected
  * user's open version in front of its batch events, run the SCD2
  * suppression window across the seam (a batch whose first change
  * equals the open version's value is suppressed — the cross-batch rule
  * a naive per-batch fold gets wrong), close everything but the last
  * kept version, and carry unaffected users' open rows through
  * untouched. Batch cost is O(batch + affected users + #users); history
  * is never re-read.
  *
  * Contract: events arrive time-ordered across batches per user (the
  * same in-order feed q_cdc_scd2 assumes of its source).
  */
object IncrementalScd2 {

  private val curSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("valid_from_us", LongType)))

  /** _CURRENT carries `v<N>` or `v<N>:batch=<id>` (the IncrementalIndex
    * / PackIngest replay discipline): a foreachBatch replay after a
    * crash between the swap and the checkpoint commit is skipped, so a
    * batch's versions never double-land.
    */
  private def currentPointer(s: SparkSession, base: String): Option[(String, Option[Long])] =
    graft.sources.GraftFs.readSmallFile(s, s"$base/_CURRENT").map { c =>
      c.trim.split(":batch=") match {
        case Array(v, b) => (v, Some(b.toLong))
        case Array(v) => (v, None)
      }
    }

  private def currentVersion(s: SparkSession, base: String): Option[String] =
    currentPointer(s, base).map(_._1)

  /** Open (current) versions, one row per user seen so far. */
  /** The committed micro-batch id, if the writer threads one. */
  def committedBatch(s: SparkSession, base: String): Option[Long] =
    currentPointer(s, base).flatMap(_._2)

  def readCurrentTable(s: SparkSession, base: String): DataFrame =
    currentVersion(s, base) match {
      case Some(v) => s.read.schema(curSchema).parquet(s"$base/current/$v")
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], curSchema)
    }

  /** All closed versions (append-only segments). */
  def readClosed(s: SparkSession, base: String): DataFrame = {
    val (fs, q) = graft.sources.GraftFs.resolve(s, s"$base/closed")
    if (!fs.exists(q)) s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(curSchema.fields :+ StructField("valid_to_us", LongType)))
    else s.read.option("recursiveFileLookup", "true").parquet(s"$base/closed")
  }

  /** The full dimension in q_cdc_scd2's output shape. */
  def readDimension(s: SparkSession, base: String): DataFrame =
    readClosed(s, base)
      .select(col("user_id"), col("event_type"), col("valid_from_us"),
        col("valid_to_us"), lit(false).as("is_current"))
      .unionByName(readCurrentTable(s, base)
        .select(col("user_id"), col("event_type"), col("valid_from_us"),
          lit(null).cast(LongType).as("valid_to_us"), lit(true).as("is_current")))
      .orderBy("user_id", "valid_from_us", "event_type")

  def processBatch(s: SparkSession, batch: DataFrame, base: String,
      batchId: Option[Long] = None): Unit = {
    val ptr = currentPointer(s, base)
    if (batchId.exists(id => ptr.flatMap(_._2).exists(_ >= id))) return
    val next = ptr.map(_._1.drop(1).toLong + 1).getOrElse(0L)
    val cur = readCurrentTable(s, base).localCheckpoint()
    val ev = batch.select(col("user_id"), col("event_id"), col("event_type"),
      expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        .as("ts_us"))
    val affected = ev.select("user_id").distinct()
    // open versions of affected users seed the suppression window; their
    // pseudo event_id -1 sorts ahead of any real event at equal ts
    val seed = cur.join(affected, "user_id")
      .select(col("user_id"), lit(-1L).as("event_id"), col("event_type"),
        col("valid_from_us").as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))
    val kept = seed.unionByName(ev)
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to_us", lead("ts_us", 1).over(
        Window.partitionBy("user_id").orderBy(asc("ts_us"), asc("event_id"))))
      .localCheckpoint()
    kept.filter(col("valid_to_us").isNotNull)
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
      .write.mode("overwrite").parquet(s"$base/closed/b$next")
    val newCur = kept.filter(col("valid_to_us").isNull)
      .select(col("user_id"), col("event_type"), col("ts_us").as("valid_from_us"))
    val untouched = cur.join(affected, Seq("user_id"), "left_anti")
    newCur.unionByName(untouched).localCheckpoint()
      .write.mode("overwrite").parquet(s"$base/current/v$next")
    // a manual call WITHOUT a batch id carries the committed tag forward —
    // dropping it would erase replay protection for the next crash-replay
    // of an attach()-driven stream sharing this state
    val tag = batchId.orElse(ptr.flatMap(_._2)).fold("")(id => s":batch=$id")
    graft.sources.GraftFs.writeSmallFileAtomic(s, s"$base/_CURRENT", s"v$next$tag")
  }

  /** Attach to an events stream via foreachBatch (replay-protected). */
  def attach(events: DataFrame, base: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      processBatch(batch.sparkSession, batch, base, Some(bid))
    }
}
