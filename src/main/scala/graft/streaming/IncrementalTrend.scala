package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental maintenance of the Mann-Kendall/Sen trend surface
  * (q_ts_trend) AND the RFM segmentation surface (q_events_rfm) — two
  * more "one associative state serves the operator exactly" maintainers:
  *
  *   - trend state = the (g, h, x) HOURLY grain: per-(g, h) sums are
  *     associative, and the grain is TIME-bounded (720 rows/series per
  *     month regardless of corpus rows), so each micro-batch pays one
  *     tiny aggregate + a full-outer merge on the grain;
  *     [[serveTrend]] runs the identical MK/Sen tail
  *     (TimeSeriesQueries.trendFromHourly) — bit-equal to one-shot.
  *   - rfm state = the per-user (last_us, f, m) triple: (max, sum, sum)
  *     merges; [[serveRfm]] runs the identical scoring tail
  *     (EventQueries.rfmFromUsers) — bit-equal to one-shot. The serve
  *     pays the user-grain quintile windows, never an event re-scan.
  *
  * State protocol: versioned tables behind the batch-tagged `_CURRENT`
  * swap (the IncrementalDrift/Scd2 discipline — crash replays skipped).
  */
object IncrementalTrend {

  private val trendSchema = StructType(Seq(
    StructField("g", StringType), StructField("h", LongType), StructField("x", LongType)))
  private val slopeSchema = StructType(Seq(
    StructField("g", StringType), StructField("slope_q", LongType),
    StructField("sgn", LongType), StructField("t", LongType)))
  private val rfmSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("last_us", LongType),
    StructField("f", LongType), StructField("m", LongType)))

  private def currentPointer(s: SparkSession, base: String): Option[(String, Option[Long])] =
    graft.sources.GraftFs.readSmallFile(s, s"$base/_CURRENT").map { c =>
      c.trim.split(":batch=") match {
        case Array(v, b) => (v, Some(b.toLong))
        case Array(v) => (v, None)
      }
    }

  private def readOr(s: SparkSession, base: String, sub: String,
      schema: StructType): DataFrame =
    currentPointer(s, base) match {
      case Some((v, _)) => s.read.schema(schema).parquet(s"$base/$v/$sub")
      case None =>
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Current hourly trend grain (empty before batch 0). */
  def readHourly(s: SparkSession, base: String): DataFrame =
    readOr(s, base, "hourly", trendSchema)

  /** Current maintained pairwise slope histogram (g, slope_q, sgn, t) —
    * the artifact that keeps the hours² Mann-Kendall/Sen pair grid OFF
    * the serve path (empty before batch 0).
    */
  def readSlopes(s: SparkSession, base: String): DataFrame =
    readOr(s, base, "slopes", slopeSchema)

  /** Current per-user RFM triple (empty before batch 0). */
  def readUsers(s: SparkSession, base: String): DataFrame =
    readOr(s, base, "users", rfmSchema)

  /** Pair histogram deltas between the cells of `a` and `b` — `a` and
    * `b` are (g, h, x) frames over DISJOINT hour sets when `within` is
    * false (each unordered pair enumerates once via the ≠ join +
    * least/greatest orientation), or the SAME frame when `within` is
    * true (strict < self-join). dx is always later-minus-earlier, the
    * one-shot slopeHistFromHourly formula verbatim.
    */
  private def pairHist(a: DataFrame, b: DataFrame, within: Boolean): DataFrame = {
    val bb = b.select(col("g").as("g2"), col("h").as("hb"), col("x").as("xb"))
    val joined =
      if (within) a.join(bb, col("g") === col("g2") && col("h") < col("hb"))
      else a.join(bb, col("g") === col("g2") && col("h") =!= col("hb"))
    joined
      .select(col("g"),
        when(col("h") < col("hb"), col("xb") - col("x"))
          .otherwise(col("x") - col("xb")).as("dx"),
        abs(col("hb") - col("h")).as("dh"))
      .withColumn("sgn", when(col("dx") > 0, 1L).when(col("dx") < 0, -1L).otherwise(0L))
      .withColumn("slope_q",
        expr("cast(floor((cast(dx as double) / dh) * 1000000.0) as bigint)"))
      .groupBy("g", "slope_q", "sgn").agg(count(lit(1)).cast(LongType).as("t"))
  }

  /** Merge one micro-batch of raw (g, h, x, user_id, ts_us, m) event
    * rows into the grains and swap versions; replays skipped by tag.
    * Batch cost: two tiny aggregates, two grain-sized full-outer merges,
    * and the slope-histogram delta — |touched cells| × |series hours|
    * pair enumerations, NEVER the full hours² grid (a time-ordered
    * ingest touches only the newest hours, so steady-state batches pay
    * |new hours| × |history| — linear in state, constant per batch at a
    * bounded retention window).
    */
  def processBatch(s: SparkSession, batch: DataFrame, base: String,
      batchId: Option[Long] = None): Unit = {
    val ptr = currentPointer(s, base)
    if (batchId.exists(id => ptr.flatMap(_._2).exists(_ >= id))) return
    val hP = batch.groupBy(col("g").as("g2"), col("h").as("h2"))
      .agg(sum("x").cast(LongType).as("x2")).localCheckpoint()
    val hOld = readHourly(s, base).localCheckpoint()
    val hM = hOld
      .join(hP, col("g") === col("g2") && col("h") === col("h2"), "full_outer")
      .select(coalesce(col("g"), col("g2")).as("g"),
        coalesce(col("h"), col("h2")).as("h"),
        (coalesce(col("x"), lit(0L)) + coalesce(col("x2"), lit(0L))).as("x"))
      .localCheckpoint()
    // slope-histogram maintenance: remove the pairs the touched cells'
    // OLD values contributed, add the pairs their NEW values contribute
    // — against the untouched remainder (hMinus) and among themselves
    val touchedKeys = hP.select(col("g2"), col("h2"))
    val tOld = hOld.join(touchedKeys,
      col("g") === col("g2") && col("h") === col("h2"), "left_semi").localCheckpoint()
    val tNew = hM.join(touchedKeys,
      col("g") === col("g2") && col("h") === col("h2"), "left_semi").localCheckpoint()
    val hMinus = hOld.join(touchedKeys,
      col("g") === col("g2") && col("h") === col("h2"), "left_anti").localCheckpoint()
    val negate = (d: DataFrame) => d.withColumn("t", -col("t"))
    val deltas = Seq(
      pairHist(tNew, hMinus, within = false),
      pairHist(tNew, tNew, within = true),
      negate(pairHist(tOld, hMinus, within = false)),
      negate(pairHist(tOld, tOld, within = true)))
    val slopesM = deltas.foldLeft(readSlopes(s, base))(_ unionByName _)
      .groupBy("g", "slope_q", "sgn").agg(sum("t").cast(LongType).as("t"))
      .filter(col("t") =!= 0L)
      .localCheckpoint()
    val uP = batch.groupBy(col("user_id").as("u2"))
      .agg(max("ts_us").as("l2"), count(lit(1)).as("f2"),
        sum("m").cast(LongType).as("m2"))
    val uM = readUsers(s, base)
      .join(uP, col("user_id") === col("u2"), "full_outer")
      .select(coalesce(col("user_id"), col("u2")).as("user_id"),
        greatest(coalesce(col("last_us"), lit(Long.MinValue)),
          coalesce(col("l2"), lit(Long.MinValue))).as("last_us"),
        (coalesce(col("f"), lit(0L)) + coalesce(col("f2"), lit(0L))).as("f"),
        (coalesce(col("m"), lit(0L)) + coalesce(col("m2"), lit(0L))).as("m"))
      .localCheckpoint()
    val next = s"v${ptr.map(_._1.drop(1).toLong + 1).getOrElse(0L)}"
    hM.write.mode("overwrite").parquet(s"$base/$next/hourly")
    slopesM.write.mode("overwrite").parquet(s"$base/$next/slopes")
    uM.write.mode("overwrite").parquet(s"$base/$next/users")
    val tag = batchId.orElse(ptr.flatMap(_._2)).fold("")(id => s":batch=$id")
    graft.sources.GraftFs.writeSmallFileAtomic(s, s"$base/_CURRENT", s"$next$tag")
  }

  /** The committed micro-batch id, if the writer threads one. */
  def committedBatch(s: SparkSession, base: String): Option[Long] =
    currentPointer(s, base).flatMap(_._2)

  /** MK/Sen trend from state — ≡ q_ts_trend one-shot, but the hours²
    * pair grid is never re-enumerated: the maintained slope histogram
    * feeds the shared tail directly (s, n_pairs, and the Sen median all
    * derive from it; n and ties from the hourly grain). Serve cost
    * tracks the HISTOGRAM size, not pairs.
    */
  def serveTrend(s: SparkSession, base: String): DataFrame =
    graft.operators.TimeSeriesQueries.trendFromParts(
      readHourly(s, base).localCheckpoint(), readSlopes(s, base))

  /** RFM segmentation from state — ≡ q_events_rfm one-shot. */
  def serveRfm(s: SparkSession, base: String): DataFrame =
    graft.operators.EventQueries.rfmFromUsers(readUsers(s, base))

  /** Attach to a stream of raw event rows via foreachBatch
    * (replay-protected via the batch-id tag).
    */
  def attach(rows: DataFrame, base: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      processBatch(batch.sparkSession, batch, base, Some(bid))
    }
}
