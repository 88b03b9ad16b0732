package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group J — streaming transforms (SURVEY.md §2.B Group J).
  *
  * Each transform takes a DataFrame and works identically on a batch frame
  * and a `readStream` frame — that is the batch-equivalence contract the
  * StreamingSpec asserts (final streaming state over the finite events
  * fixture == batch result). Watermarks bound state: at 100 TB/day the
  * tumbling/sliding/session aggregations hold only the open windows per
  * key, and dedupKeys evicts key state past its configurable watermark horizon
  * (dropDuplicatesWithinWatermark — see dedupKeys).
  */
object StreamOps {
  private val D = DecimalType(9, 2)

  /** Events schema with ts as raw epoch-nanos long — what
    * Tables.eventsRawNanos yields and what the specs' self-written
    * source files contain (plain int64, no logical annotation).
    */
  val eventsRawSchema: StructType = eventsFixtureSchema(tsIsNanosLong = true)

  /** Schema of the events FIXTURE with ts in its on-disk form: raw
    * epoch-nanos long for the TIMESTAMP(NANOS) fixture encoding, native
    * TIMESTAMP_NTZ for the regenerated TIMESTAMP(MICROS) one (see
    * Tables.events — a streaming source must declare its schema up
    * front, so the encoding is probed batch-side first).
    */
  def eventsFixtureSchema(tsIsNanosLong: Boolean): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", if (tsIsNanosLong) LongType else TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events fixture. The file source requires a
    * directory, so the SF dir is the base path with a glob selecting the
    * events file.
    */
  def readEventsStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nanos = Tables.eventsTsIsNanosLong(spark, dir)
    val r = spark.readStream.schema(eventsFixtureSchema(nanos))
      .option("pathGlobFilter", "events.parquet")
    val r2 = maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n))
    normalizeTs(r2.parquet(dir))
  }

  /** On-disk ts → micro TimestampType (LTZ). Streaming watermarks reject
    * TIMESTAMP_NTZ, so the streaming path uses the LTZ type; with the UTC
    * session both carry identical epoch micros, and every output column is
    * an epoch long, so batch twins (NTZ via Tables.events) agree exactly.
    * Handles both fixture encodings (nanos long / native NTZ).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalArgumentException(s"events.ts: expected nanos-long or TIMESTAMP_NTZ, got $other")
    }

  /** s_tumbling: 1-hour tumbling window counts + decimal-exact value sums. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast(D)).cast(DecimalType(38, 2)).cast(DoubleType).as("sum_value"))
      .select(expr("unix_micros(cast(w.start as timestamp))").as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** s_sliding: 1-hour window sliding every 30 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(cast(w.start as timestamp))").as("win_start_us"),
        col("event_type"), col("n"))

  /** s_session: per-user session windows with a 30-minute gap. */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(cast(w.start as timestamp))").as("session_start_us"),
        expr("unix_micros(cast(w.end as timestamp))").as("session_end_us"),
        col("n_events"))

  /** s_dedup: first row per (user_id, event_type). In streaming mode the
    * dedup state is bounded: a watermark + dropDuplicatesWithinWatermark
    * evicts keys once the watermark passes them (plain dropDuplicates on a
    * key subset that excludes the event-time column would keep state
    * forever). Batch mode is a plain distinct — identical key set ONLY
    * when every key's duplicate arrivals fall inside the horizon, so the
    * horizon is a parameter and its default is sized to the dedup window
    * it must cover (the fixture spans 30 days of events; duplicate spreads
    * reach ~29.7 days — StreamingSpec pins the spread ≤ horizon contract
    * rather than assuming it). At scale the horizon IS the state-size
    * knob: state ≈ distinct keys arriving per horizon.
    */
  def dedupKeys(events: DataFrame, horizon: String = "35 days"): DataFrame = {
    val deduped =
      if (events.isStreaming)
        events.withWatermark("ts", horizon)
          .dropDuplicatesWithinWatermark("user_id", "event_type")
      else events.dropDuplicates("user_id", "event_type")
    deduped.select("user_id", "event_type")
  }

  /** s_join: stream–stream interval join — purchases matched to clicks of
    * the same user within the 10 minutes before the purchase. Watermarks on
    * both sides + the time-range join condition bound the buffered state
    * (clicks older than the watermark minus the interval are evicted).
    * Works identically on batch frames — the batch twin is q_join_interval's
    * semantics (StreamingSpec asserts equality).
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(p,
      col("cu") === col("pu")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("cu").as("user_id"))
  }

  /** s_join_left: stream–stream LEFT OUTER interval join — every click
    * emits; clicks with no purchase in the following 10 minutes emit
    * null-padded once the watermark proves no match can still arrive
    * (state-timeout semantics: Spark buffers the left row until the right
    * side's watermark passes click_ts + 10 min, then emits the outer row
    * and evicts — the enrichment-pipeline shape where unmatched events
    * must still flow downstream). Both inputs need watermarks; on batch
    * frames the same code is a plain left join, which is the equivalence
    * StreamingSpec asserts (modulo the watermark-advancing filler rows).
    */
  def intervalJoinLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id").as("cu"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(p,
      col("cu") === col("pu")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("click_id"), col("purchase_id"), col("cu").as("user_id"))
  }

  /** s_static_join: stream ⋈ static dimension — the enrichment pattern
    * (every micro-batch hash-joins against the in-memory/broadcastable
    * dim; no streaming state at all, so nothing to watermark). Works
    * identically on batch frames; StreamingSpec asserts equality.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(dim, "event_type")
      .select(col("event_id"), col("event_type"), col("type_label"))

  /** s_stateful_tws: the per-user counter on Spark 4's transformWithState —
    * the successor API to mapGroupsWithState (typed ValueState handles,
    * multiple state variables per processor, timers, state TTL). Requires
    * the RocksDB state-store provider in streaming (enforced by Spark),
    * which is the 100 TB-state configuration anyway; StreamingSpec runs it
    * there and asserts batch-equal counts.
    */
  private class UserCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, (Long, Long)] {
    @transient private var countState: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      countState = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[Long],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
      val n = (if (countState.exists()) countState.get() else 0L) + rows.size
      countState.update(n)
      Iterator.single((key, n))
    }
  }

  def statefulCountsTws(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .transformWithState(new UserCountProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events")
  }

  /** Register the driver's StateStoreCoordinator RPC endpoint by running
    * one zero-work streaming query (rate source → noop sink,
    * AvailableNow). Spark creates the coordinator lazily when the first
    * STREAMING query starts; batch transformWithState resolves the same
    * endpoint and throws RpcEndpointNotFoundException in a session that
    * has never streamed. Once per JVM.
    */
  // keyed by applicationId, not a JVM boolean: the coordinator endpoint
  // dies with its SparkContext, so a later session in the same JVM (specs,
  // diagnostics) must re-warm or batch TWS throws RpcEndpointNotFoundException
  @volatile private var coordinatorWarmApp: String = ""
  def ensureStateStoreCoordinator(s: SparkSession): Unit = synchronized {
    if (coordinatorWarmApp != s.sparkContext.applicationId) {
      val q = s.readStream.format("rate").option("rowsPerSecond", "1").load()
        .writeStream.format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(30000)
      q.stop()
      coordinatorWarmApp = s.sparkContext.applicationId
    }
  }

  /** s_stateful: arbitrary stateful per-user event counting via
    * mapGroupsWithState (GroupState[Long]). In streaming Update mode each
    * micro-batch emits the running count per touched user; in batch mode the
    * same code yields the final totals — which is exactly the oracle twin.
    */
  def statefulCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n_events")
  }
}
