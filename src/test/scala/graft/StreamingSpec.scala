package graft

import java.nio.file.Files

import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

/** Group J batch-equivalence + behavioral specs (SURVEY.md §5.2(4)):
  * every streaming transform's final state over the finite events fixture
  * must equal its batch twin; late data below the watermark is dropped.
  */
class StreamingSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  private def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq: Seq[Any]).toSet

  test("s_tumbling: stream (complete mode) == batch twin") {
    val stream = StreamOps.tumbling(
      StreamOps.readEventsStream(spark, sfTiny).withWatermark("ts", "2 hours"))
    val got = runToMemory(stream, "t_tumbling", "complete")
    val want = StreamOps.tumbling(Tables.events(spark, sfTiny))
    rowsOf(got) shouldBe rowsOf(want)
  }

  test("s_sliding: stream == batch twin") {
    val stream = StreamOps.sliding(
      StreamOps.readEventsStream(spark, sfTiny).withWatermark("ts", "2 hours"))
    val got = runToMemory(stream, "t_sliding", "complete")
    rowsOf(got) shouldBe rowsOf(StreamOps.sliding(Tables.events(spark, sfTiny)))
  }

  test("s_session: stream == batch twin") {
    val stream = StreamOps.session(
      StreamOps.readEventsStream(spark, sfTiny).withWatermark("ts", "2 hours"))
    val got = runToMemory(stream, "t_session", "complete")
    rowsOf(got) shouldBe rowsOf(StreamOps.session(Tables.events(spark, sfTiny)))
  }

  test("s_dedup: streaming dropDuplicates emits exactly the distinct key set") {
    val stream = StreamOps.dedupKeys(StreamOps.readEventsStream(spark, sfTiny))
    val got = runToMemory(stream, "t_dedup", "append")
    val want = Tables.events(spark, sfTiny).select("user_id", "event_type").distinct()
    rowsOf(got) shouldBe rowsOf(want)
    got.count() shouldBe want.count() // no duplicate emissions
  }

  test("s_dedup contract: every key's duplicate arrivals fit inside the watermark horizon") {
    // dedupKeys' streaming/batch equivalence (dropDuplicatesWithinWatermark
    // vs plain dropDuplicates) only holds when all duplicates of a key
    // arrive within the horizon — pin the documented contract to the
    // fixture rather than assuming it (fixture spread reaches ~29.7 days,
    // which is why the default horizon is 35 days, not something shorter)
    val spread = Tables.events(spark, sfTiny)
      .groupBy("user_id", "event_type")
      .agg(((expr("unix_micros(cast(max(ts) as timestamp))")
        - expr("unix_micros(cast(min(ts) as timestamp))")) / 1000000L).cast("long").as("spread_s"))
      .agg(max("spread_s")).collect().head.getLong(0)
    spread should be <= 35L * 24 * 3600
  }

  test("s_stateful: final mapGroupsWithState counts == batch groupBy") {
    val stream = StreamOps.statefulCounts(StreamOps.readEventsStream(spark, sfTiny))
    val got = runToMemory(stream, "t_stateful", "update")
      .groupBy("user_id").agg(max("n_events").as("n_events")) // last update wins
    val want = Tables.events(spark, sfTiny).groupBy("user_id").agg(count(lit(1)).as("n_events"))
    rowsOf(got) shouldBe rowsOf(want)
  }

  test("s_static_join: stream x static dimension enrichment == batch twin") {
    val dim = Seq(("click", "C"), ("view", "V"), ("signup", "S"), ("purchase", "P"), ("error", "E"))
      .toDF("event_type", "type_label")
    val stream = StreamOps.enrichWithDim(StreamOps.readEventsStream(spark, sfTiny), dim)
    val got = runToMemory(stream, "t_static_join", "append")
    val want = StreamOps.enrichWithDim(Tables.events(spark, sfTiny), dim)
    rowsOf(got) shouldBe rowsOf(want)
    got.count() shouldBe Tables.events(spark, sfTiny).count() // every event enriched
  }

  test("s_join: stream-stream interval join == batch twin") {
    def side(t: String) = StreamOps.readEventsStream(spark, sfTiny)
      .filter(col("event_type") === t).withWatermark("ts", "2 hours")
    val stream = StreamOps.intervalJoin(side("click"), side("purchase"))
    val got = runToMemory(stream, "t_ssjoin", "append")
    val batch = Tables.events(spark, sfTiny)
    val want = StreamOps.intervalJoin(
      batch.filter(col("event_type") === "click").withColumn("ts", col("ts").cast("timestamp")),
      batch.filter(col("event_type") === "purchase").withColumn("ts", col("ts").cast("timestamp")))
    rowsOf(got) shouldBe rowsOf(want)
  }

  test("s_join_left: unmatched clicks emit null-padded on watermark expiry == batch left join") {
    val dir = Files.createTempDirectory("graft_louter").toFile.getAbsolutePath
    def write(name: String, rows: Seq[(Long, String, Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft_louter_w").toFile.getAbsolutePath
      rows.toDF("event_id", "ts_str", "user_id", "event_type")
        .select(col("event_id"),
          expr("unix_micros(cast(to_timestamp(ts_str) as timestamp)) * 1000").as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
      ()
    }
    // user 1's click matches its purchase; user 2's click has no purchase
    // and must surface null-padded once the watermark proves it expired.
    write("f1.parquet", Seq((1L, "2024-01-01 10:00:00", 1L, "click"),
      (2L, "2024-01-01 10:05:00", 2L, "click"), (3L, "2024-01-01 10:08:00", 1L, "purchase")))
    Thread.sleep(1100)
    // two filler batches (users ≥ 90) advance the watermark far past
    // 10:15 on BOTH sides; eviction lags the computed watermark by one
    // batch, hence two files (same lag the s_late test pins)
    write("f2.parquet", Seq((90L, "2024-01-01 13:00:00", 99L, "click"),
      (91L, "2024-01-01 13:00:00", 99L, "purchase")))
    Thread.sleep(1100)
    write("f3.parquet", Seq((92L, "2024-01-01 14:00:00", 98L, "click"),
      (93L, "2024-01-01 14:00:00", 98L, "purchase")))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def src() = StreamOps.normalizeTs(
      spark.readStream.schema(StreamOps.eventsRawSchema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false").parquet(dir))
    def side(df: DataFrame, t: String) =
      df.filter(col("event_type") === t).withWatermark("ts", "10 minutes")
    val stream = StreamOps.intervalJoinLeftOuter(side(src(), "click"), side(src(), "purchase"))
    val got = runToMemory(stream, "t_louter", "append").filter(col("user_id") < 90)
    val batchAll = StreamOps.normalizeTs(
      spark.read.schema(StreamOps.eventsRawSchema).parquet(dir))
    val want = StreamOps.intervalJoinLeftOuter(
      batchAll.filter(col("event_type") === "click"),
      batchAll.filter(col("event_type") === "purchase")).filter(col("user_id") < 90)
    rowsOf(got) shouldBe rowsOf(want)
    got.filter(col("purchase_id").isNull).count() shouldBe 1L // user 2's expiry row
    got.count() shouldBe 2L
  }

  test("s_stateful on RocksDB state store: counts == batch and rocksdb provider engaged") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = StreamOps.statefulCounts(StreamOps.readEventsStream(spark, sfTiny))
      val q = stream.writeStream.format("memory").queryName("t_rocksdb")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("t_rocksdb")
        .groupBy("user_id").agg(max("n_events").as("n_events"))
      val want = Tables.events(spark, sfTiny).groupBy("user_id").agg(count(lit(1)).as("n_events"))
      rowsOf(got) shouldBe rowsOf(want)
      // the run must actually have gone through RocksDB, not the default
      // HDFS-backed provider — its custom metrics are rocksdb-prefixed
      val stateMetrics = q.recentProgress.flatMap(_.stateOperators)
        .flatMap(so => scala.jdk.CollectionConverters.MapHasAsScala(so.customMetrics).asScala.keys)
      stateMetrics.exists(_.startsWith("rocksdb")) shouldBe true
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_stateful_tws: transformWithState counter == batch groupBy (RocksDB-backed)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // transformWithState REQUIRES the RocksDB provider in streaming
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = StreamOps.statefulCountsTws(StreamOps.readEventsStream(spark, sfTiny))
      val got = runToMemory(stream, "t_tws", "update")
        .groupBy("user_id").agg(max("n_events").as("n_events")) // last update wins
      val want = Tables.events(spark, sfTiny).groupBy("user_id").agg(count(lit(1)).as("n_events"))
      rowsOf(got) shouldBe rowsOf(want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_sink: checkpointed parquet file sink resumes exactly-once across restarts") {
    val srcDir = Files.createTempDirectory("graft_sink_src").toFile.getAbsolutePath
    val outDir = Files.createTempDirectory("graft_sink_out").toFile.getAbsolutePath + "/data"
    val cpDir = Files.createTempDirectory("graft_sink_cp").toFile.getAbsolutePath
    def write(name: String, ids: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory("graft_sink_w").toFile.getAbsolutePath
      ids.toDF("event_id")
        .select(col("event_id"), (col("event_id") * 1000000000L).as("ts"),
          lit(1L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(srcDir, name))
      ()
    }
    def runOnce(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val src = spark.readStream.schema(StreamOps.eventsRawSchema).parquet(srcDir)
      val q = StreamOps.normalizeTs(src)
        .select("event_id", "user_id")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", cpDir)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    write("b1.parquet", Seq(1L, 2L, 3L))
    runOnce()
    spark.read.parquet(outDir).count() shouldBe 3
    // new data arrives while the query is down; restart from the checkpoint
    write("b2.parquet", Seq(10L, 11L))
    runOnce()
    val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted
    ids shouldBe Array(1L, 2L, 3L, 10L, 11L) // b1 NOT reprocessed, b2 present
  }

  test("s_foreachbatch: custom sink sees every micro-batch exactly once, union == input") {
    val srcDir = Files.createTempDirectory("graft_feb_src").toFile.getAbsolutePath
    def write(name: String, ids: Seq[Long]): Unit = {
      val tmp = Files.createTempDirectory("graft_feb_w").toFile.getAbsolutePath
      ids.toDF("event_id")
        .select(col("event_id"), (col("event_id") * 1000000000L).as("ts"),
          lit(1L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(srcDir, name))
      ()
    }
    write("a.parquet", Seq(1L, 2L))
    write("b.parquet", Seq(3L, 4L, 5L))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (batchId, event_id)
    val src = spark.readStream.schema(StreamOps.eventsRawSchema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
    val q = StreamOps.normalizeTs(src).select("event_id")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        seen.synchronized { seen ++= batch.collect().map(r => batchId -> r.getLong(0)) }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    seen.map(_._1).toSet.size shouldBe 2 // one invocation per micro-batch (file)
    seen.map(_._2).sorted.toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L) // exactly the input, once
  }

  test("s_ewma/s_anomaly: multi-batch TWS stream over time-split files == batch twin") {
    import graft.streaming.TimeSeriesState
    val dir = Files.createTempDirectory("graft_ts_stream").toFile.getAbsolutePath
    // fixture events cut into 3 time-ordered files → 3 micro-batches in
    // event-time order (the CDC-ingest shape these processors assume)
    val raw = Tables.eventsRawNanos(spark, sfTiny)
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val parts = raw.withColumn("part", ntile(3).over(w)).cache()
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_ts_w$i").toFile.getAbsolutePath
      parts.filter(col("part") === i).drop("part")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    parts.unpersist()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      def src() = StreamOps.normalizeTs(
        spark.readStream.schema(StreamOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
          .parquet(dir))

      // anomaly: each row is scored exactly once against its preceding
      // window regardless of batching — union of emissions == batch run
      val gotAnom = runToMemory(TimeSeriesState.anomalyTws(src()), "t_anom_tws", "update")
      val wantAnom = TimeSeriesState.anomalyTws(Tables.events(spark, sfTiny))
      rowsOf(gotAnom) shouldBe rowsOf(wantAnom)
      wantAnom.count() should be > 0L

      // ewma: last emission per user (max n_seen) ≈ batch single-pass value;
      // cross-batch aging reassociates the fold, so compare at 1e-6
      val gotE = runToMemory(TimeSeriesState.ewmaTws(src()), "t_ewma_tws", "update")
      val lastPerUser = gotE.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(desc("n_seen"))))
        .filter(col("rn") === 1).select("user_id", "ewma")
      val wantE = TimeSeriesState.ewmaTws(Tables.events(spark, sfTiny))
        .select("user_id", "ewma")
      val joined = lastPerUser.alias("g").join(wantE.alias("b"), "user_id")
        .select(abs(col("g.ewma") - col("b.ewma")).as("d")).collect()
      joined.length shouldBe wantE.count()
      all(joined.map(_.getDouble(0))) should be < 1e-6
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_attribution: multi-batch TWS last-touch stream == batch twin (exact)") {
    import graft.streaming.EventState
    val dir = Files.createTempDirectory("graft_attr_stream").toFile.getAbsolutePath
    val raw = Tables.eventsRawNanos(spark, sfTiny)
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val parts = raw.withColumn("part", ntile(3).over(w)).cache()
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_attr_w$i").toFile.getAbsolutePath
      parts.filter(col("part") === i).drop("part")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    parts.unpersist()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      def src() = StreamOps.normalizeTs(
        spark.readStream.schema(StreamOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
          .parquet(dir))
      // each purchase is credited exactly once, in its arrival batch, and
      // the credit is integer microseconds — union of emissions must equal
      // the one-shot batch run EXACTLY (no float tolerance needed)
      val got = runToMemory(EventState.attributionTws(src()), "t_attr_tws", "update")
      val want = EventState.attributionTws(Tables.events(spark, sfTiny))
      rowsOf(got) shouldBe rowsOf(want)
      want.filter(col("attributed_click").isNotNull).count() should be > 0L
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_cusum: multi-batch TWS fixed-reference CUSUM stream == batch twin (exact)") {
    import graft.streaming.TimeSeriesState
    val dir = Files.createTempDirectory("graft_cusum_stream").toFile.getAbsolutePath
    val raw = Tables.eventsRawNanos(spark, sfTiny)
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val parts = raw.withColumn("part", ntile(3).over(w)).cache()
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_cusum_w$i").toFile.getAbsolutePath
      parts.filter(col("part") === i).drop("part")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    parts.unpersist()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      def src() = StreamOps.normalizeTs(
        spark.readStream.schema(StreamOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
          .parquet(dir))
      // integer-cents state: s = max(0, s + drift) commutes with batch
      // boundaries, so the union of per-batch emissions must equal the
      // one-shot batch run EXACTLY
      val got = runToMemory(TimeSeriesState.cusumTws(src()), "t_cusum_tws", "update")
      val want = TimeSeriesState.cusumTws(Tables.events(spark, sfTiny))
      rowsOf(got) shouldBe rowsOf(want)
      want.count() should be > 0L
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_session_timer: event-time timers emit sessions on inactivity timeout == batch session set") {
    import graft.streaming.SessionTimerState
    val dir = Files.createTempDirectory("graft_sess_timer").toFile.getAbsolutePath
    val raw = Tables.eventsRawNanos(spark, sfTiny)
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val parts = raw.withColumn("part", ntile(3).over(w)).cache()
    (1 to 3).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_st_w$i").toFile.getAbsolutePath
      parts.filter(col("part") === i).drop("part")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    val maxNs = raw.agg(max("ts")).first().getLong(0)
    parts.unpersist()
    // two far-future sentinel batches: the first advances the watermark
    // past every open session's last + gap, the second gives the engine a
    // batch to fire those timers under the advanced watermark
    val sentinelUser = 999999L
    def writeSentinel(name: String, tsNs: Long, id: Long): Unit = {
      val tmp = Files.createTempDirectory("graft_st_s").toFile.getAbsolutePath
      Seq((id, tsNs, sentinelUser, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
      ()
    }
    writeSentinel("f4.parquet", maxNs + 3L * 1800L * 1000000000L, 9999901L)
    Thread.sleep(1100)
    writeSentinel("f5.parquet", maxNs + 4L * 1800L * 1000000000L, 9999902L)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      def src() = StreamOps.normalizeTs(
        spark.readStream.schema(StreamOps.eventsRawSchema)
          .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
          .parquet(dir))
      // time-ordered feed (the CDC-ingest contract the TWS specs share):
      // an in-gap continuation can never be below the watermark, so a
      // 1-second delay is sound and timers only fire for truly quiet users
      val got = runToMemory(
        SessionTimerState.sessionsByTimer(src().withWatermark("ts", "1 second")),
        "t_sess_timer", "append")
        .filter(col("user_id") =!= sentinelUser)
      // every fixture session must be emitted — gap-crossed ones inline,
      // each user's FINAL session by its inactivity timer — and match the
      // batch lag/cumsum session set exactly
      val want = graft.operators.EventQueries.sessionize.query(spark, sfTiny)
        .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      rowsOf(got.select("user_id", "start_us", "end_us", "n_events")) shouldBe rowsOf(want)
      want.count() should be > 0L
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  // -------- processing-time timers (TTL sweep + timer-driven flush) --------
  // One continuously-running query per test: with processing-time timers
  // registered, MicroBatchExecution self-schedules batches, so expired
  // timers fire WITHOUT new data arriving — exactly the property a state-GC
  // sweep needs (an abandoned key must expire even if the source never
  // produces another event). The test polls the memory sink with deadlines;
  // TTLs are far above per-batch latency so "quiet" is unambiguous.

  private def awaitRows(name: String, n: Long, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(name).count() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
  }

  test("s_ttl_sweep: processing-time timers expire abandoned keys exactly once and clear state") {
    import graft.streaming.TtlTimerState
    val dir = Files.createTempDirectory("graft_ttl").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_ttl_ck").toFile.getAbsolutePath
    val ttlMs = 6000L
    val ttlSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    def writeEvents(name: String, rows: Seq[(Long, String, Double)]): Unit = {
      val tmp = Files.createTempDirectory("graft_ttl_w").toFile.getAbsolutePath
      rows.toDF("user_id", "ts_str", "value")
        .select(col("user_id"), to_timestamp(col("ts_str")).as("ts"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
      ()
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    writeEvents("f1.parquet", Seq(
      (1L, "2024-01-01 10:00:00", 2.0), (1L, "2024-01-01 10:05:00", 3.0),
      (2L, "2024-01-01 10:01:00", 7.0)))
    val q = TtlTimerState.aggWithTtl(
        spark.readStream.schema(ttlSchema).parquet(dir), ttlMs)
      .writeStream.format("memory").queryName("t_ttl").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      // active keys must NOT emit: wait well past processing, before the TTL
      Thread.sleep(3000)
      spark.table("t_ttl").count() shouldBe 0L
      // both keys go quiet a full TTL of wall time → sweep emits + clears,
      // with NO new data arriving to trigger the batch
      awaitRows("t_ttl", 2, 30000)
      val p1 = spark.table("t_ttl").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      p1 shouldBe Map(1L -> ((2L, 5.0)), 2L -> ((1L, 7.0)))
      // key 1 REAPPEARS: expired state was cleared, so its second quiet
      // period must emit a FRESH aggregate (only the new event) — and only
      // once (count settles at 3)
      writeEvents("f2.parquet", Seq((1L, "2024-01-01 10:40:00", 100.0)))
      awaitRows("t_ttl", 3, 30000)
      Thread.sleep(2000) // grace: no duplicate emission may follow
      val rows = spark.table("t_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      rows.size shouldBe 3
      rows.count(_ == ((1L, 1L, 100.0))) shouldBe 1 // fresh, not 3 events/105.0
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_shard_flush_timer: shard partials merge across batches and flush once on quiet") {
    import graft.streaming.TtlTimerState
    val dir = Files.createTempDirectory("graft_shflush").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_shflush_ck").toFile.getAbsolutePath
    val flushMs = 8000L // far above per-batch latency: mid-shard must not flush
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_bytes", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType)))
    def writeDocs(name: String, rows: Seq[(Long, Long, Long, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_shflush_w").toFile.getAbsolutePath
      rows.toDF("shard_id", "doc_id", "n_bytes", "n_tokens")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
      ()
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // batch 1: shard 0 complete, shard 1 OPEN (first half of its docs)
    writeDocs("f1.parquet", Seq(
      (0L, 10L, 8000L, 1500L), (0L, 11L, 8400L, 1600L),
      (1L, 12L, 9000L, 1700L)))
    val q = TtlTimerState.shardFlushByTimer(
        spark.readStream.schema(docSchema).parquet(dir), flushMs)
      .writeStream.format("memory").queryName("t_shflush").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      // within the flush window, feed shard 1's second half + shard 2: the
      // open shard's timer re-arms and its partials merge in state
      Thread.sleep(2500)
      spark.table("t_shflush").count() shouldBe 0L
      writeDocs("f2.parquet", Seq(
        (1L, 13L, 7500L, 1400L), (2L, 14L, 6000L, 1100L)))
      // all shards go quiet → each flushes exactly once, shard 1 with
      // totals merged across its two batches
      awaitRows("t_shflush", 3, 40000)
      Thread.sleep(2000) // grace: no shard may flush twice
      val flushed = spark.table("t_shflush").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      spark.table("t_shflush").count() shouldBe 3L
      flushed(0L) shouldBe ((2L, 16400L, 3100L, 10L, 11L))
      flushed(1L) shouldBe ((2L, 16500L, 3100L, 12L, 13L)) // merged across batches
      flushed(2L) shouldBe ((1L, 6000L, 1100L, 14L, 14L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("s_late: events below the watermark are dropped from append-mode windows") {
    val dir = Files.createTempDirectory("graft_late").toFile.getAbsolutePath
    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft_late_w").toFile.getAbsolutePath
      rows.toDF("event_id", "ts_str")
        .select(col("event_id"),
          expr("unix_micros(cast(to_timestamp(ts_str) as timestamp)) * 1000").as("ts"),
          lit(1L).as("user_id"), lit("click").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(dir, name))
      ()
    }
    // batch 0: window [10:00,11:00) gets 2 events; max ts 12:00 → wm 11:30.
    // Spark applies the *eviction* watermark one batch after computing it and
    // the *late-row* watermark one batch after that (late filter lags
    // eviction by one batch), so a filler batch sits between max-ts and the
    // late arrival.
    write("f1.parquet", Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:10:00"), (3L, "2024-01-01 12:00:00")))
    Thread.sleep(1100) // distinct mod times → deterministic file order
    write("f2.parquet", Seq((6L, "2024-01-01 12:05:00")))
    Thread.sleep(1100)
    // batch 2: 10:20 is below the 11:30 late-row watermark (late → dropped)
    write("f3.parquet", Seq((4L, "2024-01-01 10:20:00"), (5L, "2024-01-01 12:30:00")))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream.schema(StreamOps.eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(dir)
    val agg = StreamOps.normalizeTs(src)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(cast(w.start as timestamp))").as("ws"), col("n"))
    val got = runToMemory(agg, "t_late", "append").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tenAm = java.time.Instant.parse("2024-01-01T10:00:00Z").toEpochMilli * 1000
    got(tenAm) shouldBe 2L // late event 4 NOT counted
  }
}
