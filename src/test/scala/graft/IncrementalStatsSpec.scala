package graft

import java.nio.file.Files

import graft.operators.StatQueries
import graft.streaming.IncrementalStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

/** One histogram state serves the whole inference layer: replay the
  * fixture in three micro-batches through IncrementalStats.processBatch
  * (the attach() wiring is the same foreachBatch passthrough
  * IncrementalAggSpec proves end-to-end) and assert each state-served
  * statistic equals its one-shot query EXACTLY — row strings, not
  * tolerances. This is the point of the value-distinct state design:
  * everything downstream of the histogram is exact arithmetic, so
  * incremental ≡ batch is an identity, not an approximation.
  */
class IncrementalStatsSpec extends SparkTestBase with Matchers {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(12, 2)) * 100).cast(LongType)

  private def replay(base0: DataFrame, keyCol: String): String = {
    val stateBase = Files.createTempDirectory("graft_incstats").toFile.getAbsolutePath
    for (i <- 0 until 3)
      IncrementalStats.processBatch(spark,
        base0.filter(abs(hash(col(keyCol))) % 3 === i), stateBase)
    stateBase
  }

  test("state-served MW / KS / Welch t equal their one-shot twins exactly") {
    val base = Tables.orders(spark, sfTiny)
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderkey"), col("o_orderstatus").as("grp"),
        cents(col("o_totalprice")).as("v"))
    val stateBase = replay(base, "o_orderkey")
    // three merges → three state versions behind _CURRENT
    new java.io.File(stateBase).listFiles()
      .count(_.getName.startsWith("v")) should be >= 3
    def rows(df: DataFrame) = df.collect().map(_.toString).toSeq
    val b = base.select("grp", "v")
    rows(IncrementalStats.serveMannWhitney(spark, stateBase, "O")) shouldBe
      rows(StatQueries.mannWhitneyOn(b, "O"))
    rows(IncrementalStats.serveKs(spark, stateBase, "O")) shouldBe
      rows(StatQueries.ksOn(b, "O"))
    rows(IncrementalStats.serveTtest(spark, stateBase, "O")) shouldBe
      rows(StatQueries.ttestOn(b, "O"))
  }

  test("state-served Kruskal-Wallis / ANOVA equal their one-shot twins exactly") {
    val base = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), col("o_orderpriority").as("grp"),
        cents(col("o_totalprice")).as("v"))
    val stateBase = replay(base, "o_orderkey")
    def rows(df: DataFrame) = df.collect().map(_.toString).toSeq
    val b = base.select("grp", "v")
    rows(IncrementalStats.serveKruskal(spark, stateBase)) shouldBe
      rows(StatQueries.kruskalOn(b))
    rows(IncrementalStats.serveAnova(spark, stateBase)) shouldBe
      rows(StatQueries.anovaOn(b))
    // r10: the SAME histogram serves MAD — state-served ≡ one-shot exactly
    rows(IncrementalStats.serveMad(spark, stateBase)) shouldBe
      rows(StatQueries.madOn(b))
    rows(StatQueries.statMad.query(spark, sfTiny)) shouldBe
      rows(StatQueries.madOn(b))
    // the registered one-shot queries themselves are untouched by the
    // histogram refactor: q_stat_anova still matches its own run
    rows(StatQueries.statAnova.query(spark, sfTiny)) shouldBe
      rows(StatQueries.anovaOn(b))
  }

  test("crash-replay of a committed batch id is skipped, not re-merged") {
    val stateBase = Files.createTempDirectory("graft_incstats_rp").toFile.getAbsolutePath
    val base = Tables.orders(spark, sfTiny)
      .select(col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("v"))
    val b0 = base.filter(abs(hash(col("v"))) % 2 === 0)
    val b1 = base.filter(abs(hash(col("v"))) % 2 === 1)
    IncrementalStats.processBatch(spark, b0, stateBase, Some(0L))
    IncrementalStats.processBatch(spark, b1, stateBase, Some(1L))
    def hist(df: DataFrame) = df.orderBy("grp", "v").collect().map(_.toString).toSeq
    def rows(df: DataFrame) = df.collect().map(_.toString).toSeq
    val committed = hist(IncrementalStats.readState(spark, stateBase))
    // a crash between the state swap and the sink commit re-delivers the
    // SAME batch: re-merging would double every (grp, v) count and
    // silently corrupt every state-served statistic — it must be a no-op
    IncrementalStats.processBatch(spark, b1, stateBase, Some(1L))
    IncrementalStats.processBatch(spark, b0, stateBase, Some(0L))
    hist(IncrementalStats.readState(spark, stateBase)) shouldBe committed
    rows(IncrementalStats.serveKruskal(spark, stateBase)) shouldBe
      rows(StatQueries.kruskalOn(base))
  }

  test("foreachBatch attach over a real file stream == one-shot (Kruskal + ANOVA)") {
    import graft.streaming.StreamOps
    import org.apache.spark.sql.streaming.Trigger
    val stateBase = Files.createTempDirectory("graft_incstats_state").toFile.getAbsolutePath
    val cpDir = Files.createTempDirectory("graft_incstats_cp").toFile.getAbsolutePath
    val srcDir = Files.createTempDirectory("graft_incstats_src").toFile.getAbsolutePath
    val events = Tables.eventsRawNanos(spark, sfTiny)
    for (i <- 0 until 3) {
      events.filter(abs(hash(col("event_id"))) % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/part$i")
      val f = new java.io.File(s"$srcDir/part$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(srcDir, s"f$i.parquet"))
      Thread.sleep(1100) // distinct mod times → deterministic file order
    }
    val stream = StreamOps.normalizeTs(
      spark.readStream.schema(StreamOps.eventsRawSchema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .option("pathGlobFilter", "f*.parquet")
        .parquet(srcDir))
      .select(col("event_type").as("grp"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
    val q = IncrementalStats.attach(stream, stateBase)
      .option("checkpointLocation", cpDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true
    new java.io.File(stateBase).listFiles()
      .count(_.getName.startsWith("v")) should be >= 3
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    val oneShot = Tables.events(spark, sfTiny)
      .select(col("event_type").as("grp"),
        (col("value").cast(DecimalType(12, 2)) * 100).cast(LongType).as("v"))
    rows(IncrementalStats.serveKruskal(spark, stateBase)) shouldBe
      rows(StatQueries.kruskalOn(oneShot))
    rows(IncrementalStats.serveAnova(spark, stateBase)) shouldBe
      rows(StatQueries.anovaOn(oneShot))
  }
}
