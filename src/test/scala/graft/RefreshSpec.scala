package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.duration._

import graft.operators.{Refresh, RefresherApp, RefreshResult, RefreshTarget}
import org.apache.spark.sql.functions.{col, to_date}
import org.scalatest.matchers.should.Matchers

/** Group A behavioral specs (SURVEY.md §5.2(2)): staleness→refresh→fresh,
  * bounded fan-out window, per-target timeout, exit-code fold, target
  * parsing. Mirrors /root/reference/impala-refresher.go semantics.
  */
class RefreshSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  test("E-R1 refresh_table: re-scan sees files added behind the catalog's back") {
    val dir = Files.createTempDirectory("graft_refresh").toFile.getAbsolutePath
    Seq(1L, 2L, 3L).toDF("v").write.mode("overwrite").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS graft_stale_t")
    spark.sql(s"CREATE TABLE graft_stale_t (v BIGINT) USING parquet LOCATION '$dir'")
    spark.table("graft_stale_t").count() shouldBe 3
    // append a file behind the catalog's back
    Seq(4L, 5L).toDF("v").write.mode("append").parquet(dir)
    spark.table("graft_stale_t").count() shouldBe 3 // stale file index
    Refresh.refreshTable(spark, "graft_stale_t")
    spark.table("graft_stale_t").count() shouldBe 5 // fresh after refresh
    spark.sql("DROP TABLE graft_stale_t")
  }

  test("E-R6 refresh_partition: one event_date dir refreshed, re-list cost partition-pruned") {
    // date-partitioned events layout (the PartitionedEvents shape) behind
    // the listing-counting FileSystem so directory listings are observable
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftcount.impl", classOf[CountingFileSystem].getName)
    val local = Files.createTempDirectory("graft_prefresh").toFile.getAbsolutePath
    val base = s"graftcount:$local"
    Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), to_date(col("ts")).as("event_date"))
      .filter(col("event_date").isin("2024-01-01", "2024-01-02", "2024-01-03"))
      .write.mode("overwrite").partitionBy("event_date").parquet(base)
    spark.sql("DROP TABLE IF EXISTS graft_pr_events")
    spark.sql(s"""CREATE TABLE graft_pr_events
      (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, event_date DATE)
      USING parquet PARTITIONED BY (event_date) LOCATION '$base'""")
    spark.sql("ALTER TABLE graft_pr_events RECOVER PARTITIONS")
    def dayCount(d: String): Long =
      spark.table("graft_pr_events").filter(col("event_date") === d).count()
    val d1n = dayCount("2024-01-01")
    d1n should be > 0L
    // append a file into the 2024-01-01 dir behind the catalog's back
    Seq((900001L, 1L, "click", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(s"$base/event_date=2024-01-01")
    dayCount("2024-01-01") shouldBe d1n // stale file index
    // Impala parity: refreshing an unknown partition is an error, not a no-op
    an[IllegalArgumentException] should be thrownBy
      Refresh.refreshPartition(spark, "graft_pr_events", Map("event_date" -> "2030-12-31"))
    Refresh.refreshPartition(spark, "graft_pr_events", Map("event_date" -> "2024-01-01"))
    // the refreshed partition sees the new file...
    CountingFileSystem.reset()
    dayCount("2024-01-01") shouldBe d1n + 1
    // ...and paid listing ONLY for its own directory: the re-list after the
    // refresh is partition-pruned (the property that keeps a partition
    // refresh cheap when the table has 10k other partitions)
    val listedDirs = CountingFileSystem.listedPaths.filter(_.contains("event_date="))
    listedDirs should not be empty
    all(listedDirs) should include("event_date=2024-01-01")
    spark.sql("DROP TABLE graft_pr_events")
  }

  test("E-R2 refresh_fanout: all targets refreshed, parallelism ≤ bound") {
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val action: String => Unit = { _ =>
      val now = inFlight.incrementAndGet()
      maxSeen.accumulateAndGet(now, math.max)
      Thread.sleep(100)
      inFlight.decrementAndGet()
      ()
    }
    val targets = (1 to 8).map(i => RefreshTarget(s"t$i"))
    val results = Refresh.refreshAll(spark, targets, 30.seconds, concurrency = 3, action = action)
    results.size shouldBe 8
    all(results.map(_.ok)) shouldBe true
    maxSeen.get() should be <= 3
    maxSeen.get() should be >= 2 // it actually ran concurrently
  }

  test("E-R3 refresh_timeout: slow target marked failed with duration recorded") {
    val action: String => Unit = {
      case "slow" => Thread.sleep(5000)
      case _      => ()
    }
    val results = Refresh.refreshAll(spark,
      Seq(RefreshTarget("fast"), RefreshTarget("slow")), 500.millis, 0, action)
    val byName = results.map(r => r.target -> r).toMap
    byName("fast").ok shouldBe true
    byName("slow").ok shouldBe false
    byName("slow").error.get should include("timed out")
    byName("slow").durationNanos should be > 0L // deviation: ref leaves 0
  }

  test("E-R3 failures keep the real error message (deviation from ref :59)") {
    val action: String => Unit = _ => throw new IllegalStateException("boom-detail")
    val results = Refresh.refreshAll(spark, Seq(RefreshTarget("x")), 5.seconds, 0, action)
    results.head.ok shouldBe false
    results.head.error.get should include("boom-detail")
  }

  test("E-R4 refresh_report: results surface as a typed Dataset") {
    val res = Seq(
      RefreshResult("a", ok = true, None, 10L),
      RefreshResult("b", ok = false, Some("err"), 20L))
    val ds = Refresh.report(spark, res)
    ds.schema.fieldNames.toSeq shouldBe Seq("target", "ok", "error", "durationNanos")
    ds.collect().toSeq shouldBe res
  }

  test("E-R5 refresh_exitcode: AND-fold ≡ forall (ref :173-180)") {
    Refresh.exitCode(Seq(RefreshResult("a", true, None, 1))) shouldBe 0
    Refresh.exitCode(Seq(
      RefreshResult("a", true, None, 1), RefreshResult("b", false, None, 1))) shouldBe 1
    Refresh.exitCode(Nil) shouldBe 1
  }

  test("R10 target parsing rejects empty segments (deviation from ref :170-172)") {
    Refresh.parseTargets("a, b ,c").map(_.name) shouldBe Seq("a", "b", "c")
    an[IllegalArgumentException] should be thrownBy Refresh.parseTargets("a,,b")
    an[IllegalArgumentException] should be thrownBy Refresh.parseTargets("")
  }

  test("R8/R9 CLI accepts the reference-shaped -table + -nodes invocation (ref :151-160)") {
    val ok = RefresherApp.parseArgs(Array("-table", "t1", "-nodes", "n1, n2,n3"))
    ok.isRight shouldBe true
    val cfg = ok.toOption.get
    cfg.table shouldBe Some("t1")
    cfg.targets.map(_.name) shouldBe Seq("n1", "n2", "n3")
    cfg.timeout shouldBe 60.seconds // ref default, impala-refresher.go:150
    cfg.concurrency shouldBe 0 // ref default = unlimited, :153
  }

  test("R8/R9 CLI requires BOTH -table and -nodes, like ref :157-160") {
    RefresherApp.parseArgs(Array("-table", "t1")).isLeft shouldBe true
    RefresherApp.parseArgs(Array("-nodes", "n1,n2")).isLeft shouldBe true
    RefresherApp.parseArgs(Array.empty[String]).isLeft shouldBe true
  }

  test("R8/R9 CLI engine-native -targets form still parses with flag overrides") {
    val cfg = RefresherApp.parseArgs(
      Array("-targets", "a,b", "-timeout", "5", "-concurrency", "2")).toOption.get
    cfg.table shouldBe None
    cfg.targets.map(_.name) shouldBe Seq("a", "b")
    cfg.timeout shouldBe 5.seconds
    cfg.concurrency shouldBe 2
  }
}
