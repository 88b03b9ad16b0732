package graft

import graft.operators.EventQueries
import graft.sources.GraftFs
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Skew behavior of the user-bucketed event layout: one hot user carries
  * 20× every other user's event volume, so one bucket holds ~3× the mean
  * bucket's rows. The bucketed zero-exchange plans must stay CORRECT
  * (identical rows to the plain formulation on the same skewed data) and
  * keep their no-hash-exchange shape — the layout concentrates the hot
  * user in one task but cannot silently drop or duplicate it, and the
  * spec pins the straggler ceiling: the worst bucket is bounded by
  * hot-user volume + its hash peers, measured here, not hidden.
  */
class EventSkewSpec extends SparkTestBase with Matchers {

  /** 49 normal users × 200 events + user 1 × 4000 (20×) over 14 days.
    * Deterministic; schema mirrors BucketedTables.ensureEvents (ts_us
    * epoch micros).
    */
  private lazy val skewed: DataFrame = {
    val rnd = new scala.util.Random(11)
    val types = Seq("click", "view", "purchase", "scroll")
    val rows = for {
      u <- 1L to 50L
      n = if (u == 1L) 4000 else 200
      i <- 1 to n
    } yield (u * 100000L + i, u, types(rnd.nextInt(types.size)),
      (rnd.nextInt(14).toLong * 86400L + rnd.nextInt(86400)) * 1000000L,
      math.rint(rnd.nextDouble() * 10000) / 100.0)
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ts_us", "value")
  }

  /** The skewed data written through the SAME layout discipline as
    * BucketedTables.ensureEvents: 8 buckets on user_id, sorted
    * (user_id, ts_us, event_id), one file per bucket.
    */
  private lazy val bucketedSkewed: DataFrame = {
    val t = "graft_events_skew_spec"
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    if (!spark.catalog.tableExists(t)) {
      val path = GraftFs.qualify(spark, "target/graft-bucketed/skew_spec/events")
      GraftFs.deleteRecursively(spark, path)
      skewed.repartition(8, col("user_id"))
        .write.bucketBy(8, "user_id").sortBy("user_id", "ts_us", "event_id")
        .option("path", path).mode(SaveMode.Overwrite).saveAsTable(t)
    }
    spark.table(t)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  test("hot user creates real bucket skew (the shape under test)") {
    val perBucket = bucketedSkewed.groupBy(pmod(hash(col("user_id")), lit(8)).as("bucket"))
      .count().collect().map(_.getLong(1))
    val hot = perBucket.max.toDouble
    val mean = perBucket.sum.toDouble / perBucket.length
    hot / mean should be >= 2.0 // the fixture is genuinely skewed, not token
  }

  test("bucketed funnel ≡ plain funnel on skewed data, with no hash exchange") {
    val b = EventQueries.funnelOn(bucketedSkewed)
    rows(b) shouldBe rows(EventQueries.funnelOn(skewed))
    b.collect()
    b.queryExecution.executedPlan.toString should not include "Exchange hashpartitioning"
  }

  test("bucketed retention ≡ plain retention on skewed data") {
    val b = EventQueries.retentionOn(bucketedSkewed)
    rows(b) shouldBe rows(EventQueries.retentionOn(skewed))
    rows(b) should not be empty
  }

  test("bucketed sessionize and streaks ≡ plain on skewed data, exchange-free") {
    val sess = EventQueries.sessionizeOn(bucketedSkewed)
    rows(sess) shouldBe rows(EventQueries.sessionizeOn(skewed))
    sess.collect()
    sess.queryExecution.executedPlan.toString should not include "Exchange hashpartitioning"
    val streaks = EventQueries.streaksOn(bucketedSkewed)
    rows(streaks) shouldBe rows(EventQueries.streaksOn(skewed))
    // the hot user's streak is present and correct: 2000 events over 14
    // days makes every day active → one 14-day island
    val hot = streaks.filter(col("user_id") === 1L).collect()
    hot should have length 1
    hot.head.getLong(1) shouldBe 14L
  }
}
