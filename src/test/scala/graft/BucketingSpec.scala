package graft

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Bucketed co-located join: both sides pre-bucketed on the join key join
  * with NO shuffle exchange — the storage-layout lever that turns the
  * biggest recurring join at 100 TB into a local merge per bucket.
  */
class BucketingSpec extends SparkTestBase with Matchers {

  test("join of two tables bucketed on the key runs without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but their warehouse
    // dirs persist — clear them or CREATE TABLE fails on the stale location
    for (t <- Seq("graft_li_bucketed", "graft_ord_bucketed")) {
      val dir = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_bucketed")
    Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_ord_bucketed")

    // force the merge strategy — at fixture scale the planner would rather
    // broadcast the small side, which ignores the bucket layout under test
    val joined = spark.table("graft_li_bucketed").hint("merge")
      .join(spark.table("graft_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
    joined.count() shouldBe Tables.lineitem(spark, sfTiny).count()

    val plan = joined.queryExecution.executedPlan.toString
    // co-located: neither side re-shuffles for the join
    plan should not include "Exchange hashpartitioning"
    plan should include("SortMergeJoin")

    spark.sql("DROP TABLE graft_li_bucketed")
    spark.sql("DROP TABLE graft_ord_bucketed")
  }
}
