package graft.sources

import graft.Tables
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Bucketed table layouts — the co-located-join physical design for 100 TB
  * fact⋈dim work (SURVEY.md §4.2): both sides pre-hashed into the same
  * number of buckets on the join key, so a sort-merge join reads bucket i
  * against bucket i with NO shuffle exchange on either side. At scale this
  * converts the dominant repeated join cost into a one-time write-side
  * cost.
  *
  * Bucket metadata lives in the session catalog (in-memory catalog here),
  * so `ensure` (re)creates the tables once per session per scale dir;
  * data files land under the session's spark-warehouse/target scratch.
  */
object BucketedTables {

  def tag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  def ordersTable(dir: String): String = s"graft_orders_bucketed_${tag(dir)}"
  def customerTable(dir: String): String = s"graft_customer_bucketed_${tag(dir)}"

  /** Create (once per session) orders + customer bucketed by the join key
    * into 8 buckets, sorted within buckets — the layout that lets the
    * planner elide both join-side exchanges (asserted in PlanShapeSpec).
    */
  def ensure(s: SparkSession, dir: String): Unit = synchronized {
    // Safe here because the writer below guarantees ONE file per bucket
    // (the reason this is off by default — multi-file buckets concatenate
    // out of order); with it, the scan reports the sortBy ordering and the
    // merge join elides the per-partition Sorts too.
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    // external tables with explicit paths: the in-memory catalog forgets
    // tables between sessions but their files survive, and a managed
    // saveAsTable refuses a pre-existing location
    def scratch(name: String) =
      new java.io.File(s"target/graft-bucketed/${tag(dir)}/$name").getAbsolutePath
    // repartition on the bucket key first → exactly one file per bucket;
    // Spark only honors within-bucket sortBy order at read time (eliding
    // the join-side Sorts) when a bucket is a single file. If the bucket
    // files survive from an earlier session (the in-memory catalog does
    // not), re-register them with bucket-spec DDL instead of rewriting.
    def ensureOne(table: String, src: org.apache.spark.sql.DataFrame,
        key: String, path: String): Unit =
      if (!s.catalog.tableExists(table)) {
        if (new java.io.File(path, "_SUCCESS").exists()) {
          s.sql(s"""CREATE TABLE $table (${src.schema.toDDL}) USING PARQUET
                   |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                   |LOCATION '$path'""".stripMargin)
        } else {
          src.repartition(8, org.apache.spark.sql.functions.col(key))
            .write
            .bucketBy(8, key).sortBy(key)
            .option("path", path)
            .mode(SaveMode.Overwrite)
            .saveAsTable(table)
        }
      }
    ensureOne(ordersTable(dir), Tables.orders(s, dir), "o_custkey", scratch("orders"))
    ensureOne(customerTable(dir), Tables.customer(s, dir), "c_custkey", scratch("customer"))
  }
}
