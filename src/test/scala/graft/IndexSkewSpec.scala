package graft

import graft.operators.SearchQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** q_text_index_salted. The shared oracle owns fixture equality; this
  * pins the skew case the salt exists for: a synthetic corpus where one
  * stop-word token appears in EVERY doc (the zipfian head), asserting
  * (a) exact equality with the single-window build and (b) the
  * candidate bound that caps the final window's per-token input.
  */
class IndexSkewSpec extends SparkTestBase with Matchers {
  import spark.implicits._

  test("salted build == plain build under a 100% hot token; candidates bounded") {
    // 2000 docs; token "the" in every doc (tf = doc_id % 7 + 1 to make the
    // head non-trivial), plus sparse tail tokens
    val tf = spark.range(2000).select(col("id").as("doc_id"))
      .select(col("doc_id"), explode(array(
        struct(lit("the").as("token"), (col("doc_id") % 7 + 1).as("tf")),
        struct(concat(lit("t"), col("doc_id") % 300).as("token"), lit(1L).as("tf"))))
        .as("e"))
      .select(col("doc_id"), col("e.token"), col("e.tf").cast("long").as("tf"))
      .localCheckpoint()

    val salted = SearchQueries.saltedIndexStage(tf).collect().map(_.toString).toSeq

    // plain single-window reference over the same relation
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy(desc("tf"), asc("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("token")
    val plain = tf.withColumn("rn", row_number().over(wOrd))
      .withColumn("df", count(lit(1)).over(wAll))
      .withColumn("cf", sum("tf").over(wAll))
      .filter(col("rn") <= 5 && col("df") >= 5)
      .select("token", "df", "cf", "rn", "doc_id", "tf")
      .orderBy("token", "rn")
      .collect().map(_.toString).toSeq

    salted shouldBe plain
    // the hot token's head survived and is the real top-5
    salted.count(_.contains("the")) shouldBe 5

    // candidate bound: the final window never sees more than salts*k rows
    // per token (vs the hot token's 2000-row posting list)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token"), pmod(col("doc_id"), lit(16)))
      .orderBy(desc("tf"), asc("doc_id"))
    val candsPerToken = tf.withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= 5)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    assert(candsPerToken <= 16L * 5, s"candidate bound violated: $candsPerToken")
    info(s"hot-token final-window input $candsPerToken rows (posting list: 2000)")
  }
}
