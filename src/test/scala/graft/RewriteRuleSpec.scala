package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.scalatest.matchers.should.Matchers

/** The sorted-intersect optimizer rule: user-written built-ins
  * (size ∘ array_intersect over sort_array(array_distinct(…))) are upgraded
  * to the native merge-scan expression, with identical results.
  */
class RewriteRuleSpec extends SparkTestBase with Matchers {

  test("size(array_intersect(sorted_distinct, sorted_distinct)) rewrites to native") {
    GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfTiny).limit(50)
      .select(col("doc_id"), split(col("text"), " ").as("raw"))
    val pairs = docs.as("x").crossJoin(docs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        F.size(array_intersect(
          sort_array(array_distinct(col("x.raw"))),
          sort_array(array_distinct(col("y.raw"))))).as("n_builtin"),
        call_function(GraftFunctions.SortedIntersectName,
          sort_array(array_distinct(col("x.raw"))),
          sort_array(array_distinct(col("y.raw")))).as("n_native"))
    val plan = pairs.queryExecution.optimizedPlan.toString
    plan should include("graft_sorted_intersect_size")
    // both columns must now be the native expression AND agree
    pairs.collect().foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }

  test("rewrite skips nullable-element arrays (merge scan can't read null slots)") {
    GraftFunctions.ensureRegistered(spark)
    val df = Tables.documents(spark, sfTiny).limit(5)
      .select(expr(
        "transform(split(text, ' '), t -> CASE WHEN length(t) < 3 THEN CAST(NULL AS STRING) ELSE t END)")
        .as("raw"))
      .select(F.size(array_intersect(
        sort_array(array_distinct(col("raw"))),
        sort_array(array_distinct(col("raw"))))).as("n"))
    df.queryExecution.optimizedPlan.toString should not include "graft_sorted_intersect_size"
    df.collect() // and evaluating it must not NPE
  }

  test("rewrite does not fire on unsorted inputs") {
    GraftFunctions.ensureRegistered(spark)
    val df = Tables.documents(spark, sfTiny).limit(5)
      .select(F.size(array_intersect(split(col("text"), " "), split(col("text"), " "))).as("n"))
    df.queryExecution.optimizedPlan.toString should not include "graft_sorted_intersect_size"
    df.collect().foreach(_.getInt(0) should be > 0)
  }
}
