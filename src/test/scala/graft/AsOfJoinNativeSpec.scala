package graft

import graft.operators.JoinQueries
import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan,
  * plans/AsOfJoin.scala): result equivalence against the tagged-union
  * window formulation AND the structural properties that justify its
  * existence — the AsOfJoinExec node actually plans, and pre-partitioned
  * inputs skip the exchange entirely (impossible for the union plan, whose
  * two sides must co-shuffle through one union exchange).
  */
class AsOfJoinNativeSpec extends SparkTestBase with Matchers {

  private def nativeAsof(dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        expr("unix_micros(cast(ts as timestamp))").as("c_us"))
    AsOfJoin.asof(purchases, clicks, Seq("user_id"), Seq("c_user_id"), "ts", "c_ts")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("c_us").as("click_ts_us"))
      .orderBy("purchase_id")
  }

  /** Runs `body` with AQE off so executedPlan is a plain traversable tree
    * (AQE wraps stages in QueryStageExec nodes that `collect` won't cross).
    */
  private def planWithoutAqe(mk: => DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = mk
      df.collect()
      df.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("native as-of join ≡ window formulation, row for row") {
    val win = JoinQueries.joinAsof.query(spark, sfTiny).collect().map(_.toString).toSeq
    val nat = nativeAsof(sfTiny).collect().map(_.toString).toSeq
    nat should not be empty
    nat shouldBe win
  }

  test("plans an AsOfJoinExec node") {
    val plan = planWithoutAqe(nativeAsof(sfTiny))
    plan.collectWithSubqueries { case e: AsOfJoinExec => e } should not be empty
  }

  test("pre-partitioned inputs elide the join exchange") {
    val e = Tables.events(spark, sfTiny)
    val p = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").repartition(4, col("user_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      .repartition(4, col("c_user_id"))
    val plan = planWithoutAqe(AsOfJoin.asof(p, c, Seq("user_id"), Seq("c_user_id"), "ts", "c_ts"))
    // only the two explicit repartitions shuffle; EnsureRequirements adds none
    val shuffles = plan.collectWithSubqueries { case s: ShuffleExchangeLike => s }
    shuffles should have size 2
  }

  test("pre-sorted inputs elide the sort too, and the merge still matches") {
    val e = Tables.events(spark, sfTiny)
    def side(tpe: String, kCol: String, tCol: String) = e
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(kCol), col("ts").as(tCol),
        col("event_id").as(s"${kCol}_id"))
      .repartition(4, col(kCol))
      .sortWithinPartitions(kCol, tCol)
    val p = side("purchase", "user_id", "ts")
    val c = side("click", "c_user_id", "c_ts")
    val df = AsOfJoin.asof(p, c, Seq("user_id"), Seq("c_user_id"), "ts", "c_ts")
    val plan = planWithoutAqe(df)
    // EnsureRequirements adds neither exchange nor sort: the only shuffles
    // are the two explicit repartitions, the only sorts the two explicit
    // sortWithinPartitions — the merge runs directly on whatever row class
    // the child emits (the non-UnsafeRow hazard the InternalRow buffering
    // in AsOfJoinExec.advanceRight exists for).
    plan.collectWithSubqueries { case s: ShuffleExchangeLike => s } should have size 2
    plan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.SortExec => s
    } should have size 2
    // Result equivalence against the un-hinted native plan on the same input.
    val expected = AsOfJoin.asof(
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("user_id_id")),
      e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
          col("event_id").as("c_user_id_id")),
      Seq("user_id"), Seq("c_user_id"), "ts", "c_ts")
      .collect().map(_.toString).sorted.toSeq
    df.collect().map(_.toString).sorted.toSeq shouldBe expected
    expected should not be empty
  }

  test("null keys and null timestamps never match; empty right side → empty result") {
    import spark.implicits._
    val l = Seq((1L, Option("a"), Option(10L)), (2L, None, Option(20L)), (3L, Option("b"), None))
      .toDF("id", "k", "t")
    val r = Seq((Option("a"), Option(5L), "x"), (None, Option(1L), "nullkey"), (Option("b"), None, "nullts"))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L) // id=1 matches "x"; null key/ts rows drop
    out.head.getString(5) shouldBe "x"
    val empty = AsOfJoin.asof(l, r.filter(lit(false)), Seq("k"), Seq("rk"), "t", "rt").collect()
    empty shouldBe empty
  }

  test("equal-ts right row is visible (<= semantics) and latest match wins") {
    import spark.implicits._
    val l = Seq((1L, "u", 100L), (2L, "u", 200L)).toDF("id", "k", "t")
    val r = Seq(("u", 100L, "at100"), ("u", 150L, "at150"), ("u", 201L, "later")).toDF("rk", "rt", "p")
    val out = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("id", "p").collect().map(x => (x.getLong(0), x.getString(1))).sortBy(_._1)
    out.toSeq shouldBe Seq((1L, "at100"), (2L, "at150"))
  }
}
