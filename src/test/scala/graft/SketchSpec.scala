package graft

import graft.operators.{JoinQueries, MoreQueries}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Sketch-family guarantees beyond the hash oracle (which already pins the
  * exact values): the count-min STRUCTURAL bounds — never undercounts,
  * overcount within the ε·N bound — and the mergeability that makes it a
  * sketch at all (partition sketches sum into the global sketch). Plus the
  * plan property the binned range join exists for.
  */
class SketchSpec extends SparkTestBase with Matchers {

  test("q_sketch_cms never undercounts and stays within the epsilon*N bound") {
    val rows = MoreQueries.sketchCms.query(spark, sfTiny).collect()
    rows.length should be > 0
    // est >= true for every key — the one-sided CMS guarantee
    rows.foreach { r =>
      r.getAs[Long]("overcount") should be >= 0L
      r.getAs[Long]("est_n") should be >= r.getAs[Long]("true_n")
    }
    // E[overcount] <= eps*N per row with eps = 2/512; the min over 4
    // independent rows is far tighter. Assert the loose per-row bound on
    // every key (deterministic on the fixture — recorded margin is ~10x).
    val n = Tables.events(spark, sfTiny).count()
    val bound = math.ceil(2.0 / 512 * n).toLong
    rows.foreach(r => r.getAs[Long]("overcount") should be <= bound)
  }

  test("count-min sketches merge by elementwise sum: sketch(A union B) == sketch(A) + sketch(B)") {
    val seeds = explode(array((0 until 4).map(lit(_)): _*)).as("d")
    def pos(key: org.apache.spark.sql.Column) =
      ((key * (lit(2654435761L) + lit(40503L) * col("d")) + col("d") * lit(97L))
        % lit(2147483647L)) % lit(512L)
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), seeds).withColumn("b", pos(col("user_id")))
        .groupBy("d", "b").agg(count(lit(1)).as("cnt"))
    val ev = Tables.events(spark, sfTiny).select("user_id")
    val a = ev.filter(col("user_id") % 2 === 0)
    val b = ev.filter(col("user_id") % 2 =!= 0)
    val merged = sketchOf(a).unionByName(sketchOf(b))
      .groupBy("d", "b").agg(sum("cnt").as("cnt"))
    val direct = sketchOf(ev)
    merged.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(merged).count() shouldBe 0L
  }

  test("q_dedup_near_cross: precision 1.0 and recall >= 0.9 vs the exact cross-corpus join") {
    import graft.operators.DedupQueries
    val exact = DedupQueries.simJaccardCross.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val near = DedupQueries.dedupNearCross.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification gate ⇒ no false positives, ever
    near.subsetOf(exact) shouldBe true
    if (exact.nonEmpty) {
      val recall = near.intersect(exact).size.toDouble / exact.size
      info(s"cross-corpus recall=$recall over ${exact.size} exact pairs")
      recall should be >= 0.9
    }
  }

  test("q_sketch_quantile: t-digest rank error <= 2% vs exact, stable across partitionings") {
    import graft.operators.MoreQueries
    // rank error: where does the estimate fall in the exact value
    // distribution vs the target quantile
    val values = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getDouble(1)).sorted }
    val est = MoreQueries.sketchQuantile.query(spark, sfTiny).collect()
    est.length should be > 0
    for (r <- est; (q, i) <- Seq(0.5 -> 1, 0.95 -> 2, 0.99 -> 3)) {
      val sorted = values(r.getString(0))
      val e = r.getDouble(i)
      val rank = sorted.count(_ <= e).toDouble / sorted.length
      math.abs(rank - q) should be <= 0.02
    }
    // merge-order sensitivity stays small: 2-partition vs 16-partition
    // digests of the same data agree within 1% rank
    def estimates(parts: Int) = {
      val tdigest = org.apache.spark.sql.functions.udaf(
        new graft.functions.TDigestSketch(100, Seq(0.5, 0.95, 0.99)))
      Tables.events(spark, sfTiny).repartition(parts)
        .groupBy("event_type").agg(tdigest(col("value")).as("qs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    }
    val (e2, e16) = (estimates(2), estimates(16))
    for ((t, qs2) <- e2; (v2, v16) <- qs2.zip(e16(t))) {
      val sorted = values(t)
      val r2 = sorted.count(_ <= v2).toDouble / sorted.length
      val r16 = sorted.count(_ <= v16).toDouble / sorted.length
      math.abs(r2 - r16) should be <= 0.01
    }
  }

  test("q_join_range_binned plans a pure equi-join on (user, bin) — no nested-loop fallback") {
    val df = JoinQueries.joinRangeBinned.query(spark, sfTiny)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // the bin column participates in the join keys, making the time
    // dimension part of the hash/shuffle key rather than a residual-only
    // predicate over per-user groups
    plan should include("jbin")
    plan should include("pbin")
  }
}
