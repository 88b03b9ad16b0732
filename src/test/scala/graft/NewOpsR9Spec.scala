package graft

import graft.operators.{AnalyticsQueries, EventQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Round-9 additions (q_vec_truncated / q_vec_mips / q_sample_reservoir /
  * q_text_drift / q_events_markov). The DuckDB oracles own value
  * equality; these pin the operator-level properties — recall of the
  * truncated shortlist, probability normalization, sample uniformity
  * mechanics, drift-score semantics.
  */
class NewOpsR9Spec extends SparkTestBase with Matchers {

  test("q_vec_truncated: 32-dim shortlist recalls most of the full-dim top-5") {
    val full = VectorQueries.cosineTopk.query(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = VectorQueries.vecTruncated.query(spark, sfTiny).collect()
    val trunc = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = trunc.intersect(full).size.toDouble / full.size
    recall should be >= 0.7 // measured 0.74: iid fixture dims = NO MRL front-loading (worst case)
    // the re-rank is by FULL cosine: within a query, cos is non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      cs.zip(cs.tail).foreach { case (a, b) => a should be >= b }
    }
    info(f"truncated recall@5 $recall%.3f")
  }

  test("q_vec_mips: dot products match a driver recount; ranking is by dot") {
    val e = Tables.embeddings(spark, sfTiny)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val rows = VectorQueries.vecMips.query(spark, sfTiny).collect()
    rows should not be empty
    rows.foreach { r =>
      val (q, n, dot) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val recount = e(q).zip(e(n)).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
      math.abs(dot - math.round(recount * 1e6) / 1e6) should be < 1e-9
    }
  }

  test("q_sample_reservoir: exact k per stratum, scrambled (not a prefix), deterministic") {
    val rows = AnalyticsQueries.sampleReservoir.query(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      g.length shouldBe 20
      g.map(_._2).sorted shouldBe (1 to 20)
    }
    // the priority scramble must not degenerate to an id prefix: per
    // lang, the sampled ids must differ from the 20 smallest ids
    val byLang = Tables.documents(spark, sfTiny).select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (l, g) => l -> g.map(_._2).sorted.take(20).toSet }
    rows.groupBy(_._1).foreach { case (lang, g) =>
      g.map(_._3).toSet should not be byLang(lang)
    }
    // deterministic across runs
    val again = AnalyticsQueries.sampleReservoir.query(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    again.toSeq shouldBe rows.toSeq
  }

  test("q_text_drift: G² is nonnegative, counts recount, one-sided tokens rank high") {
    val rows = TextQueries.textDrift.query(spark, sfTiny).collect()
    rows.length shouldBe 30
    all(rows.map(_.getDouble(4))) should be >= 0.0
    // recount the top token's two-sided counts directly
    val top = rows.head
    val tok = top.getString(1)
    val counts = Tables.documents(spark, sfTiny)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === tok)
      .groupBy(col("source") === "src0").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    counts.getOrElse(true, 0L) shouldBe top.getLong(2)
    counts.getOrElse(false, 0L) shouldBe top.getLong(3)
    // ranking is by G² desc
    val gs = rows.map(_.getDouble(4))
    gs.zip(gs.tail).foreach { case (a, b) => a should be >= b }
  }

  test("q_events_markov: per-from probabilities sum to 1, counts recount on a user slice") {
    val rows = EventQueries.eventsMarkov.query(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows should not be empty
    rows.groupBy(_._1).foreach { case (_, g) =>
      math.abs(g.map(_._4).sum - 1.0) should be < 1e-4 // 6dp rounding per cell
    }
    // driver recount of transitions for one user
    val u0 = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      .filter(col("user_id") === 1L)
      .orderBy("ts_us", "event_id").collect().map(_.getString(1))
    val wantPairs = u0.zip(u0.tail).groupBy(identity).map { case (k, v) => k -> v.length }
    // every user-1 transition pair appears in the matrix with count >= recount
    wantPairs.foreach { case ((a, b), n) =>
      val row = rows.find(r => r._1 == a && r._2 == b)
      row should not be None
      row.get._3 should be >= n.toLong
    }
  }
}
