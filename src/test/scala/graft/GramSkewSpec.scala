package graft

import graft.functions.Tokenize
import graft.operators.CurationQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Adversarial gram-skew proof for the boilerplate shuffle join
  * (CurationQueries.boilerplateOn): one trigram implanted in 50% of all
  * documents — true boilerplate (a license header) at its worst. The
  * gram-keyed shuffle concentrates that gram's whole (doc_id, g) mass in
  * ONE reduce partition, so the spec pins three things:
  *
  *   1. the fixture is genuinely skewed (hot gram carries ~100× the mean
  *      gram's pair mass), not token;
  *   2. the answer stays exactly right under that skew — row-for-row equal
  *      to an independent string-keyed broadcast formulation, and to the
  *      hand-derived per-doc ratios;
  *   3. the straggler is bounded and measured: the hot partition's excess
  *      over its hash peers is exactly the hot gram's own irreducible
  *      mass (nothing amplifies it — no join fan-out, no re-explode), and
  *      every OTHER partition stays within 2× of the mean. Downstream the
  *      per-doc aggregate re-shuffles on doc_id, which rebalances.
  *
  * The plan must also keep its shape under skew: the dictionary stays a
  * shuffle join (never a broadcast flipped by a size misestimate) and the
  * DF-aggregate and probe branches still reuse ONE exchange.
  */
class GramSkewSpec extends SparkTestBase with Matchers {

  /** 400 docs; every even doc opens with the SAME trigram ("hotA hotB
    * hotC" → one gram in 200 docs), every doc carries 4 unique filler
    * tokens so all other grams have document frequency 1.
    */
  private lazy val skewedDocs: DataFrame = {
    import spark.implicits._
    (1L to 400L).map { id =>
      val unique = s"u${id}a u${id}b u${id}c u${id}d"
      val text = if (id % 2 == 0) s"hotA hotB hotC $unique" else unique
      (id, text)
    }.toDF("doc_id", "text")
  }

  /** The same semantics through a deliberately DIFFERENT plan: gram
    * strings (no xxhash64), plain aggregate (no repartition/reuse trick),
    * broadcast dictionary join. Disagreement means the production plan's
    * tricks changed the answer.
    */
  private def referenceBoilerplate(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(Tokenize.ngramShingles(Tokenize.tokens(col("text")), 3))).as("gram"))
    val dict = grams.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 3).select(col("gram"), lit(1L).as("is_boiler"))
    grams.join(broadcast(dict), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
      .select(col("doc_id"), col("n_grams"), col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams"), 6).as("boiler_ratio"))
  }

  /** (doc_id, g) pair frame exactly as the production query builds it. */
  private lazy val pairs: DataFrame = skewedDocs.select(col("doc_id"),
      explode(array_distinct(Tokenize.ngramShingles(Tokenize.tokens(col("text")), 3))).as("gram"))
    .select(col("doc_id"), xxhash64(col("gram")).as("g"))

  private lazy val hotG: Long = pairs
    .groupBy("g").count().orderBy(desc("count")).first().getLong(0)

  test("fixture is genuinely skewed: hot gram carries >=100x the mean gram's pair mass") {
    val perGram = pairs.groupBy("g").count().agg(
      max("count").as("hot"), avg("count").as("mean")).first()
    perGram.getLong(0) shouldBe 200L // the implanted trigram, all even docs
    perGram.getLong(0).toDouble / perGram.getDouble(1) should be >= 100.0
  }

  test("boilerplate under hot-gram skew equals the independent formulation and hand math") {
    val got = CurationQueries.boilerplateOn(skewedDocs).collect()
    val want = referenceBoilerplate(skewedDocs).collect()
    got.map(_.toSeq).toSet shouldBe want.map(_.toSeq).toSet
    // hand-derived: even docs have 7 tokens -> 5 grams, exactly 1 shared
    // (the other 4 touch unique fillers) -> ratio 0.2; odd docs 0.0
    got should have length 400
    got.foreach { r =>
      val (id, ratio) = (r.getLong(0), r.getDouble(3))
      ratio shouldBe (if (id % 2 == 0) 0.2 else 0.0)
      r.getLong(1) shouldBe (if (id % 2 == 0) 5L else 2L)
    }
  }

  test("straggler bound: hot partition's excess is exactly the hot gram's own mass") {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // partition assignment of repartition(col("g")): Murmur3 of the xxhash64 key
    val byPart = pairs.groupBy(pmod(hash(col("g")), lit(n)).as("p"))
      .agg(count(lit(1)).as("mass"),
        sum(when(col("g") === hotG, 1L).otherwise(0L)).as("hot_mass"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val hotPartPeers = byPart.collectFirst { case (m, h) if h > 0 => m - h }.get
    val others = byPart.collect { case (m, h) if h == 0 => m }
    val meanNonHot = (hotPartPeers + others.sum).toDouble / byPart.length
    // the hot gram's 200 rows land in ONE partition (irreducible for a
    // key-partitioned join) but its hash PEERS stay ordinary mass: the
    // straggler is hot + peers, never an amplified blob
    hotPartPeers.toDouble should be <= 2.0 * meanNonHot
    others.foreach(_.toDouble should be <= 2.0 * meanNonHot)
  }

  test("plan keeps its shape under skew: shuffle join (no broadcast flip) off one reused exchange") {
    val df = CurationQueries.boilerplateOn(skewedDocs)
    df.collect() // finalize AQE
    val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    finalPlan should include("ShuffledHashJoin")
    finalPlan should not include "BroadcastHashJoin"
    finalPlan should include("ReusedExchange")
  }
}
