package graft

import graft.functions.Tokenize
import graft.operators.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Skew behavior of the lang-blocked dedup family (EventSkewSpec's
  * counterpart on the similarity side): one hot language carries 20× the
  * documents of every other block, so its pair space is ~400× a normal
  * block's — the regime where a skewed straggler would hide. The banded
  * MinHash path must return exactly the same verified pairs as the
  * quadratic lang-blocked exact join on the same skewed data (murmur3
  * banding is deterministic, and the fixture separates J ≈ 0.94 implants
  * from J < 0.3 background, far from the 0.5 threshold on both sides).
  */
class DedupSkewSpec extends SparkTestBase with Matchers {

  /** 4 normal langs × 50 docs + lang "hot" × 1000 docs; 30-word texts from
    * per-lang 500-word vocabularies, plus 10 implanted near-dup partners
    * per lang (one word swapped → J = 29/31 ≈ 0.935).
    */
  private lazy val skewedDocs: DataFrame = {
    val rnd = new scala.util.Random(23)
    def text(lang: String): String =
      (1 to 30).map(_ => s"${lang}w${rnd.nextInt(500)}").distinct.mkString(" ")
    val langs = Seq("de", "fr", "es", "ja").map(_ -> 50) :+ ("hot" -> 1000)
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    for ((lang, n) <- langs) {
      val base = (1 to n).map { _ => id += 1; (id, lang, text(lang)) }
      rows ++= base
      // implant near-dups: partner of the first 10 docs with one word swapped
      for ((bid, _, t) <- base.take(10)) {
        id += 1
        val toks = t.split(" ")
        rows += ((id, lang, (toks.dropRight(1) :+ s"${lang}swap$bid").mkString(" ")))
      }
    }
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "lang", "text")
  }

  private def hashed(d: DataFrame): DataFrame =
    d.select(col("doc_id"), Tokenize.hashedTokenSet(col("text")).as("toksh"))

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("hot lang dominates the pair space (the shape under test)") {
    val n = skewedDocs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = n.map { case (l, c) => l -> c * (c - 1) / 2 }
    pairs("hot").toDouble / pairs.filterKeys(_ != "hot").values.max should be >= 200.0
  }

  test("banded LSH pairs == exact lang-blocked pairs on skewed data, all implants found") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val toks = skewedDocs.select(col("doc_id"), col("lang"),
      Tokenize.tokens(col("text")).as("toks"))
    val h = hashed(skewedDocs)
    // quadratic exact baseline: lang-blocked all-pairs through the shared
    // verification gate
    val all = skewedDocs.select(col("lang"), col("doc_id").as("doc_id1"))
      .join(skewedDocs.select(col("lang").as("l2"), col("doc_id").as("doc_id2")),
        col("lang") === col("l2") && col("doc_id1") < col("doc_id2"))
      .select("doc_id1", "doc_id2")
    val exact = pairSet(DedupQueries.verifyJaccard(all, h, 1, 2))
    // the near-linear banded path on the same skewed data
    val lsh = pairSet(DedupQueries.verifyJaccard(
      DedupQueries.minhashBandCandidates(toks), h, 1, 2))
    exact.size should be >= 50 // all 50 implants (and nothing spurious below)
    lsh shouldBe exact
    // implanted pairs exist in the hot block specifically
    val hotIds = skewedDocs.filter(col("lang") === "hot")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    exact.count(p => hotIds(p._1)) should be >= 10
  }
}
