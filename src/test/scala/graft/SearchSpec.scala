package graft

import graft.operators.SearchQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Retrieval family (q_text_index / q_text_bm25 / q_text_phrase). The
  * DuckDB oracles own value equality; these pin the retrieval properties
  * the oracles can't see: index internal consistency, BM25
  * self-retrieval (a query built from a doc's own top tf-idf terms must
  * rank that doc near the top), and phrase-occurrence ground truth via
  * an independent substring recount.
  */
class SearchSpec extends SparkTestBase with Matchers {

  test("index: posting heads are within-df, tf-ordered, and cf >= head tf sum") {
    val rows = SearchQueries.textIndex.query(spark, sfTiny).collect()
    rows should not be empty
    val byTok = rows.groupBy(_.getString(0))
    byTok.foreach { case (tok, rs) =>
      val df = rs.head.getLong(1)
      val cf = rs.head.getLong(2)
      rs.length shouldBe math.min(5L, df).toInt
      val tfs = rs.sortBy(_.getInt(3)).map(_.getLong(5))
      tfs.sorted.reverse shouldBe tfs // head ordered by tf desc
      assert(cf >= tfs.sum, s"$tok: cf $cf < head tf sum ${tfs.sum}")
      assert(df >= 5, s"$tok leaked through the df filter")
    }
  }

  test("bm25: rank-ordered scores; most queries self-retrieve in the top-5") {
    val rows = SearchQueries.textBm25.query(spark, sfTiny).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.keySet shouldBe (0L until 8L).toSet
    byQ.foreach { case (_, rs) =>
      rs.length shouldBe 5
      // scores non-increasing in rank
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      scores.zip(scores.tail).foreach { case (a, b) => assert(a >= b) }
    }
    // Self-retrieval is probabilistic on the 31-token synthetic vocab (length
    // normalization can favor a denser doc over the source), so assert the
    // aggregate: a majority of queries rank their own source doc top-5.
    val selfHits = byQ.count { case (q, rs) => rs.exists(_.getLong(2) == q) }
    assert(selfHits >= 5, s"only $selfHits/8 queries self-retrieve in the top-5")
    info(s"$selfHits/8 queries self-retrieve in their top-5")
  }

  test("hybrid RRF: fusion arithmetic recounts from the two rank lists; vector self-hit is rank 1") {
    val rows = SearchQueries.textHybrid.query(spark, sfTiny).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.keySet shouldBe (0L until 8L).toSet
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.length shouldBe 10
      // rrf recount: 1/(60+lex) + 1/(60+vec), absent list = 0 term
      sorted.foreach { r =>
        val lex = if (r.isNullAt(3)) 0.0 else 1.0 / (60 + r.getInt(3))
        val vec = if (r.isNullAt(4)) 0.0 else 1.0 / (60 + r.getInt(4))
        r.getDouble(5) shouldBe (lex + vec)
      }
      // fused scores non-increasing in rank
      val f = sorted.map(_.getDouble(5))
      f.zip(f.tail).foreach { case (a, b) => assert(a >= b) }
      // the query doc's own embedding has cosine 1 with itself -> vector
      // rank 1, so the self doc must appear in the fused top-10
      assert(sorted.exists(_.getLong(2) == q), s"query $q lost its own doc")
    }
    // and fusion must actually MIX evidence: some fused row exists that
    // only one of the two rankers surfaced (a null rank on the other)
    rows.exists(r => r.isNullAt(3) ^ r.isNullAt(4)) shouldBe true
  }

  test("phrase: occurrence counts match an independent substring recount") {
    val out = SearchQueries.textPhrase.query(spark, sfTiny)
    val phrases = out.select("phrase").distinct().collect().map(_.getString(0))
    phrases.length shouldBe 5
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = out.collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // recount: occurrences of "t1 t2" as adjacent whitespace tokens
    for ((phrase, _) <- got.keys.groupBy(_._1)) {
      val Array(t1, t2) = phrase.split(" ")
      docs.foreach { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = toks.indices.dropRight(1).count(i => toks(i) == t1 && toks(i + 1) == t2)
        val reported = got.getOrElse((phrase, id), 0L)
        assert(reported == n, s"phrase '$phrase' doc $id: reported $reported, recount $n")
      }
    }
  }
}
