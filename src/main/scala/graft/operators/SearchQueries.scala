package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus retrieval — the inverted-index / ranked-search surface a
  * training-data pipeline needs for retrieval-based decontamination and
  * eval-set leakage audits (the "search the corpus for this benchmark
  * question" primitive, cf. q_pipeline_decontam's n-gram form).
  *
  * Three operators: the positional/frequency inverted index itself
  * (q_text_index), BM25 ranked retrieval over it (q_text_bm25), and
  * phrase queries resolved by joining positional postings
  * (q_text_phrase). All three are explode → hash-aggregate → skinny-join
  * plans: token rows shuffle once into per-(doc,token) counts and every
  * later stage joins token- or doc-keyed aggregates, so the corpus text
  * itself is traversed exactly once per operator. The query sets are
  * corpus-derived and bounded (≤ 8 queries × 3 terms, 5 phrases), so the
  * probe side of each retrieval join broadcasts at any corpus size.
  *
  * Float parity with the DuckDB twins follows the q_text_lm_score
  * recipe: per-term BM25 contributions are 8dp-rounded to exact decimals
  * before the order-free decimal sum, every double expression is written
  * with the same association in both engines, and rankings order on the
  * rounded score (ties broken on ids) so a last-ulp libm `ln` difference
  * cannot flip ranks.
  */
object SearchQueries {

  private val K1 = 1.2
  private val B = 0.75

  private def tokRows(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).select(col("doc_id"),
      explode(Tokenize.tokens(col("text"))).as("token"))

  /** Inverted-index build: per token, document frequency, corpus
    * frequency, and the head of its posting list (top-5 docs by term
    * frequency, doc_id tiebreak) — the df-filtered (df ≥ 5) shard an
    * index server would persist. The stats (df, cf) are FULL-FRAME
    * window aggregates over the SAME token partitioning the posting-head
    * window needs, so the whole build is one corpus tokenize + one
    * (doc,token) aggregate shuffle + one token shuffle — a two-branch
    * formulation (separate stats aggregate joined back) costs a second
    * corpus scan when ReuseExchange doesn't fire, measured in the plan
    * audit and avoided here by construction.
    */
  val textIndex = QueryDef(
    "q_text_index",
    (s, dir) => {
      val tf = tokRows(s, dir).groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"))
      val wOrd = Window.partitionBy("token").orderBy(desc("tf"), asc("doc_id"))
      val wAll = Window.partitionBy("token")
      tf.withColumn("rn", row_number().over(wOrd))
        .withColumn("df", count(lit(1)).over(wAll))
        .withColumn("cf", sum("tf").over(wAll))
        .filter(col("rn") <= 5 && col("df") >= 5)
        .select("token", "df", "cf", "rn", "doc_id", "tf")
        .orderBy("token", "rn")
    },
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
      stats AS (SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY token HAVING COUNT(*) >= 5),
      p AS (
        SELECT doc_id, token, tf,
               ROW_NUMBER() OVER (PARTITION BY token ORDER BY tf DESC, doc_id ASC) AS rn
        FROM tf)
      SELECT p.token AS token, df, cf, rn, doc_id, tf
      FROM p JOIN stats ON p.token = stats.token
      WHERE rn <= 5
      ORDER BY token, rn
    """.trim),
  )

  /** q_text_index through the SKEW-SAFE two-level top-k — the zipfian
    * reality twin: a stop-word token's posting list is a constant
    * fraction of the corpus, so the single-key posting window straggles
    * on exactly the tokens every real corpus has. Here the per-token
    * head is computed in two levels (per (token, doc_id mod 16) salt
    * window → ≤ 16·5 candidates per token → final window on the
    * bounded candidates — the q_dedup_near_salted grid discipline
    * applied to top-k), and df/cf come from a plain partially-aggregated
    * groupBy (hash partials compress the hot key before it shuffles).
    * Identical output by construction — shares q_text_index's oracle;
    * IndexSkewSpec pins equality under an amplified hot token and the
    * candidate bound.
    */
  val textIndexSalted = QueryDef(
    "q_text_index_salted",
    (s, dir) => saltedIndexStage(
      tokRows(s, dir).groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))),
    textIndex.oracle,
  )

  /** The salted two-level head build over any (doc_id, token, tf)
    * relation (shared with IndexSkewSpec's synthetic corpus).
    */
  private[graft] def saltedIndexStage(tf: DataFrame, minDf: Long = 5L, k: Int = 5,
      salts: Int = 16): DataFrame = {
    val stats = tf.groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .filter(col("df") >= minDf)
    val w1 = Window.partitionBy(col("token"), pmod(col("doc_id"), lit(salts)))
      .orderBy(desc("tf"), asc("doc_id"))
    val cands = tf.withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= k)
    val w2 = Window.partitionBy("token").orderBy(desc("tf"), asc("doc_id"))
    cands.withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .join(stats, "token")
      .select("token", "df", "cf", "rn", "doc_id", "tf")
      .orderBy("token", "rn")
  }

  /** BM25 ranked retrieval (k1=1.2, b=0.75): the 8 query docs
    * (doc_id < 8) each contribute their top-3 tf-idf tokens as a query;
    * every corpus document is scored by the Robertson idf form
    * ln(1 + (N−df+0.5)/(df+0.5)) with document-length normalization, and
    * the top-5 per query are returned. The expected self-retrieval (a
    * query ranks its own source doc highly) is asserted in SearchSpec.
    *
    * Plan: the query-term derivation reuses the (doc,token) aggregate,
    * the 24-row term set broadcasts into the tf relation, and the score
    * is one (query_id, doc_id) hash aggregate over decimal per-term
    * contributions — no join ever carries more than (matching postings)
    * rows, which is the inverted-index retrieval shape.
    */
  /** The BM25 scoring stage over the 8-doc query set (everything up to
    * the final rank/limit) — shared by q_text_bm25 and the q_text_hybrid
    * RRF fusion, so the lexical ranking fused there is bit-identical to
    * the registered retrieval's.
    */
  private[graft] def bm25ScoresStage(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val toks = tokRows(s, dir)
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Tokenize.tokenCount(col("text")).cast(LongType).as("dl"))
    val glob = docs.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
    // query terms: top-3 tf-idf tokens of each doc with doc_id < 8
    val scoredQ = tf.filter(col("doc_id") < 8).join(dfRel, "token")
      .crossJoin(broadcast(glob.select("n_docs")))
      .withColumn("s", round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 6))
    val wq = Window.partitionBy("doc_id").orderBy(desc("s"), asc("token"))
    val qterms = scoredQ.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 3)
      .select(col("doc_id").as("query_id"), col("token"))
    // score all docs against the broadcast query set
    val contrib = tf.join(broadcast(qterms), "token")
      .join(dfRel, "token")
      .join(docs, "doc_id")
      .crossJoin(broadcast(glob))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast(DoubleType) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("c", round(
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl").cast(DoubleType) / col("avgdl"))),
        8).cast(DecimalType(18, 8)))
    contrib.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum("c").cast(DoubleType), 6).as("score"))
  }

  /** The BM25 oracle CTE chain up to `scores(query_id, doc_id, n_terms,
    * score)` — shared by the q_text_bm25 and q_text_hybrid oracles.
    */
  private[graft] val Bm25ScoreCtes: String = s"""
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
      dfr AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      docs AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
      gstats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM docs),
      sq AS (
        SELECT tf.doc_id, tf.token,
               ROUND(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS s
        FROM tf JOIN dfr ON tf.token = dfr.token CROSS JOIN gstats
        WHERE tf.doc_id < 8),
      qterms AS (
        SELECT doc_id AS query_id, token FROM (
          SELECT doc_id, token, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, token ASC) AS rn
          FROM sq) WHERE rn <= 3),
      contrib AS (
        SELECT q.query_id, tf.doc_id,
               CAST(ROUND(
                 ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                   * (tf.tf * ${K1 + 1.0}) /
                   (tf.tf + $K1 * (1.0 - $B + $B * CAST(dl AS DOUBLE) / avgdl)),
                 8) AS DECIMAL(18,8)) AS c
        FROM tf
        JOIN qterms q ON tf.token = q.token
        JOIN dfr ON tf.token = dfr.token
        JOIN docs ON tf.doc_id = docs.doc_id
        CROSS JOIN gstats),
      scores AS (
        SELECT query_id, doc_id, COUNT(*) AS n_terms,
               ROUND(CAST(SUM(c) AS DOUBLE), 6) AS score
        FROM contrib GROUP BY query_id, doc_id)""".stripMargin

  /** The corpus-derived query-term set alone — (query_id, token), the
    * top-3 tf-idf tokens of each doc_id < 8, exactly the `qterms` stage
    * of [[bm25ScoresStage]]/Bm25ScoreCtes. Exposed for the retrieval-
    * quality eval family: q_eval_ndcg's graded-relevance rule counts
    * matches against THESE terms, so the grades judge the same queries
    * the hybrid retrieval ran.
    */
  private[graft] def bm25QueryTerms(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val toks = tokRows(s, dir)
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n_docs"))
    val scoredQ = tf.filter(col("doc_id") < 8).join(dfRel, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("s", round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 6))
    val wq = Window.partitionBy("doc_id").orderBy(desc("s"), asc("token"))
    scoredQ.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 3)
      .select(col("doc_id").as("query_id"), col("token"))
  }

  val textBm25 = QueryDef(
    "q_text_bm25",
    (s, dir) => {
      val scores = bm25ScoresStage(s, dir)
      val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
      scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("query_id", "rn", "doc_id", "n_terms", "score")
        .orderBy("query_id", "rn")
    },
    Some(s"""
      WITH $Bm25ScoreCtes
      SELECT query_id, rn, doc_id, n_terms, score FROM (
        SELECT query_id, doc_id, n_terms, score,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
        FROM scores)
      WHERE rn <= 5
      ORDER BY query_id, rn
    """.trim),
  )

  /** Phrase search over positional postings: the 5 most frequent corpus
    * bigrams (count desc, text asc) are the phrase queries; each resolves
    * by joining the first term's positional postings with the second
    * term's on (doc_id, position+1) — the classic positional-index
    * adjacency merge — and emits per-document occurrence counts.
    *
    * The phrase-stats derivation is the linear in-row bigram transform
    * (q_text_lm_score's idiom, no self-join); only the RESOLUTION uses
    * the posting join, and by then the position relation is filtered to
    * the ≤ 10 phrase terms via the broadcast phrase set, so the join
    * carries matching postings only.
    */
  val textPhrase = QueryDef(
    "q_text_phrase",
    (s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), Tokenize.tokens(col("text")).as("toks"))
      val bg = toks.filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS t1, toks[i] AS t2))"))
          .as("b"))
        .select(col("b.t1").as("t1"), col("b.t2").as("t2"))
        .groupBy("t1", "t2").agg(count(lit(1)).as("n"))
      val wp = Window.orderBy(desc("n"), asc("t1"), asc("t2"))
      val phrases = bg.withColumn("prn", row_number().over(wp))
        .filter(col("prn") <= 5)
        .select(concat_ws(" ", col("t1"), col("t2")).as("phrase"), col("t1"), col("t2"))
      val pos = toks.select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "token")))
      val first = pos.join(broadcast(phrases), col("token") === col("t1"))
        .select(col("phrase"), col("doc_id"), col("p"), col("t2"))
      val occ = first.join(
          pos.select(col("doc_id"), (col("p") - 1).as("p"), col("token").as("tok2")),
          Seq("doc_id", "p"))
        .filter(col("tok2") === col("t2"))
      occ.groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_occ"))
        .orderBy("phrase", "doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      bg AS (
        SELECT b.t1 AS t1, b.t2 AS t2, COUNT(*) AS n FROM (
          SELECT unnest(list_transform(range(len(toks) - 1),
                   i -> struct_pack(t1 := toks[i+1], t2 := toks[i+2]))) AS b
          FROM t WHERE len(toks) >= 2)
        GROUP BY b.t1, b.t2),
      phrases AS (
        SELECT t1 || ' ' || t2 AS phrase, t1, t2 FROM (
          SELECT t1, t2, ROW_NUMBER() OVER (ORDER BY n DESC, t1 ASC, t2 ASC) AS prn FROM bg)
        WHERE prn <= 5),
      pos AS (
        SELECT doc_id, u.p AS p, u.token AS token FROM (
          SELECT doc_id, unnest(list_transform(range(len(toks)),
                   i -> struct_pack(p := i, token := toks[i+1]))) AS u
          FROM t)),
      occ AS (
        SELECT ph.phrase, p1.doc_id
        FROM pos p1
        JOIN phrases ph ON p1.token = ph.t1
        JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.p = p1.p + 1 AND p2.token = ph.t2)
      SELECT phrase, doc_id, COUNT(*) AS n_occ
      FROM occ GROUP BY phrase, doc_id
      ORDER BY phrase, doc_id
    """.trim),
  )

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack/Clarke/Büttcher
    * 2009, the RAG-stack staple): the 8 query docs are ranked BOTH
    * lexically (the exact bm25ScoresStage ranking, top-20) and by
    * embedding cosine (vec_id-aligned, top-20), then fused per (query,
    * doc) as rrf = 1/(60+lex_rank) + 1/(60+vec_rank) (absent list ⇒ 0
    * term), top-10 per query. Float parity: each term is ONE division of
    * exact integer operands and the sum has a fixed two-term order — no
    * rounding needed anywhere, the raw double is deterministic in both
    * engines.
    *
    * Scale shape: the lexical side is the inverted-index retrieval plan
    * (postings ⋈ broadcast query terms); the vector side is a
    * broadcast-query scan (the q_sim_cosine_topk shape — an ANN index
    * swaps in at corpus scale, the q_ann_* family); the fusion itself
    * joins two ≤ 20·|queries|-row rank lists — negligible at any scale.
    */
  /** The RRF fusion tail over an explicit lexical score relation
    * (query_id, doc_id, score) and an embeddings frame — factored so the
    * state-served path (IncrementalIndex.serveHybrid) runs the IDENTICAL
    * rank/fuse/top-k plan as the registered query and differs only in
    * where the lexical scores come from; bit-equality between the two is
    * then a claim about the score stage alone (IncrementalIndexSpec).
    */
  private[graft] def hybridFrom(lexScores: DataFrame, emb: DataFrame): DataFrame = {
    val wl = Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
    val lex = lexScores
      .withColumn("lex_rank", row_number().over(wl))
      .filter(col("lex_rank") <= 20)
      .select("query_id", "doc_id", "lex_rank")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("doc_id"), col("embedding").as("n_emb"))
    val wv = Window.partitionBy("query_id").orderBy(desc("cos"), asc("doc_id"))
    val vec = c.crossJoin(broadcast(q))
      .withColumn("cos", round(graft.functions.VectorOps.cosine(col("q_emb"), col("n_emb")), 6))
      .withColumn("vec_rank", row_number().over(wv))
      .filter(col("vec_rank") <= 20)
      .select("query_id", "doc_id", "vec_rank")
    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
    val wf = Window.partitionBy("query_id").orderBy(desc("rrf"), asc("doc_id"))
    fused.withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= 10)
      .select("query_id", "rank", "doc_id", "lex_rank", "vec_rank", "rrf")
      .orderBy("query_id", "rank")
  }

  val textHybrid = QueryDef(
    "q_text_hybrid",
    (s, dir) => hybridFrom(bm25ScoresStage(s, dir), Tables.embeddings(s, dir)),
    Some(s"""
      WITH $Bm25ScoreCtes,
      lex AS (SELECT query_id, doc_id, rn AS lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
        FROM scores) WHERE rn <= 20),
      e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
      qv AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 8),
      vsc AS (
        SELECT qv.query_id, c.vec_id AS doc_id,
               ROUND(list_inner_product(q_emb, c.emb)
                     / sqrt(list_inner_product(q_emb, q_emb) * list_inner_product(c.emb, c.emb)), 6) AS cos
        FROM e c CROSS JOIN qv),
      vec AS (SELECT query_id, doc_id, rn AS vec_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id ASC) AS rn
        FROM vsc) WHERE rn <= 20),
      fused AS (
        SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
               COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
               lex_rank, vec_rank,
               COALESCE(1.0 / (60 + lex_rank), 0) + COALESCE(1.0 / (60 + vec_rank), 0) AS rrf
        FROM lex FULL OUTER JOIN vec
          ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
      SELECT query_id, rank, doc_id, lex_rank, vec_rank, rrf FROM (
        SELECT query_id, doc_id, lex_rank, vec_rank, rrf,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS rank
        FROM fused)
      WHERE rank <= 10
      ORDER BY query_id, rank
    """.trim),
  )

  val defs: Seq[QueryDef] = Seq(textIndex, textIndexSalted, textBm25, textPhrase, textHybrid)
}
