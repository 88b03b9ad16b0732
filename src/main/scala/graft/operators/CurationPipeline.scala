package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Tokenize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end corpus curation — the composed pipeline an LLM-data team runs
  * nightly: quality gate → exact dedup → near-dedup → per-doc stats. Every
  * stage is one of this engine's operators; the whole chain remains a single
  * declarative plan (Catalyst sees through all four stages — no
  * materialization barriers), and the result is oracle-checked end-to-end.
  *
  * Near-dedup rule kept non-recursive on purpose: a doc is dropped when ANY
  * lower-id quality-surviving doc is ≥ 0.8 token-Jaccard similar —
  * SQL-expressible and order-independent (greedy chain semantics would
  * depend on traversal order). Stage 3 generates pairs with the same
  * MinHash-banded LSH the engine uses for q_dedup_near (near-linear: one
  * shuffle on band signature, no all-pairs join) and Jaccard-verifies only
  * the candidates. At J ≥ 0.8 with 16×2 banding a qualifying pair collides
  * with probability 1-(1-J²)^16 ≥ 1 - 4e-8, so the result matches the
  * all-pairs DuckDB oracle on any realistic corpus.
  */
object CurationPipeline {

  val pipelineCurate = QueryDef(
    "q_pipeline_curate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("toks", Tokenize.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_distinct", size(array_distinct(col("toks"))))
        .withColumn("n_stop", size(filter(col("toks"),
          t => t.isin("the", "a", "of", "and", "in", "to"))))
        .withColumn("quality_score",
          round(lit(0.3) * (col("n_distinct").cast(DoubleType) / col("n_tokens"))
            + lit(0.5) * (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tokens"))
            + lit(0.2) * least(lit(1.0), col("n_tokens").cast(DoubleType) / lit(100.0)), 6))
      // stage 1: quality gate
      val quality = docs.filter(col("quality_score") >= 0.5)
      // stage 2: exact dedup — canonical representative per identical text
      val exact = quality
        .withColumn("keep_id", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("text")))
        .filter(col("doc_id") === col("keep_id"))
      // stage 3: near-dedup — drop docs with a more-canonical near-twin.
      // Candidate pairs come from the engine's MinHash-banded LSH (near-
      // linear), then only candidates pay the exact sorted-merge Jaccard
      // verification with size-band + early-exit pruning (both lossless at
      // the 0.8 threshold).
      val sets = exact.select(col("doc_id"), col("lang"), col("toks"),
        Tokenize.hashedSetOf(col("toks")).as("th"))
      val candidates = DedupQueries.minhashBandCandidates(
        sets.select(col("doc_id"), col("lang"), col("toks")))
      val t1 = sets.select(col("doc_id").as("doc_id1"), col("th").as("th1"), size(col("th")).as("sz1"))
      val t2 = sets.select(col("doc_id").as("doc_id2"), col("th").as("th2"), size(col("th")).as("sz2"))
      val dropIds = candidates.join(t1, "doc_id1").join(t2, "doc_id2")
        .filter(DedupQueries.sizeBand(col("sz1"), col("sz2"), 4, 5)) // J ≥ 0.8 ⟹ 4·max ≤ 5·min
        .withColumn("inter", DedupQueries.intersectAtLeast(col("th1"), col("th2"),
          expr("CAST((4 * (sz1 + sz2) + 8) div 9 AS INT)"))) // I_min for t = 0.8
        .withColumn("j", col("inter").cast(DoubleType)
          / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("j") >= 0.8)
        .select(col("doc_id2").as("drop_id")).distinct()
      exact.join(dropIds, col("doc_id") === col("drop_id"), "left_anti")
        .select("doc_id", "lang", "n_tokens", "quality_score")
        .orderBy("doc_id")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang, text,
               string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','in','to'))) AS n_stop
        FROM documents),
      quality AS (
        SELECT doc_id, lang, text, CAST(n_tokens AS INTEGER) AS n_tokens,
               ROUND(0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)
                   + 0.5 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
                   + 0.2 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0), 6) AS quality_score
        FROM scored
        WHERE ROUND(0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)
                  + 0.5 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
                  + 0.2 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0), 6) >= 0.5),
      exact AS (
        SELECT * FROM quality
        WHERE doc_id = (SELECT MIN(q2.doc_id) FROM quality q2 WHERE q2.text = quality.text)),
      sets AS (
        SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS ts FROM exact),
      drops AS (
        SELECT DISTINCT b.doc_id AS drop_id
        FROM sets a JOIN sets b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
              / (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) >= 0.8)
      SELECT doc_id, lang, n_tokens, quality_score
      FROM exact
      WHERE doc_id NOT IN (SELECT drop_id FROM drops)
      ORDER BY doc_id
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(pipelineCurate)
}
