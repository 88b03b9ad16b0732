package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{Tokenize, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group K (dedup) — exact and near-duplicate detection
  * (SURVEY.md §2.B Group K + builder-prompt dedup ops).
  *
  * Scale design: exact dedup is one hash shuffle on the full text. The
  * similarity joins are *blocked* — by language for token-Jaccard, by LSH
  * band signature for MinHash, by 16-bit chunk for SimHash — so candidate
  * generation stays near-linear; only candidates pay the exact-verification
  * cost. The unblocked exact-Jaccard query exists as the correctness oracle
  * for the blocked variants and is the one deliberately quadratic (per-lang)
  * operator.
  */
object DedupQueries {

  /** Distinct token sets, sorted ascending — the invariant the sorted-merge
    * intersect expressions rely on.
    */
  private def docTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      Tokenize.tokenSet(col("text")).as("toks"))

  /** Same sets as 64-bit hashes (xxhash64): set-similarity counts compare
    * longs, not strings — ~10× cheaper per element in the pair loop, with
    * per-pair collision probability ~1e-15 (immaterial to counts).
    */
  private def docTokensHashed(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      Tokenize.hashedTokenSet(col("text")).as("toksh"))

  /** Early-exit intersect for threshold joins: J ≥ t ⟺ I ≥ ⌈t(s1+s2)/(1+t)⌉;
    * returns -1 (→ negative jaccard → filtered) when unreachable, so
    * dissimilar pairs abandon the merge scan early. This filters on the
    * EXACT threshold, like the DuckDB oracle's unrounded WHERE clause — a
    * pair whose true J sits within 5e-7 below t no longer sneaks in through
    * the 6dp-rounded score (impossible at fixture set sizes anyway, where J
    * granularity is ≫ 1e-6).
    */
  private[graft] def intersectAtLeast(a: Column, b: Column, minReq: Column): Column =
    call_function(graft.functions.GraftFunctions.SortedLongIntersectAtLeastName, a, b, minReq)

  /** Size-ratio prefilter for set-similarity joins: J(a,b) ≤ min/max, so
    * J ≥ t ⟹ max·num ≤ min·den where t = num/den. Lossless — every
    * surviving-threshold pair satisfies it — so oracle results are
    * unchanged; it just keeps provably-hopeless pairs out of the expensive
    * intersection (the difference between O(n²) candidate pairs and a thin
    * band at 100 TB).
    */
  private[graft] def sizeBand(s1: Column, s2: Column, num: Int, den: Int): Column =
    greatest(s1, s2) * num <= least(s1, s2) * den

  /** Banded MinHash signatures over (doc_id, lang, toks): `nHashes` seeded
    * murmur3 min-hashes per doc, grouped into `bands` bands of
    * nHashes/bands rows each → one (doc_id, lang, sz, band, sig) row per
    * band. Signatures are computed per row with array HOFs — nHashes
    * codegen'd array passes per doc and ZERO shuffle, vs the explode →
    * groupBy(doc) → min-aggs formulation that shuffled every token
    * (measured at sf0.1: q_pipeline_curate 20.5 → 8.8 s, q_dedup_near
    * ~20 → ~15 s warm). Shared by the pair-candidate generator below and
    * q_dedup_cluster's star-edge generator.
    */
  private[graft] def bandedSignatures(sets: DataFrame, bands: Int,
      nHashes: Int = 32): DataFrame = {
    val rows = nHashes / bands
    val sigs = sets.select(col("doc_id") +: col("lang") +: size(col("toks")).as("sz") +:
      (0 until nHashes).map(i =>
        array_min(transform(col("toks"), t => hash(t, lit(i)))).as(s"mh$i")): _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*).as("sig"))
    }
    sigs.select(col("doc_id"), col("lang"), col("sz"), explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("lang"), col("sz"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** MinHash + banded-LSH candidate pairs over (doc_id, lang, toks) — the
    * near-linear candidate generator shared by q_dedup_near and the curation
    * pipeline. A pair is a candidate when any band signature collides within
    * the same language. One shuffle on (lang, band, sig); the skinny
    * (lang, id1, id2) collision rows are distinct-ed BEFORE any token
    * arrays are fetched (band multiplicity is cheapest to collapse at 3
    * columns wide). With 16×2 banding, P[candidate] = 1-(1-J²)^16 — ≈ 0.99
    * at J = 0.5 and 1 - 4e-8 at J = 0.8.
    */
  private[graft] def minhashBandCandidates(sets: DataFrame, bands: Int = 16,
      nHashes: Int = 32): DataFrame = {
    val banded = bandedSignatures(sets, bands, nHashes)
    val l = banded.select(col("lang"), col("band"), col("sig"), col("doc_id").as("doc_id1"))
    val r = banded.select(col("lang").as("lang2"), col("band").as("band2"), col("sig").as("sig2"),
      col("doc_id").as("doc_id2"))
    l.join(r,
        col("lang") === col("lang2") && col("band") === col("band2")
          && col("sig") === col("sig2") && col("doc_id1") < col("doc_id2"))
      // lang is implied by the ids (every caller rejoins on doc_id), so the
      // distinct shuffles only the two-long pair rows
      .select("doc_id1", "doc_id2").distinct()
  }

  /** Exact Jaccard ≥ num/den verification of candidate id pairs against
    * hashed token sets (doc_id, toksh): size-band prefilter + early-exit
    * sorted intersect, emitting (doc_id1, doc_id2, jaccard) for passing
    * pairs. Shared by q_dedup_near / q_dedup_near_ngram / q_dedup_cluster —
    * every approximate candidate generator funnels through this one exact
    * gate, so precision is 1.0 by construction everywhere.
    */
  private[graft] def verifyJaccard(cands: DataFrame, hashed: DataFrame,
      num: Int, den: Int): DataFrame = {
    val t1 = hashed.select(col("doc_id").as("doc_id1"), col("toksh").as("toks1"))
    val t2 = hashed.select(col("doc_id").as("doc_id2"), col("toksh").as("toks2"))
    // I ≥ t(s1+s2)/(1+t) with t = num/den ⟹ I_min = ⌈num(s1+s2)/(num+den)⌉
    val iMin = s"CAST(($num * (size(toks1) + size(toks2)) + ${num + den - 1}) div ${num + den} AS INT)"
    cands.join(t1, "doc_id1").join(t2, "doc_id2")
      .filter(sizeBand(size(col("toks1")), size(col("toks2")), num, den))
      .withColumn("inter", intersectAtLeast(col("toks1"), col("toks2"), expr(iMin)))
      .withColumn("uni", size(col("toks1")) + size(col("toks2")) - col("inter"))
      .withColumn("jaccard", round(col("inter").cast(DoubleType) / col("uni"), 6))
      .filter(col("jaccard") >= num.toDouble / den)
      .select("doc_id1", "doc_id2", "jaccard")
  }

  /** Exact dedup: canonical representative = min(doc_id) per identical text. */
  val dedupExact = QueryDef(
    "q_dedup_exact",
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"), length(col("text")).as("text_len"))
        .orderBy("keep_id"),
    Some("""
      SELECT keep_id, n_copies, CAST(length(text) AS INTEGER) AS text_len
      FROM (SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text)
      ORDER BY keep_id
    """.trim),
  )

  /** Unordered exact-Jaccard pair core (J ≥ 0.5, lang-blocked, size-band +
    * early-exit pruned) — shared by q_sim_jaccard (which adds the output
    * sort) and q_dedup_cluster (which feeds the pairs into components and
    * must NOT pay a 2M-row range exchange for an ordering it ignores).
    */
  private[operators] def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val t = docTokensHashed(s, dir).withColumn("sz", size(col("toksh")))
    // The build side broadcasts (small per-lang dictionaries); the probe
    // side is repartitioned so pair enumeration parallelism follows
    // shuffle.partitions instead of the input split count — the knob that
    // keeps every executor busy without replicating data.
    val a = t.select(col("lang"), col("doc_id").as("doc_id1"), col("toksh").as("toks1"), col("sz").as("sz1"))
      .repartition(col("doc_id1"))
    val b = t.select(col("lang").as("lang2"), col("doc_id").as("doc_id2"), col("toksh").as("toks2"), col("sz").as("sz2"))
    a.join(b, col("lang") === col("lang2") && col("doc_id1") < col("doc_id2")
        && sizeBand(col("sz1"), col("sz2"), 1, 2)) // J ≥ 0.5 ⟹ max ≤ 2·min
      .withColumn("inter", intersectAtLeast(col("toks1"), col("toks2"),
        expr("CAST((sz1 + sz2 + 2) div 3 AS INT)"))) // I_min for t=0.5
      .withColumn("uni", col("sz1") + col("sz2") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast(DoubleType) / col("uni"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id1", "doc_id2", "jaccard")
  }

  /** Exact token-set Jaccard similarity join, blocked by language.
    * Intersection/union sizes are ints so the score double is exact.
    */
  val simJaccard = QueryDef(
    "q_sim_jaccard",
    (s, dir) => jaccardPairs(s, dir).orderBy("doc_id1", "doc_id2"),
    Some("""
      WITH d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents)
      SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
             ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      ORDER BY doc_id1, doc_id2
    """.trim),
  )

  /** q_sim_jaccard over the lang-bucketed documents layout: both sides of
    * the per-lang pair self-join scan the SAME 8-bucket lang-hashed table,
    * so the merge join is co-located — no exchange and no sort on either
    * side (DedupBucketingSpec plan-asserts both). Same results as
    * q_sim_jaccard, which is what the shared oracle checks. This is the
    * 100 TB shape when per-lang dictionaries outgrow the broadcast
    * threshold q_sim_jaccard's plan relies on: the storage layout replaces
    * the broadcast. (The merge hint forces the layout under test — at
    * fixture scale the planner would rather broadcast the small side.)
    */
  val simJaccardBucketed = QueryDef(
    "q_sim_jaccard_bucketed",
    (s, dir) => bucketedSimJoinStage(s, dir).orderBy("doc_id1", "doc_id2"),
    simJaccard.oracle,
  )

  /** Join-only stage of the bucketed similarity join (no output sort) —
    * exposed so the plan assertion isn't polluted by the ordering's range
    * exchange, mirroring JoinQueries.bucketedJoin.
    */
  private[graft] def bucketedSimJoinStage(s: SparkSession, dir: String): DataFrame = {
    graft.sources.BucketedTables.ensureDocuments(s, dir)
    val d = s.table(graft.sources.BucketedTables.documentsTable(dir))
    val t = d.select(col("doc_id"), col("lang"),
      Tokenize.hashedTokenSet(col("text")).as("toksh"))
      .withColumn("sz", size(col("toksh")))
    val a = t.select(col("lang"), col("doc_id").as("doc_id1"), col("toksh").as("toks1"), col("sz").as("sz1"))
    val b = t.select(col("lang").as("lang2"), col("doc_id").as("doc_id2"), col("toksh").as("toks2"), col("sz").as("sz2"))
    a.hint("merge").join(b, col("lang") === col("lang2") && col("doc_id1") < col("doc_id2")
        && sizeBand(col("sz1"), col("sz2"), 1, 2))
      .withColumn("inter", intersectAtLeast(col("toks1"), col("toks2"),
        expr("CAST((sz1 + sz2 + 2) div 3 AS INT)")))
      .withColumn("uni", col("sz1") + col("sz2") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast(DoubleType) / col("uni"), 6))
      .filter(col("jaccard") >= 0.5)
      .select("doc_id1", "doc_id2", "jaccard")
  }

  /** MinHash + banded LSH near-dedup. 32 seeded murmur3 min-hashes per doc,
    * 16 bands × 2 rows (P[candidate] ≈ 0.99 at J = 0.5 — the verification
    * threshold; wider bands miss borderline pairs); candidate pairs share
    * (lang, band, signature) and are then verified with exact Jaccard ≥ 0.5.
    * Candidate generation is near-linear (shuffle on band signature) — this
    * is the 100 TB path the quadratic q_sim_jaccard validates. Non-oracle
    * (candidate sets are hash-family-specific); ApproxOpsSpec asserts
    * precision 1.0 and recall ≥ 0.95 against the exact join.
    */
  val dedupNear = QueryDef(
    "q_dedup_near",
    (s, dir) => {
      val candidates = minhashBandCandidates(docTokens(s, dir))
      verifyJaccard(candidates, docTokensHashed(s, dir), 1, 2)
        .orderBy("doc_id1", "doc_id2")
    },
    None,
  )

  /** Candidate join over the PERSISTED bucketed signature layout (§7.6 #2)
    * — join stage only (no distinct, no verify) so the plan assertion sees
    * the co-location: both sides scan the same (lang, band, sig)-bucketed
    * table, so the self-join is a per-bucket merge with zero exchange and
    * zero sort. The merge hint forces the layout under test (at fixture
    * scale the planner would rather broadcast).
    */
  private[graft] def bucketedBandCandidatesStage(s: SparkSession, dir: String): DataFrame = {
    graft.sources.BucketedTables.ensureSignatures(s, dir,
      bandedSignatures(docTokens(s, dir), bands = 16))
    val t = s.table(graft.sources.BucketedTables.signaturesTable(dir))
    val l = t.select(col("lang"), col("band"), col("sig"), col("doc_id").as("doc_id1"))
    val r = t.select(col("lang").as("lang2"), col("band").as("band2"), col("sig").as("sig2"),
      col("doc_id").as("doc_id2"))
    l.hint("merge").join(r,
        col("lang") === col("lang2") && col("band") === col("band2")
          && col("sig") === col("sig2") && col("doc_id1") < col("doc_id2"))
      .select("doc_id1", "doc_id2")
  }

  /** q_dedup_near over the persisted bucketed signature table: identical
    * semantics and (hash-family-given) identical output to q_dedup_near —
    * DedupBucketedSpec asserts row equality — but the candidate self-join
    * reads co-located buckets: signatures are computed once at ingest
    * (append-only, pure per-row), and the recurring near-dedup run pays no
    * exchange for candidate generation. Non-oracle like q_dedup_near
    * (candidates are hash-family-specific).
    */
  val dedupNearBucketed = QueryDef(
    "q_dedup_near_bucketed",
    (s, dir) =>
      verifyJaccard(bucketedBandCandidatesStage(s, dir).distinct(),
        docTokensHashed(s, dir), 1, 2)
        .orderBy("doc_id1", "doc_id2"),
    None,
  )

  /** SimHash near-dedup: 64-bit fingerprint from token hashes; candidates
    * share one of four 16-bit chunks (pigeonhole covers hamming ≤ 3);
    * verified by bit_count(xor) ≤ 3. Non-oracle; ApproxOpsSpec covers it.
    */
  val dedupSimhash = QueryDef(
    "q_dedup_simhash",
    (s, dir) => {
      val toks = docTokens(s, dir)
      val exploded = toks.select(col("doc_id"), col("lang"), explode(col("toks")).as("token"))
        .withColumn("h", xxhash64(col("token")))
      val bitSums = (0 until 64).map { i =>
        sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")
      }
      val summed = exploded.groupBy("doc_id", "lang").agg(bitSums.head, bitSums.tail: _*)
      val fp = (0 until 64).map { i =>
        when(col(s"b$i") > 0, expr(s"CAST(1 AS BIGINT) << $i")).otherwise(lit(0L))
      }.reduce(_ + _)
      val fps = summed.select(col("doc_id"), col("lang"), fp.as("fp"))
      val chunked = fps.select(col("doc_id"), col("lang"), col("fp"),
          explode(array((0 until 4).map(c =>
            struct(lit(c).as("chunk"), expr(s"(fp >> ${c * 16}) & 65535").as("ck"))): _*)).as("cc"))
        .select(col("doc_id"), col("lang"), col("fp"), col("cc.chunk").as("chunk"), col("cc.ck").as("ck"))
      val l = chunked.select(col("lang"), col("chunk"), col("ck"),
        col("doc_id").as("doc_id1"), col("fp").as("fp1"))
      val r = chunked.select(col("lang").as("lang2"), col("chunk").as("chunk2"), col("ck").as("ck2"),
        col("doc_id").as("doc_id2"), col("fp").as("fp2"))
      l.join(r, col("lang") === col("lang2") && col("chunk") === col("chunk2")
          && col("ck") === col("ck2") && col("doc_id1") < col("doc_id2"))
        .select(col("doc_id1"), col("doc_id2"),
          expr("CAST(bit_count(fp1 ^ fp2) AS BIGINT)").as("hamming")).distinct()
        .filter(col("hamming") <= 3)
        .orderBy("doc_id1", "doc_id2")
    },
    None,
  )

  /** Token-bigram (n-gram) Jaccard similarity join, blocked by language —
    * order-sensitive shingles catch near-dups that bag-of-words misses.
    */
  val dedupNgram = QueryDef(
    "q_dedup_ngram",
    (s, dir) => {
      val grams = docGrams(s, dir).withColumn("sz", size(col("grams")))
      val a = grams.select(col("lang"), col("doc_id").as("doc_id1"), col("grams").as("g1"), col("sz").as("sz1"))
        .repartition(col("doc_id1")) // spread pair enumeration (see q_sim_jaccard)
      val b = grams.select(col("lang").as("lang2"), col("doc_id").as("doc_id2"), col("grams").as("g2"), col("sz").as("sz2"))
      a.join(b, col("lang") === col("lang2") && col("doc_id1") < col("doc_id2")
          && sizeBand(col("sz1"), col("sz2"), 3, 10)) // J ≥ 0.3 ⟹ 3·max ≤ 10·min
        .withColumn("inter", intersectAtLeast(col("g1"), col("g2"),
          expr("CAST((3 * (sz1 + sz2) + 12) div 13 AS INT)"))) // I_min for t=0.3
        .withColumn("uni", col("sz1") + col("sz2") - col("inter"))
        .withColumn("jaccard", round(col("inter").cast(DoubleType) / col("uni"), 6))
        .filter(col("jaccard") >= 0.3)
        .select("doc_id1", "doc_id2", "jaccard")
        .orderBy("doc_id1", "doc_id2")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(len(string_split(text, ' ')) - 1),
                 i -> string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS grams
        FROM documents)
      SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
             ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.3
      ORDER BY doc_id1, doc_id2
    """.trim),
  )

  /** Hashed sorted bigram-shingle sets (shared by the exact n-gram join
    * and its LSH-accelerated variant). Tokenized once into a column, then
    * shingled — inlining split() inside the shingle lambda would
    * re-tokenize per element (O(len²) per doc).
    */
  private def docGrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), Tokenize.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"),
        Tokenize.hashedShingleSet(col("toks")).as("grams"))

  /** The full shingle → minhash → band → bucket-join pipeline: LSH
    * candidates over BIGRAM-shingle sets (order-sensitive, unlike
    * q_dedup_near's bag-of-tokens), verified with exact shingle Jaccard
    * ≥ 0.3 — the quadratic q_dedup_ngram is its correctness baseline.
    * Banding is 32×2 (64 min-hashes): the round-3 sweep (PERF.md) measured
    * recall 1.0 at every scale for 16×2 / 24×2 / 32×1 / 32×2 alike, so the
    * config was chosen on the THEORETICAL floor at the J = 0.3 threshold —
    * 1-(1-J²)^32 = 0.951 (vs 0.78 for 16×2) — at ~2× candidates and equal
    * runtime (sf0.1: 102k vs 54k candidates of 3.2M same-lang pairs).
    * Non-oracle (hash-family-specific candidates); ApproxOpsSpec asserts
    * precision 1.0 and recall ≥ 0.9 against the exact join.
    */
  val dedupNearNgram = QueryDef(
    "q_dedup_near_ngram",
    (s, dir) => {
      val grams = docGrams(s, dir)
      val candidates = minhashBandCandidates(
        grams.select(col("doc_id"), col("lang"), col("grams").as("toks")),
        bands = 32, nHashes = 64)
      verifyJaccard(candidates, grams.select(col("doc_id"), col("grams").as("toksh")), 3, 10)
        .orderBy("doc_id1", "doc_id2")
    },
    None,
  )

  /** Embedding-cosine near-duplicate pairs (≥ 0.95 on the 6dp-rounded
    * score). Deliberately brute-force as the oracle-checked baseline; the
    * LSH-bucketed q_ann_lsh is the 100 TB candidate-generation path.
    */
  val dedupEmbed = QueryDef(
    "q_dedup_embed",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = e.select(col("vec_id").as("vec_id1"), col("embedding").as("e1"))
      val b = e.select(col("vec_id").as("vec_id2"), col("embedding").as("e2"))
      a.join(b, col("vec_id1") < col("vec_id2"))
        .withColumn("cos", round(VectorOps.cosine(col("e1"), col("e2")), 6))
        .filter(col("cos") >= 0.95)
        .select("vec_id1", "vec_id2", "cos")
        .orderBy("vec_id1", "vec_id2")
    },
    Some("""
      WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)
      SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
             ROUND(list_inner_product(a.emb, b.emb)
                   / sqrt(list_inner_product(a.emb, a.emb) * list_inner_product(b.emb, b.emb)), 6) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE ROUND(list_inner_product(a.emb, b.emb)
                  / sqrt(list_inner_product(a.emb, a.emb) * list_inner_product(b.emb, b.emb)), 6) >= 0.95
      ORDER BY vec_id1, vec_id2
    """.trim),
  )

  /** Distributed connected components over an undirected pair list:
    * iterative min-label propagation — the same loop GraphX/GraphFrames
    * connected components runs: each round every node takes the min of its
    * own label and its neighbors' labels, then follows its label's label
    * (pointer jumping), so rounds scale as log2(diameter), not diameter.
    * The driver loop only evaluates a one-scan label-sum convergence check
    * per round; all data movement stays distributed. Returns
    * (doc_id, cluster_id = component-min doc_id).
    */
  private[graft] def connectedComponents(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // Every round's plan embeds the previous round's plan FOUR times (the
    // neighbor join + the pointer-jump self-join each reference it twice),
    // so carrying lineage across rounds blows the logical plan up 4^rounds
    // and the driver dies in the analyzer, not in execution. localCheckpoint
    // (eager) truncates lineage each round — data stays distributed in
    // executor storage; on a real cluster an HDFS checkpoint dir is the
    // fault-tolerant equivalent. Same idiom GraphFrames uses for its CC.
    val edges = pairs
      .select(explode(array(
        struct(col("doc_id1").as("src"), col("doc_id2").as("dst")),
        struct(col("doc_id2").as("src"), col("doc_id1").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint()
    var labels = docs.select(col("doc_id"), col("doc_id").as("cluster_id")).localCheckpoint()
    // labels only ever decrease, so the label sum strictly decreases
    // until the fixpoint — a one-scan convergence check, no join
    var prevSum = labels.agg(sum("cluster_id")).collect().head.getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      val neighborMin = edges.join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst")).agg(min(col("cluster_id")).as("nbr_min"))
      val stepped = labels.join(neighborMin, labels("doc_id") === neighborMin("dst"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
      // path compression (pointer jumping): follow my label's label —
      // halves chain lengths every round, so rounds ≈ log2(diameter)
      // instead of diameter; the self-join is on the skinny label table
      val lol = stepped.select(col("doc_id").as("l_doc"), col("cluster_id").as("l_cluster"))
      val next = stepped.join(lol, stepped("cluster_id") === lol("l_doc"), "left")
        .select(stepped("doc_id"),
          least(stepped("cluster_id"), coalesce(col("l_cluster"), stepped("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val sumNow = next.agg(sum("cluster_id")).collect().head.getLong(0)
      labels = next
      converged = sumNow == prevSum
      prevSum = sumNow
      rounds += 1
    }
    labels
  }

  /** Reference variant of q_dedup_cluster fed by the exhaustive exact-
    * Jaccard pair join — the correctness baseline DedupClusterSpec compares
    * the LSH-accelerated default against (they must produce identical
    * labels).
    */
  private[graft] def dedupClusterExhaustive(s: SparkSession, dir: String): DataFrame =
    connectedComponents(Tables.documents(s, dir).select(col("doc_id")),
      jaccardPairs(s, dir).select("doc_id1", "doc_id2"))
      .orderBy("doc_id")

  /** Connected components over the exact-Jaccard near-dup graph: every doc
    * gets cluster_id = the smallest doc_id transitively reachable through
    * ≥0.5-similarity edges (singletons cluster as themselves). This is the
    * step that turns a pair list into dedup GROUPS — pick min(doc_id) per
    * cluster as the canonical survivor.
    *
    * The output is LINEAR (one label per doc) even when the true edge set
    * is quadratic (on the driver fixture 72% of same-lang pairs are true
    * J ≥ 0.5 edges — the dense-near-dup worst case), so unlike
    * q_sim_jaccard (whose OUTPUT is the full pair list) this operator must
    * not materialize or verify the full pair set. The edge source is LSH,
    * in two phases, both funneled through the exact `verifyJaccard` gate:
    *
    *  1. STAR edges: within every (lang, band, sig) LSH bucket (32 bands ×
    *     1 row — P[two docs with J ≥ 0.5 share no bucket] ≤ 2⁻³²), connect
    *     each doc to the bucket's min doc_id and verify those pairs
    *     exactly. Linear in Σ bucket size — never enumerates in-bucket
    *     pairs — and in a dense cluster almost every star edge verifies,
    *     so components form immediately.
    *  2. SWEEP (exactly one): enumerate bucket-coincident pairs whose
    *     endpoints sit in DIFFERENT phase-1 components — restricted to
    *     MIXED buckets (≥2 distinct labels), since a single-component
    *     bucket cannot produce a cross pair, and the inequality is pushed
    *     into the join condition so same-component pairs die inside the
    *     join — verify every one exactly, merge the passes (components
    *     contracted to one node per label, so this CC runs on the tiny
    *     component graph, not the corpus).
    *
    * ONE sweep reaches the fixpoint, provably: verification is label-
    * independent and merging only coarsens, so a pair still cross-component
    * after the merge was cross-component before it, was therefore verified
    * in the sweep, and must have FAILED (a pass would have merged it).
    * Hence no true edge crosses the final components (given the 2⁻³² LSH
    * candidate guarantee) — the labels are exactly the transitive closure
    * the DuckDB recursive-CTE oracle computes, which is what CORRECTNESS
    * checks at sf0.01 and ApproxOpsSpec re-checks against the
    * exhaustive-join variant. Verified work across both phases is
    * O(star pairs + cross-component candidates) — on the fixture ~6% of
    * the pair set even though 72% of pairs are true edges; on a
    * realistically sparse corpus near-linear in the corpus.
    */
  val dedupCluster = QueryDef(
    "q_dedup_cluster",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val hashed = docTokensHashed(s, dir).cache()
      val banded = bandedSignatures(docTokens(s, dir), bands = 32).cache()
      // Phase 1: verified star edges (bucket-min → member), linear in corpus
      val roots = banded.groupBy("lang", "band", "sig")
        .agg(min("doc_id").as("doc_id1"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .select("lang", "band", "sig", "doc_id1")
      val star = roots.join(banded, Seq("lang", "band", "sig"))
        .filter(col("doc_id1") < col("doc_id"))
        .select(col("doc_id1"), col("doc_id").as("doc_id2")).distinct()
      // localCheckpoint (not cache) at the phase boundaries: the sweep
      // plans embed the phase-1 labels/edges plans, so lineage must be cut
      // or the analyzer cost compounds (see connectedComponents).
      val starEdges = verifyJaccard(star, hashed, 1, 2).select("doc_id1", "doc_id2").localCheckpoint()
      val labels = connectedComponents(docs, starEdges)
      // Phase 2: the one sweep. Pair enumeration costs Σ bucket-size² — but
      // a bucket whose members all share one component can't produce a
      // cross pair, and after phase 1 the big dense buckets are exactly the
      // single-component ones, so the MIXED-bucket prefilter removes the
      // dominant Σ size² terms losslessly.
      val withLbl = banded.join(labels, "doc_id")
      val mixed = withLbl.groupBy("lang", "band", "sig")
        .agg(countDistinct("cluster_id").as("nc")).filter(col("nc") > 1)
        .select("lang", "band", "sig")
      val inMixed = withLbl.join(mixed, Seq("lang", "band", "sig"))
      val a = inMixed.select(col("lang"), col("band"), col("sig"), col("sz").as("sz1"),
        col("doc_id").as("doc_id1"), col("cluster_id").as("c1"))
      val b = inMixed.select(col("lang").as("lang2"), col("band").as("band2"),
        col("sig").as("sig2"), col("sz").as("sz2"),
        col("doc_id").as("doc_id2"), col("cluster_id").as("c2"))
      val cross = a.join(b,
          col("lang") === col("lang2") && col("band") === col("band2")
            && col("sig") === col("sig2") && col("doc_id1") < col("doc_id2")
            && col("c1") =!= col("c2") && sizeBand(col("sz1"), col("sz2"), 1, 2))
        .select("doc_id1", "doc_id2").distinct()
      val mergeEdges = verifyJaccard(cross, hashed, 1, 2).select("doc_id1", "doc_id2").localCheckpoint()
      // Contract: merge components through the verified cross edges on the
      // component GRAPH (one node per phase-1 label, edges = label pairs),
      // then relabel docs through their phase-1 component — the corpus is
      // never re-clustered.
      val l1 = labels.select(col("doc_id").as("d1"), col("cluster_id").as("c1"))
      val l2 = labels.select(col("doc_id").as("d2"), col("cluster_id").as("c2"))
      val compPairs = mergeEdges
        .join(l1, col("doc_id1") === col("d1")).join(l2, col("doc_id2") === col("d2"))
        .filter(col("c1") =!= col("c2"))
        .select(least(col("c1"), col("c2")).as("doc_id1"), greatest(col("c1"), col("c2")).as("doc_id2"))
        .distinct()
      val compNodes = labels.select(col("cluster_id").as("doc_id")).distinct()
      val compLabels = connectedComponents(compNodes, compPairs)
        .select(col("doc_id").as("comp"), col("cluster_id").as("final_cluster"))
      val out = labels.join(compLabels, labels("cluster_id") === compLabels("comp"))
        .select(col("doc_id"), col("final_cluster").as("cluster_id"))
      hashed.unpersist(); banded.unpersist()
      out.orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE d AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents),
      pairs AS (
        SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2
        FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5),
      e AS (SELECT doc_id1 AS a, doc_id2 AS b FROM pairs
            UNION ALL SELECT doc_id2, doc_id1 FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
      SELECT doc_id, LEAST(doc_id, COALESCE(MIN(r.b), doc_id)) AS cluster_id
      FROM documents LEFT JOIN reach r ON doc_id = r.a
      GROUP BY doc_id
      ORDER BY doc_id
    """.trim),
  )

  /** Exact cross-corpus similarity join (A = the src0 "incoming" slice,
    * B = the rest): every (incoming, corpus) pair with token-set Jaccard
    * ≥ 0.5, lang-blocked, size-band + early-exit pruned like the
    * self-join variants. This is near-dup DECONTAMINATION/admission — "is
    * this new document a near-copy of anything we already hold" — where
    * the pair universe is |A|·|B|, not |corpus|²; the quadratic form here
    * is the oracle-checked baseline for the LSH-accelerated variant
    * below.
    */
  val simJaccardCross = QueryDef(
    "q_sim_jaccard_cross",
    (s, dir) => {
      val t = docTokensHashed(s, dir)
        .join(Tables.documents(s, dir).select("doc_id", "source"), "doc_id")
        .withColumn("sz", size(col("toksh")))
      val a = t.filter(col("source") === "src0")
        .select(col("lang"), col("doc_id").as("doc_id1"), col("toksh").as("toks1"), col("sz").as("sz1"))
      val b = t.filter(col("source") =!= "src0")
        .select(col("lang").as("lang2"), col("doc_id").as("doc_id2"), col("toksh").as("toks2"), col("sz").as("sz2"))
      a.join(b, col("lang") === col("lang2") && sizeBand(col("sz1"), col("sz2"), 1, 2))
        .withColumn("inter", intersectAtLeast(col("toks1"), col("toks2"),
          expr("CAST((sz1 + sz2 + 2) div 3 AS INT)")))
        .withColumn("uni", col("sz1") + col("sz2") - col("inter"))
        .withColumn("jaccard", round(col("inter").cast(DoubleType) / col("uni"), 6))
        .filter(col("jaccard") >= 0.5)
        .select("doc_id1", "doc_id2", "jaccard")
        .orderBy("doc_id1", "doc_id2")
    },
    Some("""
      WITH d AS (SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS toks FROM documents)
      SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
             ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                   / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
      FROM d a JOIN d b ON a.lang = b.lang AND a.source = 'src0' AND b.source <> 'src0'
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      ORDER BY doc_id1, doc_id2
    """.trim),
  )

  /** LSH-accelerated cross-corpus near-dedup — the scale path for
    * q_sim_jaccard_cross: both sides compute banded signatures (per-row,
    * shuffle-free), candidates are (incoming, corpus) signature collisions
    * only — pairs inside either corpus never enumerate, so the candidate
    * join costs |A|-side bucket mass, not |B|² — then the shared exact
    * gate verifies. At 100 TB the incoming slice is a day's ingest against
    * years of corpus: the signature table for B is the persisted bucketed
    * layout (BucketedTables.ensureSignatures) and only A's signatures are
    * computed fresh. Non-oracle (hash-family candidates);
    * ApproxOpsSpec-style recall/precision pinned in SketchSpec against
    * the exact cross join.
    */
  val dedupNearCross = QueryDef(
    "q_dedup_near_cross",
    (s, dir) => {
      // corpus side: the PERSISTED bucketed signature table (written once
      // at ingest) — only src membership is joined on; nothing re-hashes
      graft.sources.BucketedTables.ensureSignatures(s, dir,
        bandedSignatures(docTokens(s, dir), bands = 16))
      val srcOf = Tables.documents(s, dir).select("doc_id", "source")
      val corpusSigs = s.table(graft.sources.BucketedTables.signaturesTable(dir))
        .join(srcOf, "doc_id").filter(col("source") =!= "src0")
        .select(col("lang").as("lang2"), col("band").as("band2"), col("sig").as("sig2"),
          col("doc_id").as("doc_id2"))
      // incoming side: only the src0 slice computes signatures fresh —
      // at 100 TB this is the day's ingest, broadcast into the corpus scan
      val incomingDocs = Tables.documents(s, dir).filter(col("source") === "src0")
        .select(col("doc_id"), col("lang"), Tokenize.tokenSet(col("text")).as("toks"))
      val l = bandedSignatures(incomingDocs, bands = 16)
        .select(col("lang"), col("band"), col("sig"), col("doc_id").as("doc_id1"))
      val cands = broadcast(l).join(corpusSigs,
          col("lang") === col("lang2") && col("band") === col("band2")
            && col("sig") === col("sig2"))
        .select("doc_id1", "doc_id2").distinct()
      verifyJaccard(cands, docTokensHashed(s, dir).select(col("doc_id"), col("toksh")), 1, 2)
        .orderBy("doc_id1", "doc_id2")
    },
    None,
  )

  /** Incremental exact dedup — the nightly-pipeline shape: an existing
    * canonical state (here: the even-doc_id half) absorbs a new batch (the
    * odd half) WITHOUT re-deduplicating the old corpus. Each side reduces
    * to per-text (min_id, count) partials; a full-outer merge on text
    * combines them. Because min/count are associative, the merged state is
    * exactly the full-corpus dedup — which is what the oracle checks. At
    * 100 TB the state side is a bucketed table on text-hash and only the
    * (small) daily batch shuffles.
    */
  val dedupIncremental = QueryDef(
    "q_dedup_incremental",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      def partials(half: DataFrame) = half.groupBy("text")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      val state = partials(docs.filter(col("doc_id") % 2 === 0))
        .select(col("text"), col("keep_id").as("keep1"), col("n_copies").as("n1"))
      val incoming = partials(docs.filter(col("doc_id") % 2 === 1))
        .select(col("text").as("text2"), col("keep_id").as("keep2"), col("n_copies").as("n2"))
      state.join(incoming, col("text") === col("text2"), "full_outer")
        .select(
          least(coalesce(col("keep1"), col("keep2")), coalesce(col("keep2"), col("keep1"))).as("keep_id"),
          (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n_copies"),
          length(coalesce(col("text"), col("text2"))).as("text_len"))
        .orderBy("keep_id")
    },
    Some("""
      SELECT keep_id, n_copies, CAST(length(text) AS INTEGER) AS text_len
      FROM (SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text)
      ORDER BY keep_id
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    dedupExact, simJaccard, simJaccardBucketed, dedupNear, dedupSimhash, dedupNgram,
    dedupNearNgram, dedupEmbed, dedupCluster, dedupIncremental, dedupNearBucketed,
    simJaccardCross, dedupNearCross)
}
