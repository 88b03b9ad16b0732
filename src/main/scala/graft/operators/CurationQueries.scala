package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.Tokenize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group K (curation, round 4) — corpus-hygiene operators a training-data
  * pipeline runs before anything else: test-set decontamination and
  * boilerplate detection.
  *
  * Scale design: every operator is linear — one per-row shingle explode
  * (codegen'd HOFs, no shuffle), one hash aggregate on the gram key, and a
  * dictionary joined back. Only dictionaries bounded by construction
  * (eval suites) broadcast; corpus-proportional dictionaries (boilerplate
  * grams, duplicated chunks) shuffle-join. No self-joins, no pair
  * enumeration, no driver-side state.
  */
object CurationQueries {

  /** Test-set decontamination: flag corpus documents that share at least
    * one token 4-gram with the benchmark set (here: the `src0` source
    * plays the held-out benchmark; everything else is the training
    * corpus). This is the n-gram-overlap decontamination step every LLM
    * data pipeline runs against its eval suites before training.
    *
    * At 100 TB the benchmark side is tiny by definition (eval suites are
    * thousands of documents, not billions), so its distinct-gram
    * dictionary broadcasts and the corpus side pays one explode + one
    * broadcast hash join + one aggregate on doc_id — linear, shuffle only
    * on the (doc_id, gram) hit rows. Grams are compared as strings here
    * for oracle parity; the production variant would compare xxhash64
    * longs (Tokenize.hashedSetOf) at 1/10 the width.
    */
  val pipelineDecontam = QueryDef(
    "q_pipeline_decontam",
    (s, dir) => {
      // grams travel as 8-byte xxhash64 longs (r16): the flag only needs
      // gram EQUALITY, so both sides key on the native one-pass window
      // hash — no 4-gram strings built, the broadcast dictionary shrinks
      // ~4×. A cross-side collision marks a clean gram contaminated with
      // probability ~|corpus grams|·|bench grams|/2⁶⁴ (~1e-8 at sf1) —
      // the q_text_boilerplate precedent.
      val grams = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(
            Tokenize.windowHashes(Tokenize.tokens(col("text")), 4))).as("gram"))
      val bench = grams.filter(col("source") === "src0").select("gram").distinct()
      grams.filter(col("source") =!= "src0")
        .join(broadcast(bench), "gram")
        // (doc_id, gram) rows are unique by construction (array_distinct
        // before the explode), so the hit count is a plain count
        .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated_grams"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
      g AS (SELECT doc_id, source,
                   unnest(list_distinct(list_transform(range(greatest(len(toks) - 3, 0)),
                     i -> list_aggregate(toks[i+1:i+4], 'string_agg', ' ')))) AS gram
            FROM t),
      bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
      SELECT g.doc_id, COUNT(*) AS n_contaminated_grams
      FROM g JOIN bench USING (gram)
      WHERE g.source <> 'src0'
      GROUP BY g.doc_id
      ORDER BY g.doc_id
    """.trim),
  )

  /** Boilerplate detection: token trigrams appearing in ≥ 3 distinct
    * documents are "boilerplate" (headers, footers, license blurbs — the
    * spans near-dedup misses because the documents around them differ);
    * every document reports how much of its distinct-trigram mass is
    * boilerplate. Downstream curation drops or rewrites high-ratio docs.
    *
    * One explode + one gram-key aggregate (document frequency) + the
    * boilerplate dictionary joined back. The dictionary is NOT broadcast:
    * it grows with the corpus (every gram with DF >= 3), so at 100 TB it
    * is itself huge — a broadcast would collect it to the driver and copy
    * it to every executor. A plain shuffle join on gram keeps both sides
    * partitioned. A hot gram (true boilerplate appears in a large
    * fraction of documents) concentrates its pair mass in one reduce
    * task — irreducible for a key-partitioned join, and NOT splittable by
    * AQE here (the exchange is a user repartition reused by both sides,
    * not an ENSURE_REQUIREMENTS shuffle) — but it is bounded and cheap:
    * the straggler carries exactly hot-gram mass + ordinary hash peers
    * (no fan-out amplifies it), the per-row work is a hash probe, and the
    * per-doc aggregate right after re-shuffles on doc_id, which
    * rebalances. GramSkewSpec implants one gram in 50% of docs and proves
    * result equality + this straggler bound + the plan shape.
    *
    * Two shuffle-width tricks make this linear pass cheap: (1) grams
    * cross the wire as xxhash64 longs, not ~25-byte strings — only the
    * per-doc counts matter downstream, never the gram text, and a 64-bit
    * collision across even billions of distinct grams is ~n²/2⁶⁵; (2) the
    * (doc_id, gram_hash) pairs are exploded ONCE and explicitly
    * repartitioned on the hash, so the DF-aggregate branch and the join's
    * probe branch consume the SAME shuffle (ReuseExchange — one corpus
    * scan+explode instead of two), and both join sides arrive
    * co-partitioned on `g` with no further exchange.
    */
  /** q_text_boilerplate's body over an arbitrary (doc_id, text) frame —
    * the GramSkewSpec entry point for implanted hot-gram fixtures.
    */
  def boilerplateOn(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // native one-pass window hashes since r16: the old chain built every
      // trigram string in an interpreted HOF and immediately hashed it
      // away (this query already keyed on xxhash64 longs — the precedent
      // the other gram detectors now follow); distinct-on-hash ≡
      // hash-of-distinct modulo the same ~pairs/2⁶⁵ collision class
      val pairs = docs
        .select(col("doc_id"),
          explode(array_distinct(
            Tokenize.windowHashes(Tokenize.tokens(col("text")), 3))).as("g"))
        .repartition(col("g"))
      // The `_keep IS NOT NULL` conjunct is a semantic no-op (doc_id is never
      // null) the optimizer can't fold, so column pruning keeps doc_id in
      // this branch's scan — making both exchange subtrees canonically
      // identical, so ReuseExchange runs ONE scan+explode+shuffle, not two.
      val boiler = pairs.groupBy("g")
        .agg(count(lit(1)).as("df"), first("doc_id").as("_keep"))
        .filter(col("df") >= 3 && col("_keep").isNotNull)
        .select(col("g"), lit(1L).as("is_boiler"))
      // shuffle_hash, not broadcast: the dictionary is corpus-proportional,
      // and both sides are already co-partitioned on g — the hint pins a
      // deterministic zero-extra-exchange, sort-free plan that AQE's
      // size misestimate (8-byte hashed keys) can't flip to a broadcast.
      pairs.join(boiler.hint("shuffle_hash"), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
        .select(col("doc_id"), col("n_grams"), col("n_boiler"),
          round(col("n_boiler").cast(DoubleType) / col("n_grams"), 6).as("boiler_ratio"))
        .orderBy("doc_id")
  }

  val textBoilerplate = QueryDef(
    "q_text_boilerplate",
    (s, dir) => boilerplateOn(Tables.documents(s, dir)),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (SELECT doc_id,
                   unnest(list_distinct(list_transform(range(greatest(len(toks) - 2, 0)),
                     i -> list_aggregate(toks[i+1:i+3], 'string_agg', ' ')))) AS gram
            FROM t),
      b AS (SELECT gram, 1 AS is_boiler FROM g GROUP BY gram HAVING COUNT(*) >= 3)
      SELECT g.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(COALESCE(b.is_boiler, 0)) AS BIGINT) AS n_boiler,
             ROUND(CAST(SUM(COALESCE(b.is_boiler, 0)) AS DOUBLE) / COUNT(*), 6) AS boiler_ratio
      FROM g LEFT JOIN b USING (gram)
      GROUP BY g.doc_id
      ORDER BY g.doc_id
    """.trim),
  )

  /** PII detection + redaction — the scrub step every training-data
    * pipeline runs before near-dedup (redaction first, or the same
    * document with/without its email is two "different" documents). The
    * fixture text is synthetic word salad, so PII is implanted
    * deterministically (the synthesize-then-process pattern of q_fn_url /
    * q_text_normalize): every 3rd doc gains an email, every 4th a phone
    * number, then detection counts and global-replace redaction run over
    * the noisy text and the oracle recomputes both. One linear projection
    * pass — regexp_count + regexp_replace are codegen'd, no shuffle at
    * all until the output sort.
    */
  val textPii = QueryDef(
    "q_text_pii",
    (s, dir) => {
      val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phoneRe = "\\d{3}-\\d{4}"
      val noisy = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact u"), col("doc_id").cast(StringType), lit("@mail.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast(StringType), 4, "0")))
            .otherwise(lit(""))).as("t"))
      noisy.select(col("doc_id"),
          regexp_count(col("t"), lit(emailRe)).as("n_email"),
          regexp_count(col("t"), lit(phoneRe)).as("n_phone"),
          regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
            .as("redacted"))
        .withColumn("has_pii", (col("n_email") + col("n_phone") > 0).cast(BooleanType))
        .orderBy("doc_id")
    },
    Some("""
      WITH noisy AS (
        SELECT doc_id, text ||
          CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.com' ELSE '' END ||
          CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INTEGER) AS n_email,
             CAST(len(regexp_extract_all(t, '\d{3}-\d{4}')) AS INTEGER) AS n_phone,
             regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                            '\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
             len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+'))
               + len(regexp_extract_all(t, '\d{3}-\d{4}')) > 0 AS has_pii
      FROM noisy
      ORDER BY doc_id
    """.trim),
  )

  /** Training-mix construction under a token budget: per language, admit
    * documents in deterministic canonical order (doc_id — in production:
    * a quality rank) until the language's running token total exceeds the
    * budget. The per-language greedy prefix is how mixture specs
    * ("2,000 tokens of each language") become concrete document sets. One
    * window cumsum per lang partition — a single shuffle on lang at any
    * scale, no driver-side iteration, no collect.
    */
  val pipelineMix = QueryDef(
    "q_pipeline_mix",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          Tokenize.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .filter(col("cum_tokens") <= 2000)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("lang", "doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, lang,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum_tokens
            FROM t)
      SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM c WHERE cum_tokens <= 2000
      ORDER BY lang, doc_id
    """.trim),
  )

  /** Full curation audit — every document gets a DISPOSITION, not just the
    * survivors: benchmark (src0 is the held-out eval slice), low_quality
    * (the q_pipeline_curate quality gate), exact_dup (non-canonical copy
    * among eligible docs), contaminated (shares a 4-gram with the
    * benchmark), boilerplate (>50% of distinct-trigram mass is corpus
    * boilerplate), else kept. The dedup stage canonicalizes on the SORTED
    * DISTINCT TOKEN SET (content-normalized dedup — catches shuffled
    * copies exact-text dedup misses), and the quality gate sits at 0.65 —
    * stricter than q_pipeline_curate's 0.5 — so every disposition arm is
    * exercised by the fixture. Reasons apply in that priority order — the
    * per-stage drop accounting a data team needs to debug a shrinking
    * corpus ("where did my documents go?"), where q_pipeline_curate only
    * outputs the survivors. Composes the decontam and boilerplate
    * operators with the curate quality gate in ONE declarative plan:
    * still just two gram-key aggregates, two broadcastable dictionaries,
    * one per-text window — linear at any scale.
    */
  val pipelineAudit = QueryDef(
    "q_pipeline_audit",
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .withColumn("toks", Tokenize.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("n_distinct", size(array_distinct(col("toks"))))
        .withColumn("n_stop", size(filter(col("toks"),
          t => t.isin("the", "a", "of", "and", "in", "to"))))
        .withColumn("quality_score",
          round(lit(0.3) * (col("n_distinct").cast(DoubleType) / col("n_tokens"))
            + lit(0.5) * (lit(1.0) - col("n_stop").cast(DoubleType) / col("n_tokens"))
            + lit(0.2) * least(lit(1.0), col("n_tokens").cast(DoubleType) / lit(100.0)), 6))
      // gram hashes, not gram strings (r16) — the q_text_boilerplate
      // precedent; equality-only use, ~pairs/2⁶⁵ collision class
      val g4 = base.select(col("doc_id"), col("source"),
        explode(array_distinct(Tokenize.windowHashes(col("toks"), 4))).as("gram"))
      val bench = g4.filter(col("source") === "src0").select("gram").distinct()
      val contam = g4.filter(col("source") =!= "src0")
        .join(broadcast(bench), "gram").select("doc_id").distinct()
        .withColumn("is_contam", lit(1L))
      val g3 = base.select(col("doc_id"),
        explode(array_distinct(Tokenize.windowHashes(col("toks"), 3))).as("gram"))
      // boiler is corpus-proportional (same reasoning as q_text_boilerplate):
      // shuffle join, never broadcast. bench above IS broadcastable — eval
      // suites are bounded by definition.
      val boiler = g3.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3).select(col("gram"), lit(1L).as("ib"))
      val ratios = g3.join(boiler, Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(round(sum(coalesce(col("ib"), lit(0L))).cast(DoubleType) / count(lit(1)), 6)
          .as("boiler_ratio"))
      val elig = base.filter(col("source") =!= "src0" && col("quality_score") >= 0.65)
        .withColumn("fp", array_join(sort_array(array_distinct(col("toks"))), " "))
        .withColumn("keep_id", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("fp")))
        .select(col("doc_id"), col("keep_id"))
      base.join(elig, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(ratios, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("source") === "src0", "benchmark")
            .when(col("quality_score") < 0.65, "low_quality")
            .when(col("doc_id") =!= col("keep_id"), "exact_dup")
            .when(col("is_contam").isNotNull, "contaminated")
            .when(coalesce(col("boiler_ratio"), lit(0.0)) > 0.5, "boilerplate")
            .otherwise("kept").as("disposition"),
          col("quality_score"))
        .orderBy("doc_id")
    },
    Some("""
      WITH base AS (
        SELECT doc_id, source, text, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','in','to'))) AS n_stop
        FROM documents),
      q AS (
        SELECT doc_id, source, text,
               ROUND(0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens)
                   + 0.5 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
                   + 0.2 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0), 6) AS quality_score
        FROM base),
      g4 AS (SELECT doc_id, source,
                    unnest(list_distinct(list_transform(range(greatest(len(toks) - 3, 0)),
                      i -> list_aggregate(toks[i+1:i+4], 'string_agg', ' ')))) AS gram
             FROM base),
      bench AS (SELECT DISTINCT gram FROM g4 WHERE source = 'src0'),
      contam AS (SELECT DISTINCT g4.doc_id FROM g4 JOIN bench USING (gram) WHERE g4.source <> 'src0'),
      g3 AS (SELECT doc_id,
                    unnest(list_distinct(list_transform(range(greatest(len(toks) - 2, 0)),
                      i -> list_aggregate(toks[i+1:i+3], 'string_agg', ' ')))) AS gram
             FROM base),
      b AS (SELECT gram, 1 AS ib FROM g3 GROUP BY gram HAVING COUNT(*) >= 3),
      ratios AS (SELECT doc_id, ROUND(CAST(SUM(COALESCE(ib, 0)) AS DOUBLE) / COUNT(*), 6) AS br
                 FROM g3 LEFT JOIN b USING (gram) GROUP BY doc_id),
      elig AS (SELECT doc_id,
                      list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                        'string_agg', ' ') AS fp
               FROM q WHERE source <> 'src0' AND quality_score >= 0.65),
      keep AS (SELECT doc_id,
                      (SELECT MIN(e2.doc_id) FROM elig e2 WHERE e2.fp = elig.fp) AS keep_id
               FROM elig)
      SELECT q.doc_id,
             CASE WHEN q.source = 'src0' THEN 'benchmark'
                  WHEN q.quality_score < 0.65 THEN 'low_quality'
                  WHEN q.doc_id <> k.keep_id THEN 'exact_dup'
                  WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                  WHEN COALESCE(r.br, 0.0) > 0.5 THEN 'boilerplate'
                  ELSE 'kept' END AS disposition,
             q.quality_score
      FROM q
      LEFT JOIN keep k ON q.doc_id = k.doc_id
      LEFT JOIN contam c ON q.doc_id = c.doc_id
      LEFT JOIN ratios r ON q.doc_id = r.doc_id
      ORDER BY q.doc_id
    """.trim),
  )

  /** Sub-document span dedup (chunk level): split every document into
    * non-overlapping 20-token chunks (trailing partial kept) and flag
    * chunks whose exact text appears in MORE THAN ONE document — the
    * paragraph-granularity dedup step (RefinedWeb-style) that catches
    * repeated spans inside otherwise-distinct documents, which
    * document-level dedup cannot. Per document: chunk count, duplicated-
    * chunk occurrences, and the duplicated fraction downstream filters
    * gate on. One explode + one chunk-key aggregate + the dup dictionary
    * joined back — the same linear shape as the gram operators. Like the
    * boilerplate dictionary, the dup-chunk dictionary is corpus-
    * proportional (repeated spans grow with the corpus), so it shuffle-
    * joins rather than broadcasting.
    */
  val textChunkDedup = QueryDef(
    "q_text_chunk_dedup",
    (s, dir) => {
      val chunks = Tables.documents(s, dir)
        .withColumn("toks", Tokenize.tokens(col("text")))
        .select(col("doc_id"),
          explode(transform(
            // size guard: sequence(0, -1) would run DESCENDING on an
            // empty doc (same pitfall Tokenize.ngramShingles documents)
            when(size(col("toks")) > 0,
              sequence(lit(0), ceil(size(col("toks")).cast(DoubleType) / 20).cast("int") - 1))
              .otherwise(array().cast("array<int>")),
            i => concat_ws(" ", slice(col("toks"), i * 20 + 1, lit(20))))).as("chunk"))
      val dup = chunks.groupBy("chunk")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") > 1)
        .select(col("chunk"), lit(1L).as("is_dup"))
      chunks.join(dup, Seq("chunk"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          round(col("n_dup_chunks").cast(DoubleType) / col("n_chunks"), 6).as("dup_ratio"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      c AS (SELECT doc_id,
                   unnest(list_transform(range((len(toks) + 19) // 20),
                     i -> list_aggregate(toks[i*20+1:i*20+20], 'string_agg', ' '))) AS chunk
            FROM t),
      d AS (SELECT chunk, 1 AS is_dup FROM c GROUP BY chunk HAVING COUNT(DISTINCT doc_id) > 1)
      SELECT c.doc_id, COUNT(*) AS n_chunks,
             CAST(SUM(COALESCE(d.is_dup, 0)) AS BIGINT) AS n_dup_chunks,
             ROUND(CAST(SUM(COALESCE(d.is_dup, 0)) AS DOUBLE) / COUNT(*), 6) AS dup_ratio
      FROM c LEFT JOIN d USING (chunk)
      GROUP BY c.doc_id
      ORDER BY c.doc_id
    """.trim),
  )

  /** Greedy contiguous sequence packing: per language, documents in
    * canonical order are laid into fixed 2048-token training sequences —
    * a document starts in the sequence its running-total prefix lands in
    * (contiguous first-fit with overflow, the standard pretraining
    * packer). One window cumsum per lang partition, integer arithmetic
    * only; seq_id and the offset within the sequence are pure functions
    * of the cumsum, so the whole assignment is a single shuffle on lang
    * at any corpus size — no bin state, no driver loop.
    */
  val pipelinePack = QueryDef(
    "q_pipeline_pack",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          Tokenize.tokenCount(col("text")).cast(LongType).as("n_tokens"))
        .withColumn("cum", sum("n_tokens").over(w))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          floor((col("cum") - col("n_tokens")) / 2048).as("seq_id"),
          (col("cum") - col("n_tokens") - floor((col("cum") - col("n_tokens")) / 2048) * 2048)
            .as("seq_offset"))
        .orderBy("lang", "doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                 OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents)
      SELECT doc_id, lang, n_tokens,
             CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
             CAST(cum - n_tokens - CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) * 2048 AS BIGINT) AS seq_offset
      FROM t
      ORDER BY lang, doc_id
    """.trim),
  )

  /** Temperature-rebalanced source mixture — the multilingual/multi-source
    * sampling-weight computation every large LM data recipe runs: raw
    * weight w_i = source i's share of total token mass, temperature-
    * adjusted p_i = w_i^(1/2) / Σ w_j^(1/2) (α = 0.5 — upsamples the tail,
    * damps the head), and the expected document allocation under a 10,000-
    * doc budget. Two tiny aggregates over per-source token sums (one
    * shuffle on source, a one-row total broadcast back) — the entire
    * result is #sources rows at any corpus size. α^th powers are written
    * as sqrt in BOTH engines (IEEE sqrt is correctly rounded, POWER(x,0.5)
    * need not be) so the doubles match bit for bit.
    */
  val pipelineMixTemp = QueryDef(
    "q_pipeline_mix_temp",
    (s, dir) => {
      val perSource = Tables.documents(s, dir)
        .select(col("source"), Tokenize.tokenCount(col("text")).cast("long").as("n"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
      val tot = perSource.agg(
        sum("n_tokens").as("tot_tokens"),
        sum(sqrt(col("n_tokens").cast(DoubleType))).as("tot_sqrt"))
      perSource.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast(DoubleType) / col("tot_tokens"), 6).as("w_raw"),
          round(sqrt(col("n_tokens").cast(DoubleType)) / col("tot_sqrt"), 6).as("w_temp"),
          round(lit(10000.0) * sqrt(col("n_tokens").cast(DoubleType)) / col("tot_sqrt"), 2)
            .as("expected_docs"))
        .orderBy("source")
    },
    Some("""
      WITH per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS n_tokens
        FROM documents GROUP BY source),
      tot AS (
        SELECT SUM(n_tokens) AS tot_tokens, SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS tot_sqrt
        FROM per_source)
      SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
             ROUND(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS w_raw,
             ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt, 6) AS w_temp,
             ROUND(10000.0 * sqrt(CAST(n_tokens AS DOUBLE)) / tot_sqrt, 2) AS expected_docs
      FROM per_source, tot
      ORDER BY source
    """.trim),
  )

  /** Deterministic WEIGHTED sampling — q_sample_mod's idiom extended to
    * score-proportional inclusion: each doc's keep probability is its
    * (bounded) length weight, and the coin flip is the doc's own id
    * modulo 100 compared against floor(100·w) — a pure integer gate, so
    * the same weighted sample falls out on every engine, every run, and
    * every partitioning, with no RNG state. This is quality-weighted
    * subsampling ("keep good documents proportionally more often") as a
    * single zero-exchange scan pass.
    */
  val sampleWeighted = QueryDef(
    "q_sample_weighted",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          Tokenize.tokenCount(col("text")).as("n_tokens"))
        .withColumn("w", least(lit(1.0), col("n_tokens").cast(DoubleType) / 200.0))
        .filter(pmod(col("doc_id"), lit(100)) < floor(col("w") * 100).cast("int"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), round(col("w"), 6).as("w"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
               least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 200.0) AS w
        FROM documents)
      SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens, ROUND(w, 6) AS w
      FROM t WHERE doc_id % 100 < floor(w * 100)
      ORDER BY doc_id
    """.trim),
  )

  /** Per-language quality-score calibration: raw quality scores are not
    * comparable across languages (stopword lists, token lengths differ),
    * so curation thresholds are set on the WITHIN-LANGUAGE percentile.
    * percent_rank over a (lang)-partitioned window — one shuffle on lang,
    * the same single-window shape as the event analytics — emitting the
    * calibrated [0,1] rank next to the raw score; (rank−1)/(n−1) is exact
    * integer division in double on both engines.
    */
  val qualityCalib = QueryDef(
    "q_text_quality_calib",
    (s, dir) => {
      val toks = Tokenize.tokens(col("text"))
      val score = round(lit(0.3) * (size(array_distinct(toks)).cast(DoubleType) / size(toks))
        + lit(0.5) * (lit(1.0) - size(filter(toks,
            t => t.isin("the", "a", "of", "and", "in", "to"))).cast(DoubleType) / size(toks))
        + lit(0.2) * least(lit(1.0), size(toks).cast(DoubleType) / lit(100.0)), 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("quality_score", "doc_id")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), score.as("quality_score"))
        .withColumn("lang_pctile", round(percent_rank().over(w), 6))
        .orderBy("doc_id")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, lang,
               ROUND(0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')))
                   + 0.5 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the','a','of','and','in','to'))) AS DOUBLE)
                            / len(string_split(text, ' ')))
                   + 0.2 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0), 6)
                 AS quality_score
        FROM documents)
      SELECT doc_id, lang, quality_score,
             ROUND(percent_rank() OVER (PARTITION BY lang
                     ORDER BY quality_score, doc_id), 6) AS lang_pctile
      FROM scored
      ORDER BY doc_id
    """.trim),
  )

  /** Shard-manifest export — the handoff artifact a training job consumes:
    * documents are laid into byte-targeted shards (16 KiB here) by their
    * starting offset in one global cumulative-bytes window (the
    * q_pipeline_pack idiom on bytes instead of tokens), and the OUTPUT is
    * the manifest: one row per shard with doc count, byte/token mass and
    * the id range — what the loader reads to plan epochs without touching
    * the data. A single window cumsum + one aggregate; at 100 TB the
    * ordering column is the canonical sort key of the bucketed layout and
    * the window runs per storage partition with offsets composed from
    * per-partition totals (same note as pipelinePack).
    */
  val pipelineShards = QueryDef(
    "q_pipeline_shards",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          Tokenize.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("offset", sum("n_chars").over(w) - col("n_chars"))
        .withColumn("shard_id", floor(col("offset") / 16384L))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_bytes"),
          sum("n_tokens").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_chars AS off
        FROM documents)
      SELECT CAST(floor(off / 16384) AS BIGINT) AS shard_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM t GROUP BY 1
      ORDER BY shard_id
    """.trim),
  )

  /** Novelty core over an explicit incoming predicate — see
    * [[textNovelty]]; factored so NoveltySpec can drive a crafted split
    * with known shared/new window masses.
    */
  private[graft] def noveltyOn(docs: org.apache.spark.sql.DataFrame,
      isNew: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val standing = TextQueries.windowGrams(docs.filter(!isNew)).select("gh").distinct()
    val incoming = docs.filter(isNew)
    // grams feed the per-doc mass AND the anti-join — cut the lineage once
    val grams = TextQueries.windowGrams(incoming).localCheckpoint()
    val novel = grams.join(standing, Seq("gh"), "left_anti")
      .groupBy("doc_id").agg(count(lit(1)).as("novel_windows"))
    val nWin = grams.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    incoming.select("doc_id")
      .join(nWin, Seq("doc_id"), "left")
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("novel_windows"), lit(0L)).as("novel_windows"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          round(coalesce(col("novel_windows"), lit(0L)).cast(DoubleType)
            / col("n_windows"), 6)).as("novelty"))
      .orderBy("doc_id")
  }

  /** Incoming-slice NOVELTY — the admission-gate complement of the
    * provenance audit: per incoming document (doc_id % 5 == 0, the house
    * slice rule), the fraction of its stride-1 20-token windows that
    * occur NOWHERE in the standing corpus — "how much new information
    * does this slice actually carry" (a slice that is 95% known windows
    * is re-crawl/copy mass and wastes training tokens; cf. the
    * substring-dedup grain, Lee et al. 2021). Scale shape: the standing
    * side is one distinct over the window-hash shuffle (at 100 TB: the
    * PERSISTED window-hash set IncrementalSpan's stats already maintain
    * — serve it from state instead of rebuilding); the incoming side is
    * slice-linear; the anti-join keys on 8-byte hashes. Oracle on the
    * window strings (the hashed-count precedent).
    */
  val textNovelty = QueryDef(
    "q_text_novelty",
    (s, dir) => noveltyOn(Tables.documents(s, dir).select("doc_id", "text"),
      col("doc_id") % 5 === 0),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      g AS (
        SELECT doc_id,
               unnest(list_transform(range(greatest(len(toks) - 19, 0)),
                 i -> list_aggregate(toks[i+1:i+20], 'string_agg', ' '))) AS g
        FROM t),
      standing AS (SELECT DISTINCT g FROM g WHERE doc_id % 5 != 0),
      inc AS (SELECT doc_id, g FROM g WHERE doc_id % 5 = 0),
      novel AS (SELECT inc.doc_id, COUNT(*) AS novel_windows
                FROM inc LEFT JOIN standing s ON s.g = inc.g
                WHERE s.g IS NULL GROUP BY inc.doc_id),
      nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM inc GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(nw.n_windows, 0) AS n_windows,
             COALESCE(nv.novel_windows, 0) AS novel_windows,
             CASE WHEN COALESCE(nw.n_windows, 0) > 0
                  THEN ROUND(CAST(COALESCE(nv.novel_windows, 0) AS DOUBLE) / nw.n_windows, 6)
             END AS novelty
      FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
      LEFT JOIN nw USING (doc_id)
      LEFT JOIN novel nv USING (doc_id)
      ORDER BY d.doc_id
    """.trim),
  )

  def defs: Seq[QueryDef] = Seq(pipelineDecontam, textBoilerplate, pipelineMix, pipelineAudit,
    textChunkDedup, textPii, pipelinePack, pipelineMixTemp, sampleWeighted, qualityCalib,
    pipelineShards, textNovelty)
}
