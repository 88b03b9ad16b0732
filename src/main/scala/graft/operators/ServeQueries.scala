package graft.operators

import graft.{QueryDef, Tables}
import graft.streaming.{IncrementalIndex, IncrementalSpan}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The incremental maintainers' SERVE paths as registered, oracle-checked
  * rows (r12) — until now the build→serve loop (IncrementalIndex /
  * IncrementalSpan: micro-batch ingest into a CAS-logged segment state,
  * then answering from state alone) was proven only by specs. These rows
  * put the maintained-state surfaces through the driver's DuckDB hash
  * gate every round: each serves from a state built ONCE per scale dir
  * by a deterministic two-batch ingest (doc_id parity split — the
  * IncrementalIndexSpec/IncrementalSpanSpec replay shape), and each
  * must be BIT-EQUAL to its one-shot registered twin, so the oracle is
  * the twin's oracle verbatim. A hash mismatch here means the ingest
  * merge, the state protocol, or the serve derivation drifted from the
  * one-shot semantics — exactly the regression a streaming deployment
  * fears and cannot see in one-shot tests.
  *
  * The state build is the same persisted-artifact contract as the index
  * builds (cluster labels, prefix relation, run files): first call per
  * dir pays the ingest, later calls serve from the committed log. The
  * build is crash-safe to re-run — processBatch skips batch ids at or
  * below the committed tag, so a partially-built state (batch 0
  * committed, crash before batch 1) is completed, never double-landed.
  */
object ServeQueries {

  private def stateBase(s: SparkSession, dir: String, family: String): String = {
    val tag = graft.sources.GraftFs.scaleTag(s, dir)
    graft.sources.GraftFs.qualify(s, s"target/graft-state/$tag/$family")
  }

  private[graft] def indexStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "index")
      if (!IncrementalIndex.currentState(s, base).batch.contains(1L)) {
        val docs = Tables.documents(s, dir)
        for (i <- 0 until 2)
          IncrementalIndex.processBatch(s,
            docs.filter(pmod(col("doc_id"), lit(2)) === i), base, Some(i.toLong))
      }
      base
    }

  private[graft] def spanStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "span")
      if (!IncrementalSpan.currentState(s, base).batch.contains(1L)) {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        for (i <- 0 until 2)
          IncrementalSpan.processBatch(s,
            docs.filter(pmod(col("doc_id"), lit(2)) === i), base, Some(i.toLong))
      }
      base
    }

  /** RRF hybrid retrieval served ENTIRELY from the maintained inverted-
    * index state (tf from posting segments, df from the stats table,
    * n_docs from the persisted ingest census, fused by the registered
    * query's own hybridFrom tail) — must hash-match q_text_hybrid's
    * oracle because serveHybrid is bit-equal to the one-shot by
    * construction (IncrementalIndexSpec pins it across a 3-batch split,
    * crash replay, and compaction).
    */
  val serveHybridState = QueryDef(
    "q_serve_hybrid_state",
    (s, dir) =>
      IncrementalIndex.serveHybrid(s, indexStateBuilt(s, dir), Tables.embeddings(s, dir)),
    SearchQueries.textHybrid.oracle,
  )

  /** The who-copied-whom provenance audit served from the maintained span
    * state (append-only window-occurrence segments + the associative
    * (cnt, min-holder) stats merge, attributed by the registered query's
    * own spanSourceFromTables tail) — must hash-match q_text_span_source's
    * oracle because state-served ≡ one-shot by construction
    * (IncrementalSpanSpec pins it across batch splits, the concurrent-
    * ingest CAS race, compaction, and replay).
    */
  val serveSpanSourceState = QueryDef(
    "q_serve_spansource_state",
    (s, dir) => IncrementalSpan.serveSpanSource(s, spanStateBuilt(s, dir)),
    TextQueries.textSpanSource.oracle,
  )

  /** Span state holding ONLY the standing slice (doc_id % 5 ≠ 0 — the
    * registered q_text_novelty split), for the admission-question serve.
    */
  private[graft] def noveltyStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "novelty")
      if (!IncrementalSpan.currentState(s, base).batch.contains(1L)) {
        val standing = Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") % 5 =!= 0)
        for (i <- 0 until 2)
          IncrementalSpan.processBatch(s,
            standing.filter(pmod(col("doc_id"), lit(2)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The admission question served from state — q_text_novelty's "how
    * much new information would this incoming slice add" answered from
    * the maintained standing-window stats WITHOUT re-tokenizing the
    * standing corpus and WITHOUT ingesting the candidate slice (the
    * operator's documented 100 TB path, now driver-gated): must
    * hash-match q_text_novelty's oracle because serveNovelty ≡ the
    * registered split by construction (IncrementalSpanSpec pins it).
    */
  val serveNoveltyState = QueryDef(
    "q_serve_novelty_state",
    (s, dir) =>
      IncrementalSpan.serveNovelty(s, noveltyStateBuilt(s, dir),
        Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") % 5 === 0)),
    CurationQueries.textNovelty.oracle,
  )

  private[graft] def aggStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "agg")
      if (!graft.streaming.IncrementalAgg.committedBatch(s, base).contains(1L)) {
        val events = Tables.events(s, dir)
        for (i <- 0 until 2)
          graft.streaming.IncrementalAgg.processBatch(s,
            events.filter(pmod(col("event_id"), lit(2)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The matview maintainer's SERVE path as a registered row: the
    * per-event-type count/decimal-sum aggregate read from IncrementalAgg's
    * versioned state (built once per dir by a two-batch ingest) — must
    * hash-match the one-shot aggregate over the whole events table because
    * count and decimal-sum partials are associative+commutative
    * (IncrementalAggSpec pins the identity through the foreachBatch
    * wiring). A mismatch means the full-outer merge or the
    * write-new-then-swap pointer discipline double-counted or lost a
    * batch — THE failure mode of materialized-view upkeep.
    */
  val serveAggState = QueryDef(
    "q_serve_agg_state",
    (s, dir) =>
      graft.streaming.IncrementalAgg.readState(s, aggStateBuilt(s, dir))
        .select(col("event_type"), col("n"),
          col("sum_value").cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY event_type ORDER BY event_type
    """.trim),
  )

  private[graft] def statsStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "stats")
      if (!graft.streaming.IncrementalStats.committedBatch(s, base).contains(1L)) {
        val frame = Tables.orders(s, dir)
          .filter(col("o_orderstatus").isin("O", "F"))
          .select(col("o_orderkey"), col("o_orderstatus").as("grp"),
            (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
              .cast(org.apache.spark.sql.types.LongType).as("v"))
        for (i <- 0 until 2)
          graft.streaming.IncrementalStats.processBatch(s,
            frame.filter(pmod(col("o_orderkey"), lit(2)) === i).select("grp", "v"),
            base, Some(i.toLong))
      }
      base
    }

  /** The stats-histogram maintainer's SERVE path as a registered row:
    * Mann-Whitney U answered from the maintained value-distinct histogram
    * (q_stat_mannwhitney's exact fixture frame ingested in two batches) —
    * must hash-match the one-shot test's oracle because everything
    * downstream of the histogram is exact integer/decimal arithmetic, so
    * serve-from-state ≡ one-shot is an identity, not a tolerance
    * (IncrementalStatsSpec pins all six served statistics).
    */
  val serveMwState = QueryDef(
    "q_serve_mw_state",
    (s, dir) =>
      graft.streaming.IncrementalStats.serveMannWhitney(s, statsStateBuilt(s, dir), "O"),
    StatQueries.statMannWhitney.oracle,
  )

  private[graft] def neardupStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "neardup")
      if (!graft.streaming.IncrementalDedup.committedBatch(s, base).contains(1L)) {
        val docs = Tables.documents(s, dir)
        for (i <- 0 until 2)
          graft.streaming.IncrementalDedup.processBatch(s,
            docs.filter(pmod(col("doc_id"), lit(2)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The near-dedup maintainer's SERVE path as a registered row: the
    * accumulated verified pair set read from IncrementalDedup's
    * CAS-logged segments (two-batch build once per dir) — must
    * hash-match q_dedup_near's oracle because signatures depend only on
    * document content, so the union of per-batch emissions over any
    * split equals the one-shot pair set exactly (IncrementalDedupSpec
    * pins it across splits, crash replays, and a concurrent CAS race).
    * A mismatch means a batch was double-landed, lost, or the candidate
    * rebase diverged — the nightly-ingest failure modes.
    */
  val serveNeardupState = QueryDef(
    "q_serve_neardup_state",
    (s, dir) =>
      graft.streaming.IncrementalDedup.readPairs(s, neardupStateBuilt(s, dir))
        .orderBy("doc_id1", "doc_id2"),
    DedupQueries.dedupNear.oracle,
  )

  private[graft] def cdcStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "cdc")
      if (!graft.streaming.IncrementalCdc.committedBatch(s, base).contains(1L)) {
        val orders = Tables.orders(s, dir)
        // batch 0 seeds the snapshot (every snapshot key as an upsert of
        // its own row); batch 1 is q_cdc_upsert's exact derived change
        // set — keys divisible by 5 delete, even keys upsert at +10.00
        val seed = orders.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), lit("U").as("op"),
            col("o_custkey").as("c_custkey"), col("o_totalprice").as("new_price"))
        val changes = orders
          .filter(col("o_orderkey") % 2 === 0 || col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 5 === 0, lit("D")).otherwise(lit("U")).as("op"),
            col("o_custkey").as("c_custkey"),
            (col("o_totalprice") + 10.0).as("new_price"))
        graft.streaming.IncrementalCdc.processBatch(s, seed, base, Some(0L))
        graft.streaming.IncrementalCdc.processBatch(s, changes, base, Some(1L))
      }
      base
    }

  /** The CDC maintainer's SERVE path as a registered row: the maintained
    * snapshot after seeding + one change batch must hash-match
    * q_cdc_upsert's merge result (minus its audit disposition column —
    * state keeps rows, not change provenance): sequential full-outer
    * merges compose to the one-shot MERGE when each key's changes ride
    * one batch (the documented key-partitioned contract;
    * IncrementalCdcSpec pins the equivalence and the replay no-op).
    */
  val serveCdcState = QueryDef(
    "q_serve_cdc_state",
    (s, dir) =>
      graft.streaming.IncrementalCdc.readState(s, cdcStateBuilt(s, dir))
        .orderBy("o_orderkey"),
    Some("""
      WITH snap AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0),
      changes AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN 'D' ELSE 'U' END AS op,
               o_custkey AS c_custkey,
               o_totalprice + 10.0 AS new_price
        FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 5 = 0)
      SELECT COALESCE(s.o_orderkey, c.o_orderkey) AS o_orderkey,
             COALESCE(c.c_custkey, s.o_custkey) AS o_custkey,
             COALESCE(c.new_price, s.o_totalprice) AS o_totalprice
      FROM snap s FULL OUTER JOIN changes c ON s.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op = 'U'
      ORDER BY o_orderkey
    """.trim),
  )

  private[graft] def shardsStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "shards")
      if (!graft.streaming.IncrementalShards.committedBatch(s, base).contains(1L)) {
        val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "text")
        // the manifest's feed contract: doc_id-ordered batches (offsets
        // accumulate) — split at the id midpoint, lower half first
        val mid = docs.agg(max("doc_id")).head().getLong(0) / 2
        graft.streaming.IncrementalShards.processBatch(s,
          docs.filter(col("doc_id") <= mid), base, Some(0L))
        graft.streaming.IncrementalShards.processBatch(s,
          docs.filter(col("doc_id") > mid), base, Some(1L))
      }
      base
    }

  /** The shard-manifest maintainer's SERVE path as a registered row: the
    * maintained manifest after a two-batch doc_id-ordered ingest must
    * hash-match q_pipeline_shards' one-shot manifest (same 16 KiB shard
    * constant, same token counter) — byte offsets accumulate across
    * batches, so a lost or double-counted batch shifts every later
    * shard boundary and cannot hide (IncrementalShardsSpec pins the
    * equivalence, the replay no-op, and the suffix-repair path).
    */
  val serveShardsState = QueryDef(
    "q_serve_shards_state",
    (s, dir) =>
      graft.streaming.IncrementalShards.readState(s, shardsStateBuilt(s, dir))
        .orderBy("shard_id"),
    CurationQueries.pipelineShards.oracle,
  )

  private[graft] def scd2StateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "scd2")
      if (!graft.streaming.IncrementalScd2.committedBatch(s, base).contains(2L)) {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
              .as("us"))
        // time-ordered terciles (per-user order preserved) — the
        // IncrementalScd2Spec feed shape; percentile_approx with fixed
        // accuracy is deterministic on fixed data
        val b = ev.selectExpr(
          "percentile_approx(us, 0.3333, 10000)",
          "percentile_approx(us, 0.6667, 10000)").head
        val (t1, t2) = (b.getLong(0), b.getLong(1))
        graft.streaming.IncrementalScd2.processBatch(s,
          ev.filter(col("us") <= t1), base, Some(0L))
        graft.streaming.IncrementalScd2.processBatch(s,
          ev.filter(col("us") > t1 && col("us") <= t2), base, Some(1L))
        graft.streaming.IncrementalScd2.processBatch(s,
          ev.filter(col("us") > t2), base, Some(2L))
      }
      base
    }

  /** The SCD2 maintainer's SERVE path as a registered row: the full
    * dimension (closed segments + current table) after a three-batch
    * time-tercile ingest must hash-match q_cdc_scd2's one-shot derivation
    * — including SEAM SUPPRESSION (a batch opening with a user's current
    * value must not cut a new version; IncrementalScd2Spec pins it plus
    * the replay no-op). The dimension build→serve loop is the classic
    * warehouse upkeep a transactional MERGE performs; a mismatch means
    * a version double-landed, a seam leaked, or close/current tore.
    */
  val serveScd2State = QueryDef(
    "q_serve_scd2_state",
    (s, dir) =>
      graft.streaming.IncrementalScd2.readDimension(s, scd2StateBuilt(s, dir)),
    CdcQueries.cdcScd2.oracle,
  )

  private[graft] def componentsStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "components")
      if (!graft.streaming.IncrementalComponents.committedBatch(s, base).contains(2L)) {
        val edges = GraphQueries.lshUndirectedEdges(s, dir).localCheckpoint()
        val maxId = Tables.embeddings(s, dir).agg(max("vec_id")).head().getLong(0)
        val (cut1, cut2) = (maxId / 3, 2 * maxId / 3)
        def batchOf(c: org.apache.spark.sql.Column) =
          when(c <= cut1, 0L).when(c <= cut2, 1L).otherwise(2L)
        val nodes = Tables.embeddings(s, dir)
          .select(col("vec_id").as("node_id"), batchOf(col("vec_id")).as("bid"))
        // an edge lands with its LATER endpoint (the maintainer's
        // deliver-with-endpoints contract)
        val edgesB = edges.withColumn("bid", batchOf(greatest(col("a"), col("b"))))
        for (bid <- 0L to 2L)
          graft.streaming.IncrementalComponents.processBatch(s,
            nodes.filter(col("bid") === bid).select("node_id"),
            edgesB.filter(col("bid") === bid).select("a", "b"),
            base, Some(bid))
      }
      base
    }

  /** The connected-components maintainer's SERVE path as a registered
    * row: the maintained label table after batched edge arrival, joined
    * to component sizes in q_graph_components_lsh's exact output shape —
    * must hash-match its recursive-CTE oracle because label contraction
    * over any edge-arrival order converges to the same min-label fixpoint
    * (IncrementalComponentsSpec pins monotone coarsening + the one-shot
    * identity + replay no-op).
    */
  val serveComponentsState = QueryDef(
    "q_serve_components_state",
    (s, dir) => {
      val labels = graft.streaming.IncrementalComponents
        .readState(s, componentsStateBuilt(s, dir))
      val sizes = labels.groupBy("component").agg(count(lit(1)).as("component_size"))
      labels.join(broadcast(sizes), "component")
        .select(col("node_id").as("vec_id"), col("component"), col("component_size"))
        .orderBy("vec_id")
    },
    GraphQueries.graphComponentsLsh.oracle,
  )

  private[graft] def mineStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "mine")
      if (!graft.streaming.IncrementalMine.committedBatch(s, base).contains(2L)) {
        val bi = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        for (i <- 0 until 3)
          graft.streaming.IncrementalMine.processBatch(s,
            bi.filter(pmod(hash(col("ok")), lit(3)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The mining maintainer's SERVE path as a registered row: association
    * rules answered from the maintained (item supports, pair supports,
    * basket census) state after a three-batch basket-hash split — must
    * hash-match q_mine_rules' oracle because support counts are
    * associative partials and the rule arithmetic is exact integer
    * ratios (IncrementalMineSpec pins rules + recs including the
    * below-threshold-in-every-batch accumulation case and replay).
    */
  val serveRulesState = QueryDef(
    "q_serve_rules_state",
    (s, dir) =>
      graft.streaming.IncrementalMine.serveRules(s, mineStateBuilt(s, dir)),
    MiningQueries.mineRules.oracle,
  )

  private[graft] def trendStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      // trend_v2: the r13 slope-histogram protocol added a `slopes` state
      // table; trend_v3/v4: the r14 moments protocol added
      // `vals`/`moments`/`slopes_cum` — a state built by an older writer
      // lacks the new tables, so the family name is bumped rather than
      // served mixed
      val base = stateBase(s, dir, "trend_v4")
      if (!graft.streaming.IncrementalTrend.committedBatch(s, base).contains(2L)) {
        val raw = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            col("event_type").as("g"),
            expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"),
            (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
              .cast(org.apache.spark.sql.types.LongType).as("x"),
            expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
            (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
              .cast(org.apache.spark.sql.types.LongType).as("m"))
        for (i <- 0 until 3)
          graft.streaming.IncrementalTrend.processBatch(s,
            raw.filter(pmod(hash(col("event_id")), lit(3)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The trend maintainer's SERVE path as a registered row: Mann-Kendall/
    * Sen trend answered from the maintained hourly moments after a
    * three-batch event-hash split — must hash-match q_ts_trend's oracle
    * because the hourly aggregation is associative and everything
    * downstream is the one-shot's exact arithmetic (IncrementalTrendSpec
    * pins trend + rfm + replay).
    */
  val serveTrendState = QueryDef(
    "q_serve_trend_state",
    (s, dir) =>
      graft.streaming.IncrementalTrend.serveTrend(s, trendStateBuilt(s, dir)),
    TimeSeriesQueries.tsTrend.oracle,
  )

  private[graft] def winnowStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "winnow")
      if (!graft.streaming.IncrementalWinnow.committedBatch(s, base).contains(1L)) {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        for (i <- 0 until 2)
          graft.streaming.IncrementalWinnow.processBatch(s,
            docs.filter(pmod(col("doc_id"), lit(2)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The winnow maintainer's SERVE path as a registered row: the MOSS
    * match step answered from the maintained fingerprint segments after
    * a two-batch parity split — must hash-match q_text_winnow_pairs'
    * oracle because fingerprints are content-only (extraction runs once
    * per doc ever) and the df-cap/match tail is the registered query's
    * verbatim over the same distinct fp relation
    * (IncrementalWinnowSpec pins split-equality, replay no-ops, and the
    * two-writer CAS race).
    */
  val serveWinnowState = QueryDef(
    "q_serve_winnow_state",
    (s, dir) =>
      graft.streaming.IncrementalWinnow
        .serveWinnowPairs(s, winnowStateBuilt(s, dir))
        .orderBy("doc_id1", "doc_id2"),
    TextQueries.textWinnowPairs.oracle,
  )

  private[graft] def driftStateBuilt(s: SparkSession, dir: String): String =
    synchronized {
      val base = stateBase(s, dir, "drift")
      if (!graft.streaming.IncrementalDrift.committedBatch(s, base).contains(2L)) {
        val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
        for (i <- 0 until 3)
          graft.streaming.IncrementalDrift.processBatch(s,
            docs.filter(pmod(col("doc_id"), lit(3)) === i), base, Some(i.toLong))
      }
      base
    }

  /** The drift maintainer's SERVE path as a registered row: the top-30
    * Dunning-G² source-drift tokens answered from the maintained
    * (source, token, n) counts after a three-batch split — must
    * hash-match q_text_drift's oracle because count partials merge
    * associatively and the G² arithmetic is the one-shot's verbatim
    * (IncrementalDriftSpec pins equality, replay, and the tag-preserving
    * no-id call).
    */
  val serveDriftState = QueryDef(
    "q_serve_drift_state",
    (s, dir) =>
      graft.streaming.IncrementalDrift.driftFromState(s, driftStateBuilt(s, dir)),
    TextQueries.textDrift.oracle,
  )

  def defs: Seq[QueryDef] = Seq(serveHybridState, serveSpanSourceState,
    serveNoveltyState, serveAggState, serveMwState, serveNeardupState,
    serveCdcState, serveShardsState, serveScd2State, serveComponentsState,
    serveRulesState, serveTrendState, serveDriftState, serveWinnowState)
}
