package graft

import graft.operators.{JoinQueries, RelationalQueries}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.matchers.should.Matchers

/** Physical-plan shape assertions (SURVEY.md §5.2(2)): the scale properties
  * we rely on must be visible in the executed plan, not assumed — pushdown
  * reaching the parquet scan, broadcast/SMJ strategy, and top-k without a
  * global sort.
  */
class PlanShapeSpec extends SparkTestBase with Matchers {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q_scan_pruned pushes the predicate and prunes columns at the parquet scan") {
    val df = RelationalQueries.scanPruned.query(spark, sfTiny)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThan(l_quantity,49.0)")
    // pruned read schema: only the three selected columns reach the scan
    plan should include("ReadSchema")
    plan should not include "l_extendedprice"
  }

  test("q_scan_partitioned prunes fact partitions dynamically from the dim filter (DPP)") {
    val df = RelationalQueries.scanPartitioned.query(spark, sfTiny)
    // DPP is decided at planning: the fact scan's PartitionFilters must
    // carry a dynamicpruningexpression fed by the broadcast dim subquery.
    val plan = df.queryExecution.executedPlan.toString
    plan should include("dynamicpruningexpression")
    plan should include("PartitionFilters")
    df.collect().length should be > 0
  }

  test("q_join_broadcast plans a BroadcastHashJoin") {
    executedPlanString(JoinQueries.joinBroadcast.query(spark, sfTiny)) should
      include("BroadcastHashJoin")
  }

  test("q_join_bucketed merges co-located buckets with no exchange and no sort") {
    val df = JoinQueries.bucketedJoin(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("SortMergeJoin")
    // bucketed 8×8 layouts, hashed+sorted on the join key on both sides:
    // the join must read buckets directly — any Exchange or Sort here means
    // the co-location was lost
    plan should not include "Exchange"
    plan should not include " Sort [" // the only Sort should be inside SortMergeJoin's name
    plan should include("SelectedBucketsCount")
  }

  test("q_sim_jaccard_bucketed joins co-located lang buckets with no exchange and no sort") {
    val df = graft.operators.DedupQueries.bucketedSimJoinStage(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("SortMergeJoin")
    // both sides scan the SAME lang-bucketed layout: the per-lang pair
    // self-join must be co-located — an Exchange or Sort means the layout
    // was ignored and the join would reshuffle the whole corpus at scale
    plan should not include "Exchange"
    plan should not include " Sort [" // the only Sort should be inside SortMergeJoin's name
    plan should include("SelectedBucketsCount")
    // and it must agree with the broadcast-shaped exact join
    val rows = df.collect().map(_.toSeq).toSet
    val want = graft.operators.DedupQueries.simJaccard.query(spark, sfTiny).collect().map(_.toSeq).toSet
    rows shouldBe want
  }

  test("q_dedup_near_bucketed candidate join reads co-located signature buckets, result equals q_dedup_near") {
    val stage = graft.operators.DedupQueries.bucketedBandCandidatesStage(spark, sfTiny)
    val plan = executedPlanString(stage)
    plan should include("SortMergeJoin")
    // the signature table is bucketed+sorted on the full candidate-join key
    // (lang, band, sig): the self-join must be a per-bucket merge — an
    // Exchange or Sort means the persisted layout was ignored and the
    // near-dedup run would reshuffle every signature at scale
    plan should not include "Exchange"
    plan should not include " Sort [" // the only Sort should be inside SortMergeJoin's name
    plan should include("SelectedBucketsCount")
    // same hash family, same banding ⇒ the bucketed path must reproduce
    // q_dedup_near row for row (scores included)
    val got = graft.operators.DedupQueries.dedupNearBucketed.query(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    val want = graft.operators.DedupQueries.dedupNear.query(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    got shouldBe want
  }

  test("q_events_sessionize_bucketed runs windows + aggregate with no exchange and no sort") {
    val stage = graft.operators.EventQueries.sessionizeBucketedStage(spark, sfTiny)
    val plan = executedPlanString(stage)
    plan should include("Window")
    // the user-bucketed, (user_id, ts_us, event_id)-sorted scan satisfies
    // both window passes and the per-(user, session) hash aggregate:
    // any Exchange or Sort means the layout was ignored and the whole
    // event table reshuffles per query at scale
    plan should not include "Exchange"
    plan should not include " Sort ["
    plan should include("SelectedBucketsCount")
    // and it must agree with the plain formulation
    val got = stage.collect().map(_.toSeq).toSet
    val want = graft.operators.EventQueries.sessionize.query(spark, sfTiny)
      .collect().map(_.toSeq).toSet
    got shouldBe want
  }

  test("bucketed funnel and streaks shuffle nothing but single-row global counts") {
    val funnel = graft.operators.EventQueries.funnelBucketedStage(spark, sfTiny)
    val fPlan = executedPlanString(funnel)
    // per-user aggregates and user-keyed joins ride the bucketed
    // distribution; only the 1-row global counts may exchange
    fPlan should not include "Exchange hashpartitioning"
    val streak = graft.operators.EventQueries.streakBucketedStage(spark, sfTiny)
    val sPlan = executedPlanString(streak)
    sPlan should not include "Exchange hashpartitioning"
    sPlan should include("Window")
    // both must agree with their plain formulations
    funnel.collect().map(_.toSeq).toSet shouldBe
      graft.operators.EventQueries.funnel.query(spark, sfTiny).collect().map(_.toSeq).toSet
    streak.collect().map(_.toSeq).toSet shouldBe
      graft.operators.EventQueries.winStreak.query(spark, sfTiny).collect().map(_.toSeq).toSet
  }

  test("q_join_sortmerge honors the merge hint") {
    executedPlanString(JoinQueries.joinSortMerge.query(spark, sfTiny)) should
      include("SortMergeJoin")
  }

  test("q_limit_topk avoids a global sort via TakeOrderedAndProject") {
    executedPlanString(RelationalQueries.limitTopk.query(spark, sfTiny)) should
      include("TakeOrderedAndProject")
  }

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    import org.apache.spark.sql.functions._
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of the big side lands on ONE key — the shape that stalls a
      // plain shuffle join on one reducer; AQE must split that partition
      val big = spark.range(0, 200000).select(
        when(col("id") < 180000, lit(1L)).otherwise(col("id")).as("k"),
        concat(lit("x"), col("id")).as("pad"))
      val dim = spark.range(0, 2000).select(col("id").as("k2"), (col("id") * 2).as("v"))
      val j = big.hint("merge").join(dim, col("k") === col("k2"))
      j.collect()
      j.queryExecution.executedPlan.toString should include("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cached relation serves repeated queries from InMemoryTableScan with equal results") {
    val docs = Tables.documents(spark, sfTiny)
    val before = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    docs.createOrReplaceTempView("graft_cache_probe")
    spark.catalog.cacheTable("graft_cache_probe")
    try {
      val cachedQ = spark.table("graft_cache_probe").groupBy("lang").count()
      cachedQ.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe before
      // AQE renders the cached scan as a TableCacheQueryStage wrapping an
      // InMemoryTableScan; accept either spelling
      val plan = cachedQ.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        s"no cached-scan node in plan:\n$plan")
    } finally spark.catalog.uncacheTable("graft_cache_probe")
  }

  test("q_join_theta stays a hash join with residual condition (no nested loop)") {
    val plan = executedPlanString(JoinQueries.joinTheta.query(spark, sfTiny))
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("q_join_bloomfilter injects a runtime bloom filter on the fact side, parent session untouched") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val df = JoinQueries.joinBloomFilter.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // the dim's selective predicate reaches the fact side as might_contain
    // BEFORE the fact shuffle — the non-partition-key sibling of DPP
    plan should include("might_contain")
    plan should include("SortMergeJoin")
    // the conf overrides lived in the child newSession() only
    spark.conf.get("spark.sql.autoBroadcastJoinThreshold") shouldBe before
  }

  test("q_cdc_upsert_bucketed full-outer-merges co-located PK buckets with no exchange and no sort") {
    val df = graft.operators.CdcQueries.bucketedApplyStage(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("SortMergeJoin")
    plan should include("FullOuter")
    // snapshot and change batch both read the o_orderkey-bucketed layout:
    // any Exchange or Sort means the co-location was lost
    plan should not include "Exchange"
    plan should not include " Sort ["
    plan should include("SelectedBucketsCount")
  }

  test("q_text_boilerplate shuffle-joins its corpus-proportional dictionary off ONE corpus explode") {
    val df = graft.operators.CurationQueries.textBoilerplate.query(spark, sfTiny)
    // only the AQE final plan shows runtime stage reuse
    val finalPlan = executedPlanString(df).split("== Initial Plan ==")(0)
    // the DF>=3 dictionary grows with the corpus: it must never broadcast,
    // and the hint pins a sort-free shuffled hash join
    finalPlan should not include "BroadcastHashJoin"
    finalPlan should include("ShuffledHashJoin")
    // the DF-aggregate branch and the join probe consume the SAME
    // explode+shuffle — exactly one live scan of documents in the final plan
    finalPlan should include("ReusedExchange")
    "FileScan parquet".r.findAllIn(finalPlan).length shouldBe 1
  }

  test("q_pipeline_e2e admission reads the bucketed curated corpus, pair joins are equi-joins") {
    val df = graft.operators.CurationPipeline.pipelineE2e.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // the standing corpus must come from the persisted lang-bucketed
    // layout, not a re-derivation of the CSV ingest
    plan should include("graft_curated_bucketed")
    plan should include("Bucketed: true")
    // admission joins (text probe, lang-blocked jaccard) stay equi-joins
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_sql_q10 pushes the returnflag filter to the fact scan and avoids a global sort") {
    val df = graft.operators.TpchQueries.sqlQ10.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // the selective flag reaches the lineitem parquet scan as a pushed filter
    plan should include("EqualTo(l_returnflag,R)")
    // top-20 rides TakeOrderedAndProject — never a global Sort + Limit
    plan should include("TakeOrderedAndProject")
  }

  test("q_sql_q7 broadcasts both nation uses, no cartesian from the disjunctive predicate") {
    val df = graft.operators.TpchQueries.sqlQ7.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    // the nation dim joins twice, both broadcast
    "BroadcastHashJoin".r.findAllIn(plan).length should be >= 2
  }

  test("q_sql_q2 decorrelates the scalar min into an aggregate rejoin, no cartesian") {
    val df = graft.operators.TpchQueries.sqlQ2.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // the correlated `= (SELECT MIN …)` must become a grouped aggregate
    // joined back on p_partkey — a per-row re-execution would appear as a
    // nested loop over the subquery side
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // region/nation dims broadcast in both the outer and inner derivations
    "BroadcastHashJoin".r.findAllIn(plan).length should be >= 2
  }

  test("q_sql_q21 plans EXISTS as left-semi and NOT EXISTS as left-anti on the fact key") {
    val df = graft.operators.TpchQueries.sqlQ21.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // at 100 TB both correlated predicates must be one shuffle join each on
    // l_orderkey — never a per-row lineitem re-scan
    plan should include("LeftSemi")
    plan should include("LeftAnti")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_sql_q6 pushes every predicate to the lineitem scan (no-shuffle aggregate)") {
    val df = graft.operators.TpchQueries.sqlQ6.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // all four conjuncts are scan-pushable (the PushedFilters list is
    // elided in toString, so assert its head + the post-scan Filter's
    // residual conjuncts, which print in full)
    plan should include("PushedFilters: [IsNotNull(l_shipdate)")
    plan should include(">= 0.02)")
    plan should include("< 24.0)")
    // degenerate-shuffle shape: the only exchange is the single-row
    // global-aggregate fan-in
    "Exchange (?!SinglePartition)".r.findFirstIn(plan) shouldBe None
  }

  test("q_sql_q4 plans the EXISTS as a left-semi join, never a per-row re-scan") {
    val df = graft.operators.TpchQueries.sqlQ4.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("LeftSemi")
    plan should not include "CartesianProduct"
  }

  test("q_sql_q19 keeps the equi-join under the disjunctive brackets (no nested loop)") {
    val df = graft.operators.TpchQueries.sqlQ19.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // the three brand brackets stay a residual on a p_partkey hash join
    plan should include("Join")
  }

  test("q_sql_q20 decorrelates the nested scalar into semi-join chain, no cartesian") {
    val df = graft.operators.TpchQueries.sqlQ20.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("LeftSemi")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_sql_q17 decorrelates the per-part scalar avg, no cartesian") {
    val df = graft.operators.TpchQueries.sqlQ17.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_sql_q22 plans NOT EXISTS as an anti join on the customer key") {
    val df = graft.operators.TpchQueries.sqlQ22.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("LeftAnti")
    plan should not include "CartesianProduct"
  }

  test("q_ann_ivfpq scans codes through equi-joins only (no cartesian beyond one-row builds)") {
    val df = graft.operators.VectorQueries.annIvfPq.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    // the only nested-loop joins allowed are one-row broadcast builds
    // (the centroid-array crossJoin in assignment/probing projections)
    if (plan.contains("BroadcastNestedLoopJoin")) plan should include("BroadcastExchange")
  }

  test("q_text_index builds from ONE corpus scan (stats folded into the posting window)") {
    val df = graft.operators.SearchQueries.textIndex.query(spark, sfTiny)
    val plan = executedPlanString(df)
    // the regression this pins: a separate stats aggregate re-scanned and
    // re-exploded the corpus when ReuseExchange didn't fire. AQE's plan
    // string repeats the tree under "== Initial Plan ==" — count only the
    // final plan section.
    "Scan parquet".r.findAllIn(plan.split("== Initial Plan ==")(0)).length shouldBe 1
  }

  test("q_text_bm25 retrieval joins are broadcast-built (query side never shuffles the corpus)") {
    val df = graft.operators.SearchQueries.textBm25.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin" // postings meet only broadcast builds
  }

  test("q_graph_linkpred candidates come from equi-joins only (two-hop, never all pairs)") {
    val df = graft.operators.GraphQueries.graphLinkpred.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_mm_phash banded join is an equi-join with exact verify on candidates only") {
    val df = graft.multimodal.MultimodalOps.mmPhash.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_mine_itemsets broadcasts the frequent-item prefilter dim") {
    val plan = executedPlanString(graft.operators.MiningQueries.mineItemsets.query(spark, sfTiny))
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_sim_editdist candidate generation is a pure equi-join (no pair blowup)") {
    val plan = executedPlanString(graft.operators.MiningQueries.simEditdist.query(spark, sfTiny))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("q_events_seqmine: every join is an equi-join on session keys (no pair blowup)") {
    val plan = executedPlanString(graft.operators.EventQueries.eventsSeqmine.query(spark, sfTiny))
    plan should not include "CartesianProduct"
    // the existential triple verify is a LEFT SEMI, not a row-multiplying join
    plan should include("LeftSemi")
  }

  test("q_stat_mad: value-distinct machinery, no cartesian, broadcast med/mad dims") {
    val plan = executedPlanString(graft.operators.StatQueries.statMad.query(spark, sfTiny))
    plan should not include "CartesianProduct"
    plan should include("BroadcastHashJoin") // the 5-row med/mad dims broadcast
  }

  test("q_text_hybrid: vector side broadcasts the 8-doc query set; fusion is key-equi") {
    val plan = executedPlanString(graft.operators.SearchQueries.textHybrid.query(spark, sfTiny))
    plan should not include "CartesianProduct"
    // the cosine scan is a broadcast of the tiny query side over the corpus
    plan should include("BroadcastNestedLoopJoin")
    // fused rank lists meet in a key-equi full outer merge, never a loop join
    plan should include("FullOuter")
  }

  test("q_mine_recs reads the persisted pair store (skinny scans, no basket re-scan)") {
    val df = graft.operators.MiningQueries.mineRecs.query(spark, sfTiny)
    val plan = executedPlanString(df)
    plan should not include "CartesianProduct"
    // steady state scans the persisted pairs/sup parquet, not lineitem
    plan.toLowerCase should include("graft-mine")
    plan.toLowerCase should not include "lineitem.parquet"
  }

  test("q_text_winnow_spans gates the window self-join behind the winnow match (semi-join in the occ stage, no cartesian overall)") {
    import spark.implicits._
    // the gated occ stage's OWN plan must restrict via LeftSemi before any
    // pairwise work — without it the passage pass is corpus-quadratic.
    // (The registered query's final plan hides this behind a
    // localCheckpoint, so the stage is asserted directly.)
    val docs = Tables.documents(spark, sfTiny).select("doc_id", "text")
    val fpDocs = Seq(1L, 2L).toDF("doc_id")
    val occ = graft.operators.TextQueries.winnowSpanOcc(docs, fpDocs)
    executedPlanString(occ) should include("LeftSemi")
    // and the full registered query plans no cartesian anywhere
    val full = graft.operators.TextQueries.textWinnowSpans.query(spark, sfTiny)
    executedPlanString(full) should not include "CartesianProduct"
  }

  test("q_serve_trend_state is state-fed: the maintained slope histogram is load-bearing at serve") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_trend_plan")
      .toFile.getAbsolutePath
    val batch = Seq(("a", 0L, 5L, 1L, 0L, 5L), ("a", 1L, 9L, 1L, 1L, 9L),
        ("a", 2L, 7L, 2L, 2L, 7L), ("b", 0L, 3L, 2L, 3L, 3L))
      .toDF("g", "h", "x", "user_id", "ts_us", "m")
    graft.streaming.IncrementalTrend.processBatch(spark, batch, base, Some(0L))
    val served = graft.streaming.IncrementalTrend.serveTrend(spark, base).collect()
    served should not be empty
    // delete ONLY the maintained serve artifacts (the precumulated Sen
    // marginal, then the moments): a serve that re-derived the pair grid
    // or re-aggregated the hourly grain would still answer — the
    // state-fed serve must fail instead, proving the maintained
    // artifacts are what answer at serve time (r14: serve reads
    // slopes_cum + moments; the raw histogram feeds only ingest)
    val cur = graft.sources.GraftFs.readSmallFile(spark, s"$base/_CURRENT")
      .get.trim.split(":batch=")(0)
    graft.sources.GraftFs.deleteRecursively(spark, s"$base/$cur/slopes_cum")
    an[Exception] should be thrownBy
      graft.streaming.IncrementalTrend.serveTrend(spark, base).collect()
  }
}
