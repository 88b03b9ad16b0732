package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 stage slicer: times named sub-stages of the round's target rows
  * under the bench discipline (3 count() reps → median, releasePinned
  * between measurements). Calls the REAL operator stage functions — no
  * duplicated logic to drift (the r16 advice on probe hygiene).
  * Usage: runMain graft.operators.R17Slice [group ...]
  * groups: dedup, curate (default: all).
  */
object R17Slice {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def time(label: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      graft.BenchUtil.releasePinned(spark)
      println(f"R17SLICE $label%-40s median=${ts(1)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val groups = if (args.isEmpty) Set("dedup", "curate") else args.toSet
    if (groups("dedup")) {
      val docTokens = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"),
        graft.functions.Tokenize.tokenSet(col("text")).as("toks"))
      time("dedup: tokenize+hash (verify input)") {
        graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"),
          graft.functions.Tokenize.hashedTokenSet(col("text")).as("toksh")).count()
      }
      time("bucketed: candidate join stage") {
        DedupQueries.bucketedBandCandidatesStage(spark, sfDir).count()
      }
      time("bucketed: candidates+distinct") {
        DedupQueries.bucketedBandCandidatesStage(spark, sfDir).distinct().count()
      }
      time("bucketed: + verify (no sort)") {
        DedupQueries.verifyJaccard(
          DedupQueries.bucketedBandCandidatesStage(spark, sfDir).distinct(),
          graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"),
            graft.functions.Tokenize.hashedTokenSet(col("text")).as("toksh")).localCheckpoint(),
          1, 2).count()
      }
      time("bucketed: full query") {
        graft.SparkEntry.queries("q_dedup_near_bucketed")(spark, sfDir).count()
      }
      // selectivity census: how many pair rows exist pre-distinct, how
      // many distinct, how many pass the size band, how many verify
      locally {
        val cand = DedupQueries.bucketedBandCandidatesStage(spark, sfDir)
        val pre = cand.count()
        val dist = cand.distinct().localCheckpoint()
        val nDist = dist.count()
        val sizes = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
          size(graft.functions.Tokenize.tokenSet(col("text"))).as("sz"))
        val withSz = dist
          .join(broadcast(sizes.select(col("doc_id").as("doc_id1"), col("sz").as("sz1"))), "doc_id1")
          .join(broadcast(sizes.select(col("doc_id").as("doc_id2"), col("sz").as("sz2"))), "doc_id2")
        val nBand = withSz.filter(DedupQueries.sizeBand(col("sz1"), col("sz2"), 1, 2)).count()
        val nVerified = graft.SparkEntry.queries("q_dedup_near_bucketed")(spark, sfDir).count()
        println(s"R17SLICE census pre_distinct=$pre distinct=$nDist band_pass=$nBand verified=$nVerified")
        graft.BenchUtil.releasePinned(spark)
      }
      time("salted: signatures materialized") {
        DedupQueries.materializedSignatures(docTokens, 16).count()
      }
      time("salted: full query") {
        graft.SparkEntry.queries("q_dedup_near_salted")(spark, sfDir).count()
      }
    }
    if (groups("curate")) {
      // per-stage slopes (r16 verdict item 6): each stage timed as a
      // noop-sink prefix of the real pipeline (CurationPipeline's own
      // code path, private[graft]-shared — no duplicated logic)
      import graft.functions.Tokenize
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val docs = graft.Tables.documents(spark, sfDir)
      time("curate s0+1: score+gate") {
        noop(CurationPipeline.scoredDocs(docs).filter(col("quality_score") >= 0.5)
          .select("doc_id", "lang", "n_tokens", "quality_score"))
      }
      def exactStage() = {
        val quality = CurationPipeline.scoredDocs(docs).filter(col("quality_score") >= 0.5)
        quality
          .withColumn("keep_id", min("doc_id").over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(xxhash64(col("text")), col("text"))))
          .filter(col("doc_id") === col("keep_id"))
          .withColumn("th", Tokenize.hashedSetOf(col("toks")))
          .localCheckpoint()
      }
      // cumulative prefixes, each block self-contained (releasePinned
      // between measurements unpersists checkpoints, so a shared `exact`
      // frame would lose its blocks): stage deltas = successive
      // differences. P2 = through exact-dedup, P3 = + LSH candidates,
      // P4 = the full pipeline (+ verify + anti-join).
      time("curate P2: exact-dedup ckpt") { exactStage() }
      time("curate P3: + LSH candidates") {
        val exact = exactStage()
        DedupQueries.minhashBandCandidatesSkewSafe(
          exact.select(col("doc_id"), col("lang"), col("toks"))).count()
      }
      time("curate P4: full query") {
        graft.SparkEntry.queries("q_pipeline_curate")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
