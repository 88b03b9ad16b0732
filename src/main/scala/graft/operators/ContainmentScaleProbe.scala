package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

// Throwaway diagnostic: decade growth of the two containment joins.
// The corpus is replicated k× under a BIJECTIVE token suffix (every token
// of replica r becomes "<token>_r", doc_ids offset per replica), so
// replicas share no tokens: the qualifying pair set is EXACTLY k× the
// original while lang-block row counts grow k×. The exact join enumerates
// lang-blocked (smaller, larger) pairs — k² growth by construction — while
// the prefix-filtered join probes posting lists that never cross replicas,
// so its candidate volume (and cost) should track the k× output, not the
// k² pair space. This is the measured version of the
// q_sim_containment_prefix scale claim (PERF.md round-8).
// Usage: runMain graft.operators.ContainmentScaleProbe [sfDir] [k]
object ContainmentScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    /** k replicas as hashed containment sets (doc_id, lang, toksh, sz). */
    def setsAt(reps: Int): DataFrame = {
      val docs = graft.Tables.documents(spark, dir)
      val offset = 100000000L
      val replicated = docs
        .crossJoin(spark.range(0, reps).toDF("r"))
        .select((col("doc_id") + col("r") * offset).as("doc_id"), col("lang"),
          expr("concat_ws(' ', transform(split(text, ' '), t -> concat(t, '_', r)))")
            .as("text"))
      replicated.select(col("doc_id"), col("lang"),
          graft.functions.Tokenize.hashedTokenSet(col("text")).as("toksh"))
        .withColumn("sz", size(col("toksh")))
    }

    def exactJoin(t: DataFrame): DataFrame = {
      val a = t.select(col("lang"), col("doc_id").as("doc_id1"),
        col("toksh").as("toks1"), col("sz").as("sz1")).repartition(col("doc_id1"))
      val b = t.select(col("lang").as("lang2"), col("doc_id").as("doc_id2"),
        col("toksh").as("toks2"), col("sz").as("sz2"))
      a.join(b, col("lang") === col("lang2")
          && (col("sz1") < col("sz2")
            || (col("sz1") === col("sz2") && col("doc_id1") < col("doc_id2"))))
        .withColumn("inter", DedupQueries.intersectAtLeast(col("toks1"), col("toks2"),
          expr("CAST((4 * sz1 + 4) div 5 AS INT)")))
        .filter(col("inter") * 5 >= col("sz1") * 4)
        .select("doc_id1", "doc_id2")
    }

    def prefixJoin(t: DataFrame): DataFrame = {
      val tc = t.localCheckpoint()
      val cands = DedupQueries.containmentPrefixCandidates(tc)
      val t1 = tc.select(col("doc_id").as("doc_id1"), col("toksh").as("toks1"),
        col("sz").as("sz1"))
      val t2 = tc.select(col("doc_id").as("doc_id2"), col("toksh").as("toks2"))
      cands.join(t1, "doc_id1").join(t2, "doc_id2")
        .withColumn("inter", DedupQueries.intersectAtLeast(col("toks1"), col("toks2"),
          expr("CAST((4 * sz1 + 4) div 5 AS INT)")))
        .filter(col("inter") * 5 >= col("sz1") * 4)
        .select("doc_id1", "doc_id2")
    }

    for (reps <- Seq(1, k)) {
      val sets = setsAt(reps).localCheckpoint()
      val (nCand, tCand) = timed(
        DedupQueries.containmentPrefixCandidates(sets.localCheckpoint()).count())
      // reps=1 first warms codegen/shuffle machinery; each point reports
      // the second (steady) measurement of both joins
      val (ne, te) = { timed(exactJoin(sets).count()); timed(exactJoin(sets).count()) }
      val (np, tp) = { timed(prefixJoin(sets).count()); timed(prefixJoin(sets).count()) }
      assert(ne == np, s"paths disagree at $reps x: exact=$ne prefix=$np")
      println(f"CONTSCALE reps=$reps pairs=$ne cands=$nCand cand_s=$tCand%.2f " +
        f"exact_s=$te%.2f prefix_s=$tp%.2f")
    }
    spark.stop()
  }
}
