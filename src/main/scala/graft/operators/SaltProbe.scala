package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Throwaway diagnostic: where does q_dedup_near_salted's time go —
// signature checkpoint, candidate join, or the verify gate?
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val a = f
      println(f"PROBE $tag ${(System.nanoTime - t0) / 1e9}%.2f s"); a
    }
    val docs = graft.Tables.documents(spark, dir)
    val sets = docs.select(col("doc_id"), col("lang"),
      graft.functions.Tokenize.tokenSet(col("text")).as("toks"))
    timed("banded_checkpoint") {
      DedupQueries.bandedSignatures(sets, 16)
        .select("doc_id", "lang", "band", "sig").localCheckpoint().count()
    }
    def joinKind(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        .filter(plan.contains).mkString("+")
    }
    println("PROBE plain_join=" + joinKind(DedupQueries.minhashBandCandidates(sets)))
    println("PROBE salted_join=" + joinKind(
      DedupQueries.minhashBandCandidatesSkewSafe(sets, blocks = 8)))
    // raw join mass without the terminal distinct
    val banded0 = DedupQueries.bandedSignatures(sets, 16)
      .select("doc_id", "lang", "band", "sig").localCheckpoint()
    val pl = banded0.select(col("lang"), col("band"), col("sig"), col("doc_id").as("doc_id1"))
    val pr = banded0.select(col("lang").as("lang2"), col("band").as("band2"),
      col("sig").as("sig2"), col("doc_id").as("doc_id2"))
    val plainRaw = pl.join(pr, col("lang") === col("lang2") && col("band") === col("band2")
      && col("sig") === col("sig2") && col("doc_id1") < col("doc_id2"))
      .select("doc_id1", "doc_id2")
    timed("plain_raw_join") { println("rows=" + plainRaw.count()) }
    val bandedG = banded0.withColumn("blk", pmod(col("doc_id"), lit(8)).cast("int"))
    val grid = explode(array((0 until 8).map(lit(_)): _*))
    val gl = bandedG.withColumn("bj", grid).select(col("lang"), col("band"), col("sig"),
      col("blk").as("bi"), col("bj"), col("doc_id").as("doc_id1"))
    val gr = bandedG.withColumn("bi", grid).select(col("lang").as("lang2"),
      col("band").as("band2"), col("sig").as("sig2"),
      col("bi").as("bi2"), col("blk").as("bj2"), col("doc_id").as("doc_id2"))
    val saltedRaw = gl.join(gr, col("lang") === col("lang2") && col("band") === col("band2")
      && col("sig") === col("sig2") && col("bi") === col("bi2")
      && col("bj") === col("bj2") && col("doc_id1") < col("doc_id2"))
      .select("doc_id1", "doc_id2")
    timed("salted_raw_join") { println("rows=" + saltedRaw.count()) }
    timed("plain_raw_join2") { plainRaw.count() }
    timed("salted_raw_join2") { saltedRaw.count() }
    timed("plain_raw_smj") { pl.hint("merge").join(pr, col("lang") === col("lang2") && col("band") === col("band2")
      && col("sig") === col("sig2") && col("doc_id1") < col("doc_id2")).select("doc_id1").count() }
    timed("salted_raw_smj") { gl.hint("merge").join(gr, col("lang") === col("lang2") && col("band") === col("band2")
      && col("sig") === col("sig2") && col("bi") === col("bi2")
      && col("bj") === col("bj2") && col("doc_id1") < col("doc_id2")).select("doc_id1").count() }
    timed("plain_distinct") { plainRaw.distinct().count() }
    timed("salted_distinct") { saltedRaw.distinct().count() }
    for (rep <- 1 to 1) {
      timed(s"plain_cands_$rep") { DedupQueries.minhashBandCandidates(sets).count() }
      timed(s"salted_cands_$rep") {
        DedupQueries.minhashBandCandidatesSkewSafe(sets, blocks = 8).count() }
    }
    spark.stop()
  }
}
