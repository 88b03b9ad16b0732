package graft.operators

import graft.Tables
import graft.functions.Tokenize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// Temporary diagnostic main — not part of the library surface.
// Sweeps shingle-LSH banding configs for q_dedup_near_ngram: candidates,
// verified pairs, recall vs the exact quadratic join, wall time.
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), Tokenize.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), Tokenize.hashedShingleSet(col("toks")).as("grams"))
    val hashed = grams.select(col("doc_id"), col("grams").as("toksh")).cache()
    // signature input: PORTABLE gram hashes (bandedSignatures' long-array
    // contract); the xxhash64 grams above stay the verify counting unit
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), Tokenize.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"),
        transform(array_distinct(Tokenize.bigramShingles(col("tk"))),
          g => graft.functions.PortableHash.tokenHash(g)).as("toks")).cache()
    sets.count(); hashed.count()

    val exact = DedupQueries.dedupNgram.query(spark, dir)
      .select("doc_id1", "doc_id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"EXACT pairs=${exact.size}")

    for ((bands, nHashes) <- Seq((16, 32), (32, 32), (32, 64), (24, 48))) {
      val t0 = System.nanoTime
      val banded = DedupQueries.bandedSignatures(sets, bands, nHashes)
      val l = banded.select(col("lang"), col("band"), col("sig"), col("doc_id").as("doc_id1"))
      val r = banded.select(col("lang").as("lang2"), col("band").as("band2"), col("sig").as("sig2"),
        col("doc_id").as("doc_id2"))
      val cands = l.join(r,
          col("lang") === col("lang2") && col("band") === col("band2")
            && col("sig") === col("sig2") && col("doc_id1") < col("doc_id2"))
        .select("doc_id1", "doc_id2").distinct()
      val nCand = cands.count()
      val got = DedupQueries.verifyJaccard(cands, hashed, 3, 10)
        .select("doc_id1", "doc_id2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val secs = (System.nanoTime - t0) / 1e9
      val recall = if (exact.isEmpty) 1.0 else got.intersect(exact).size.toDouble / exact.size
      val prec = got.subsetOf(exact)
      println(f"SWEEP bands=$bands%d nHashes=$nHashes%d cand=$nCand%d got=${got.size}%d " +
        f"recall=$recall%.4f precisionExact=$prec time=$secs%.2fs")
    }
    spark.stop()
  }
}
