package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// Throwaway diagnostic: decade growth of the round-8 retrieval + phash
// families. The documents corpus is replicated k× under a bijective
// token suffix (replicas share no tokens, doc_ids offset), so the
// vocabulary, posting lists, and phash corpus each grow k× while the
// qualifying structures stay replica-local:
//   - index build (q_text_index shape): tokenize + two shuffles → cost
//     should track k× rows.
//   - BM25 (fixed 24-term query set from replica 0): posting-join rows
//     grow k× only if the query terms match across replicas — they
//     can't (suffixing) — so retrieval cost should stay ~FLAT modulo
//     the corpus-side tf aggregate, which is the k× tokenize floor.
//   - phash banded join: twins stay within replica; with SELECTIVE
//     14-bit bands candidates should grow far below k² (7-bit bands
//     measured k² — birthday saturation of 128 bucket values — which is
//     why the registered op uses 4×14).
// This is the measured form of the SURVEY scale claims for the three
// operators. Usage: runMain graft.operators.SearchScaleProbe [sfDir] [k]
object SearchScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    def docsAt(reps: Int): DataFrame =
      graft.Tables.documents(spark, dir)
        .crossJoin(spark.range(0, reps).toDF("r"))
        .select((col("doc_id") + col("r") * 100000000L).as("doc_id"),
          expr("concat_ws(' ', transform(split(text, ' '), t -> concat(t, '_', r)))")
            .as("text"),
          col("n_chars"))
        .localCheckpoint()

    def indexBuild(docs: DataFrame): Long = {
      val tf = docs.select(col("doc_id"),
          explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val wOrd = Window.partitionBy("token").orderBy(desc("tf"), asc("doc_id"))
      val wAll = Window.partitionBy("token")
      tf.withColumn("rn", row_number().over(wOrd))
        .withColumn("df", count(lit(1)).over(wAll))
        .filter(col("rn") <= 5 && col("df") >= 5).count()
    }

    def bm25(docs: DataFrame): Long = {
      val toks = docs.select(col("doc_id"),
        explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfRel = tf.groupBy("token").agg(count(lit(1)).as("df"))
      // fixed query set: replica-0 docs 0-7, top-3 tokens by tf
      val wq = Window.partitionBy("doc_id").orderBy(desc("tf"), asc("token"))
      val qterms = tf.filter(col("doc_id") < 8)
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 3)
        .select(col("doc_id").as("query_id"), col("token"))
      tf.join(broadcast(qterms), "token").join(dfRel, "token")
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n"))
        .count()
    }

    def phashPairs(docs: DataFrame): Long = {
      val base = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("media_id"),
          expr("transform(sequence(1, length(text)), i -> cast(ascii(substring(text, i, 1)) as bigint))")
            .as("codes"))
      val h = base
        .withColumn("len", size(col("codes")).cast("long"))
        .withColumn("pix",
          expr("transform(sequence(0, 63), k -> element_at(codes, cast((k * len) div 64 as int) + 1))"))
        .select(col("media_id"), expr(
          """aggregate(sequence(0, 55), cast(0 as bigint), (acc, b) ->
            |  acc + CASE WHEN element_at(pix, cast((b div 7) * 8 + (b % 7) + 2 as int))
            |                  > element_at(pix, cast((b div 7) * 8 + (b % 7) + 1 as int))
            |             THEN shiftleft(cast(1 as bigint), cast(b as int))
            |             ELSE cast(0 as bigint) END)""".stripMargin).as("hash"))
        .localCheckpoint()
      val bands = h.select(col("media_id"), col("hash"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .withColumn("bv", expr("shiftright(hash, cast(14 * j as int)) & 16383"))
      bands.select(col("j"), col("bv"), col("media_id").as("id1"))
        .join(bands.select(col("j").as("j2"), col("bv").as("bv2"), col("media_id").as("id2")),
          col("j") === col("j2") && col("bv") === col("bv2") && col("id1") < col("id2"))
        .select("id1", "id2").distinct().count()
    }

    for (reps <- Seq(1, k)) {
      val docs = docsAt(reps)
      val n = docs.count()
      val (ih, it) = timed(indexBuild(docs))
      val (bh, bt) = timed(bm25(docs))
      val (ph, pt) = timed(phashPairs(docs))
      println(f"SCALEPROBE reps=$reps docs=$n index_rows=$ih index_s=$it%.2f " +
        f"bm25_rows=$bh bm25_s=$bt%.2f phash_cands=$ph phash_s=$pt%.2f")
    }
    spark.stop()
  }
}
