package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental inverted-index maintenance — the streaming upkeep of
  * q_text_index's search surface: each arriving micro-batch of documents
  * lands its postings APPEND-ONLY (one parquet dir per batch — postings
  * of a doc never change once written, the immutable-segment property
  * every search engine builds on) and MERGES the bounded per-token stats
  * (df, cf) IncrementalAgg-style (count partials are associative, so
  * state ∘ batch ≡ one-shot over everything seen — the invariant
  * IncrementalIndexSpec replays the fixture to assert). No batch ever
  * re-tokenizes history.
  *
  * Scale shape: the postings family is the big side and is never
  * rewritten — batches cost O(batch); a compaction that folds small
  * posting segments is the pack-store compactTail idea and composes the
  * same way. The stats table is vocabulary-sized (bounded), rewritten
  * per merge behind a _CURRENT version swap so readers never observe a
  * half-written state. [[searchHeads]] serves q_text_index's df-filtered
  * posting heads STRAIGHT from the maintained state.
  *
  * Contract: each doc_id arrives exactly once (corpus ingest; the
  * exactly-once wrapper is PackIngest's batch-id discipline, reusable
  * upstream of this maintainer).
  */
object IncrementalIndex {

  private val statsSchema = StructType(Seq(
    StructField("token", StringType),
    StructField("df", LongType),
    StructField("cf", LongType)))

  /** _CURRENT carries `v<N>` or `v<N>:batch=<id>` — the committed batch
    * id rides IN the atomically-swapped pointer (the PackIngest replay
    * discipline): a foreachBatch replay after a crash between the swap
    * and the stream's checkpoint commit is detected and skipped, so a
    * batch's postings can never land twice.
    */
  private def currentPointer(s: SparkSession, base: String): Option[(String, Option[Long])] =
    graft.sources.GraftFs.readSmallFile(s, s"$base/_CURRENT").map { c =>
      c.trim.split(":batch=") match {
        case Array(v, b) => (v, Some(b.toLong))
        case Array(v) => (v, None)
      }
    }

  private def currentVersion(s: SparkSession, base: String): Option[String] =
    currentPointer(s, base).map(_._1)

  /** Current per-token stats (empty before the first batch). */
  def readStats(s: SparkSession, base: String): DataFrame =
    currentVersion(s, base) match {
      case Some(v) => s.read.schema(statsSchema).parquet(s"$base/stats/$v")
      case None => s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], statsSchema)
    }

  /** All posting segments (token, doc_id, tf); empty before any batch. */
  def readPostings(s: SparkSession, base: String): DataFrame = {
    val (fs, q) = graft.sources.GraftFs.resolve(s, s"$base/postings")
    if (!fs.exists(q)) s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("token", StringType),
        StructField("doc_id", LongType), StructField("tf", LongType))))
    else s.read.option("recursiveFileLookup", "true").parquet(s"$base/postings")
  }

  private def batchTf(batch: DataFrame): DataFrame =
    batch.select(col("doc_id"),
        explode(graft.functions.Tokenize.tokens(col("text"))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))

  /** Land one micro-batch: append its posting segment, merge its stats
    * partials, swap the stats version. Batch cost is O(batch) — the
    * posting history is never touched.
    */
  def processBatch(s: SparkSession, batch: DataFrame, base: String,
      batchId: Option[Long] = None): Unit = {
    val ptr = currentPointer(s, base)
    // replayed micro-batch (its id already committed in the pointer): skip
    if (batchId.exists(id => ptr.flatMap(_._2).exists(_ >= id))) return
    val tf = batchTf(batch).localCheckpoint()
    val next = ptr.map(_._1.drop(1).toLong + 1).getOrElse(0L)
    tf.write.mode("overwrite").parquet(s"$base/postings/b$next")
    val partial = tf.groupBy("token")
      .agg(count(lit(1)).as("df2"), sum("tf").as("cf2"))
    val merged = readStats(s, base)
      .join(partial.withColumnRenamed("token", "t2"),
        col("token") === col("t2"), "full_outer")
      .select(
        coalesce(col("token"), col("t2")).as("token"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("df2"), lit(0L))).as("df"),
        (coalesce(col("cf"), lit(0L)) + coalesce(col("cf2"), lit(0L))).as("cf"))
      .localCheckpoint()
    merged.write.mode("overwrite").parquet(s"$base/stats/v$next")
    val tag = batchId.fold("")(id => s":batch=$id")
    graft.sources.GraftFs.writeSmallFileAtomic(s, s"$base/_CURRENT", s"v$next$tag")
  }

  /** q_text_index's output shape served from the maintained state:
    * df ≥ `minDf` tokens with stats and top-`k` posting heads. The
    * posting window scans segments, not raw text.
    */
  def searchHeads(s: SparkSession, base: String, minDf: Long = 5L, k: Int = 5): DataFrame = {
    val stats = readStats(s, base).filter(col("df") >= minDf)
    val w = Window.partitionBy("token").orderBy(desc("tf"), asc("doc_id"))
    readPostings(s, base).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .join(stats, "token")
      .select("token", "df", "cf", "rn", "doc_id", "tf")
      .orderBy("token", "rn")
  }

  /** BM25 ranked retrieval served ENTIRELY from the maintained state —
    * the build→serve loop closed: tf comes from the posting segments, df
    * from the stats table, and document lengths / corpus averages derive
    * from one aggregate over postings (dl = Σtf per doc — exact, since
    * postings are whitespace-token counts). No document text is ever
    * re-read; IncrementalIndexSpec pins row equality with the
    * from-scratch facade bm25 after a multi-batch ingest.
    */
  def bm25(s: SparkSession, base: String, queries: DataFrame, k: Int = 5,
      qid: String = "query_id", qtext: String = "query_text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = readPostings(s, base)
    val dfRel = readStats(s, base).select(col("token"), col("df"))
    val docs = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val glob = docs.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val qterms = queries.select(col(qid),
      explode(array_distinct(graft.functions.Tokenize.tokens(col(qtext)))).as("token"))
    val contrib = tf.join(broadcast(qterms), "token")
      .join(dfRel, "token").join(docs, "doc_id").crossJoin(broadcast(glob))
      .withColumn("__c",
        round(log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))),
          8).cast(org.apache.spark.sql.types.DecimalType(18, 8)))
    val scores = contrib.groupBy(col(qid), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), round(sum("__c").cast("double"), 6).as("score"))
    val w = Window.partitionBy(qid).orderBy(desc("score"), asc("doc_id"))
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qid), col("rank"), col("doc_id"), col("n_terms"), col("score"))
  }

  /** Fold all posting segments into ONE (the LSM/compactTail analogue
    * for the index): per-batch ingest leaves one small parquet dir per
    * micro-batch, and a year of minutely batches is 5×10⁵ dirs whose
    * listing tax every searchHeads pays — this rewrites the UNION into
    * `c<N>` (content unchanged by construction: postings are disjoint
    * (token, doc) facts, order-free), then removes the constituent
    * segments. The window between the compacted write and the segment
    * removals is read-inconsistent for an overlapping reader at spec
    * scale (duplicated postings, never lost ones) — a deployment runs
    * it from the single maintainer thread between batches, same
    * single-admin contract as the matview rewrites. Stats are untouched
    * (they were never per-segment).
    */
  def compactSegments(s: SparkSession, base: String): Unit = {
    val (fs, q) = graft.sources.GraftFs.resolve(s, s"$base/postings")
    if (!fs.exists(q)) return
    val segs = fs.listStatus(q).toSeq.filter(_.isDirectory).map(_.getPath.toString)
    if (segs.size <= 1) return
    val next = currentVersion(s, base).map(_.drop(1).toLong + 1).getOrElse(0L)
    val target = s"$base/postings/c$next"
    readPostings(s, base).localCheckpoint()
      .write.mode("overwrite").parquet(target)
    val keep = graft.sources.GraftFs.qualify(s, target)
    segs.filterNot(p => graft.sources.GraftFs.qualify(s, p) == keep)
      .foreach(graft.sources.GraftFs.deleteRecursively(s, _))
  }

  /** Attach to a documents stream via foreachBatch (replay-protected). */
  def attach(docs: DataFrame, base: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      processBatch(batch.sparkSession, batch, base, Some(bid))
    }
}
