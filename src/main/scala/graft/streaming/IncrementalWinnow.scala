package graft.streaming

import graft.operators.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental maintenance of the winnowing fingerprint index
  * (q_text_winnow's selection, serving q_text_winnow_pairs' match step):
  * the copy-detection index a deployment keeps under continuous ingest.
  * Fingerprints are CONTENT-ONLY (the rightmost-min selection depends on
  * nothing outside the document), so the state is a pure append of
  * per-batch distinct (doc_id, fp_hash) segments — the expensive per-doc
  * linear work (tokenize → gram hash → window-min) runs ONCE per
  * document ever; the match step at serve runs over the maintained
  * skinny relation (≈ 2/(w+1) of gram volume). The df census and df-cap
  * are GLOBAL properties and therefore evaluate at serve time over the
  * whole maintained relation — a fingerprint that becomes boilerplate in
  * batch 40 correctly drops out of matches retroactively, which is
  * exactly the one-shot semantics ([[serveWinnowPairs]] ≡
  * `winnowPairsOn` by construction: same distinct fp relation, same
  * tail).
  *
  * State protocol: the IncrementalDedup log-record CAS — one
  * exclusive-create record `log/v<N>` naming the live segment set and
  * committed batch id; replays at or below the committed id land
  * nothing; a lost publish race re-CASes with the SAME segment (batch
  * derivations are batch-pure, so no rebase recompute exists here).
  * Segments auto-compact every [[AutoCompactSegs]] batches
  * ([[compactSegments]]) so the record body and the serve read stay
  * O(1) in batch count over a long-running ingest.
  */
object IncrementalWinnow {

  private val fpSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp_hash", LongType)))

  private[graft] case class WinnowState(version: Long, segs: Seq[String], batch: Option[Long])

  private val EmptyState = WinnowState(-1L, Seq.empty, None)

  private def recordBody(st: WinnowState): String =
    s"segs=${st.segs.mkString(",")};batch=${st.batch.fold("-")(_.toString)}"

  private def parseRecord(version: Long, body: String): WinnowState = {
    val kv = body.trim.split(";").map { f =>
      val i = f.indexOf('=')
      f.take(i) -> f.drop(i + 1)
    }.toMap
    WinnowState(version,
      kv.get("segs").filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Seq.empty),
      kv.get("batch").filter(_ != "-").map(_.toLong))
  }

  private def readRecord(s: SparkSession, base: String, v: Long): Option[WinnowState] =
    graft.sources.GraftFs.readSmallFile(s, s"$base/log/v$v").map(parseRecord(v, _))

  private[graft] def currentState(s: SparkSession, base: String): WinnowState = {
    val hinted = graft.sources.GraftFs.readSmallFile(s, s"$base/_CURRENT")
      .map(_.trim.drop(1).toLong).filter(v => readRecord(s, base, v).isDefined)
    val start = hinted.orElse {
      val (fs, q) = graft.sources.GraftFs.resolve(s, s"$base/log")
      if (!fs.exists(q)) None
      else fs.listStatus(q).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v")).map(_.drop(1).toLong).maxOption
    }
    start match {
      case None => EmptyState
      case Some(v0) =>
        var st = readRecord(s, base, v0).getOrElse(EmptyState)
        var next = readRecord(s, base, st.version + 1)
        while (next.isDefined) { st = next.get; next = readRecord(s, base, st.version + 1) }
        st
    }
  }

  /** The committed micro-batch id — the serve row's build-completeness
    * probe.
    */
  def committedBatch(s: SparkSession, base: String): Option[Long] =
    currentState(s, base).batch

  private def publish(s: SparkSession, base: String, st: WinnowState): Boolean = {
    val ok = graft.sources.GraftFs.writeSmallFileExclusive(
      s, s"$base/log/v${st.version}", recordBody(st))
    if (ok) graft.sources.GraftFs.writeSmallFileAtomic(s, s"$base/_CURRENT", s"v${st.version}")
    ok
  }

  /** The maintained fingerprint relation (doc_id, fp_hash) from ONE
    * committed record, GLOBALLY distinct: each segment is distinct
    * within its batch, but an at-least-once source may legitimately
    * re-emit the same document under a NEW batch id (the replay guard
    * only catches same-id redelivery) — without the cross-segment
    * distinct those duplicate rows would double the df census and
    * n_shared, silently diverging from the one-shot's global
    * `.distinct()` (r13 review finding). The relation is skinny
    * (2/(w+1) density), so the dedup costs one hash aggregate.
    */
  def readFingerprints(s: SparkSession, base: String): DataFrame = {
    val st = currentState(s, base)
    if (st.segs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], fpSchema)
    else s.read.schema(fpSchema).parquet(st.segs.map(n => s"$base/fps/$n"): _*)
      .distinct()
  }

  /** Ingest one batch of (doc_id, text) documents: extract winnow
    * fingerprints once, land them as a writer-unique segment, CAS the
    * record. A replayed batch id lands nothing.
    */
  def processBatch(s: SparkSession, batch: DataFrame, base: String,
      batchId: Option[Long] = None, k: Int = 3, w: Int = 4): Unit = {
    val st0 = currentState(s, base)
    if (batchId.exists(id => st0.batch.exists(_ >= id))) return
    val fps = TextQueries.winnowOn(batch.select("doc_id", "text"), k, w)
      .select("doc_id", "fp_hash").distinct()
    val uid = java.util.UUID.randomUUID.toString.take(8)
    val segName = s"b${st0.version + 1}-$uid"
    fps.write.mode("overwrite").parquet(s"$base/fps/$segName")
    // an exit that never published must not leave the segment orphaned
    def dropSeg(): Unit = graft.sources.GraftFs.deleteRecursively(s, s"$base/fps/$segName")
    var st = st0
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 16) {
        dropSeg()
        require(false, s"processBatch: lost the publish race $attempts times at $base")
      }
      val next = WinnowState(st.version + 1, st.segs :+ segName, batchId.orElse(st.batch))
      if (publish(s, base, next)) {
        // bound state growth: without compaction the record body and the
        // serve-time read (N tiny parquet dirs + a global distinct) grow
        // linearly with batch count over a long-running ingest
        if (next.segs.size >= AutoCompactSegs) compactFrom(s, base, next)
        return
      }
      st = currentState(s, base)
      if (batchId.exists(id => st.batch.exists(_ >= id))) { dropSeg(); return }
    }
  }

  /** Auto-compaction threshold: processBatch folds the live segments
    * whenever a publish leaves this many — steady-state serve reads a
    * handful of dirs, not one per batch ever ingested.
    */
  private val AutoCompactSegs = 16

  /** Fold every live fingerprint segment into ONE globally-distinct
    * segment and CAS-publish the swap — the IncrementalSpan/Index
    * compactSegments discipline. Content is unchanged by construction:
    * readFingerprints applies a global distinct anyway, so pre-folding
    * it into the compacted segment is the same relation (and makes the
    * at-least-once cross-segment duplicates disappear from disk, not
    * just from the serve view). Concurrent ingest is safe: a batch that
    * commits mid-compact wins the CAS and the rebase keeps its segment
    * alongside the compacted dir. Input dirs are deleted only after the
    * publish lands (a reader holding the prior record never has a
    * segment deleted out from under it before the swap is visible).
    */
  def compactSegments(s: SparkSession, base: String): Unit =
    compactFrom(s, base, currentState(s, base))

  /** The compaction body against an explicitly observed state — split
    * out so the spec can drive the lost-CAS rebase path
    * deterministically.
    */
  private[graft] def compactFrom(s: SparkSession, base: String, observed: WinnowState): Unit = {
    if (observed.segs.size <= 1) return
    val folded = observed.segs.toSet
    val uid = java.util.UUID.randomUUID.toString.take(8)
    val cName = s"c${observed.version + 1}-$uid"
    // duplicate-compactor fast path: another compaction of this same
    // observed state already swapped (and possibly deleted) the inputs
    val live = currentState(s, base)
    if (!live.segs.exists(folded.contains)) return
    try {
      s.read.schema(fpSchema).parquet(observed.segs.map(n => s"$base/fps/$n"): _*)
        .distinct()
        .write.mode("overwrite").parquet(s"$base/fps/$cName")
    } catch {
      case e: Exception =>
        graft.sources.GraftFs.deleteRecursively(s, s"$base/fps/$cName")
        if (!currentState(s, base).segs.exists(folded.contains)) return
        throw e
    }
    var st = observed
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      require(attempts <= 8, s"compactSegments: lost the publish race $attempts times at $base")
      if (!st.segs.exists(folded.contains)) {
        // the race winner was another compaction of the same observed
        // state — it owns the folded-dir cleanup; drop our duplicate
        graft.sources.GraftFs.deleteRecursively(s, s"$base/fps/$cName")
        return
      }
      // keep every segment committed since the observed state (an
      // interleaved append loses nothing); swap only the folded inputs
      val next = WinnowState(st.version + 1,
        (cName +: st.segs.filterNot(folded.contains)).distinct, st.batch)
      if (publish(s, base, next)) committed = true
      else st = currentState(s, base)
    }
    folded.foreach(n => graft.sources.GraftFs.deleteRecursively(s, s"$base/fps/$n"))
  }

  /** The MOSS match step served from the maintained fingerprint relation
    * — ≡ q_text_winnow_pairs one-shot by construction (the fp relation
    * is content-only and distinct per doc, and the df census / df-cap /
    * pair join run the registered tail verbatim over it).
    */
  def serveWinnowPairs(s: SparkSession, base: String,
      dfCap: Int = 16, minShared: Int = 2): DataFrame =
    TextQueries.winnowPairsFromFps(readFingerprints(s, base), dfCap, minShared)

  /** Attach to a documents stream via foreachBatch (replay-protected). */
  def attach(docs: DataFrame, base: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, bid: Long) =>
      processBatch(batch.sparkSession, batch, base, Some(bid))
    }
}
