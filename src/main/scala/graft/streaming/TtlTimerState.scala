package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** PROCESSING-TIME timers — the other half of the transformWithState
  * timer API from [[SessionTimerState]]'s event-time timers, covering the
  * two jobs every perpetual 100 TB stream eventually needs:
  *
  *   1. **TTL sweep (state GC).** A keyed aggregation whose key space
  *      grows forever (users, sessions, devices) leaks state unless
  *      abandoned keys are expired. `aggWithTtl` keeps one running
  *      (n_events, sum_value) per user and arms a processing-time timer
  *      at last-activity + ttl; when the key goes quiet for a full TTL of
  *      WALL time — regardless of event-time progress, which a stalled
  *      or low-volume source may never advance — the timer emits the
  *      key's final aggregate exactly once and clears the state. The
  *      emission is the downstream close signal; the clear is the GC.
  *      A key seen again later simply starts a fresh aggregate.
  *
  *   2. **Timer-driven shard flush.** The incremental shard manifest
  *      ([[IncrementalShards]]) merges partials every micro-batch; the
  *      timer formulation instead holds each shard's partial in state
  *      and flushes it only when the shard has been quiet for `flushMs`
  *      of processing time — i.e. when, under the doc_id-ordered feed
  *      contract, the byte range is complete. A shard spanning several
  *      micro-batches merges its partials in state (sum/min/max are
  *      associative) and still flushes ONCE, with the merged totals.
  *
  * Mechanics shared by both: at most one live timer per key (previous
  * timer deleted on re-arm), O(1) state per key, RocksDB-backed;
  * `handleExpiredTimer` emits + clears, so state size is bounded by the
  * ACTIVE key count, not the ever-seen key count. StreamingSpec drives
  * both through checkpoint-restart phases with real wall-clock gaps and
  * pins: every key emitted exactly once per quiet period, totals equal
  * the batch aggregate, and a re-appearing key restarts from zero
  * (proving the expired state was actually cleared).
  *
  * TimeMode.ProcessingTime() vs EventTime(): processing-time timers fire
  * when the micro-batch's wall clock passes the deadline — no watermark
  * involvement — which is exactly right for GC/flush policies that must
  * not depend on the source ever producing another event.
  */
object TtlTimerState {

  /** (user_id, ts_us, value) keyed by user_id. */
  private type Ev = (Long, Long, Double)

  /** Output: (user_id, n_events, sum_value, first_us, last_us). */
  private type Agg = (Long, Long, Double, Long, Long)

  private class TtlSweepProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, Ev, Agg] {
    @transient private var agg: ValueState[(Long, Double, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[(Long, Double, Long, Long)]("agg",
        Encoders.product[(Long, Double, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Agg] = {
      var (n, sum, first, last) =
        if (agg.exists()) agg.get() else (0L, 0.0, Long.MaxValue, Long.MinValue)
      rows.foreach { case (_, ts, v) =>
        n += 1; sum += v
        first = math.min(first, ts); last = math.max(last, ts)
      }
      agg.update((n, sum, first, last))
      // one live timer per key, re-armed on every activity: the key is
      // "abandoned" only after a full quiet TTL of wall time
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + ttlMs)
      Iterator.empty // nothing emits until the key goes quiet
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Agg] =
      if (agg.exists()) {
        val (n, sum, first, last) = agg.get()
        agg.clear() // the GC half: expired key leaves NO state behind
        Iterator((key, n, sum, first, last))
      } else Iterator.empty
  }

  /** Per-user running aggregate with a processing-time TTL sweep: emits
    * (user_id, n_events, sum_value, first_us, last_us) once per quiet
    * period and clears the key's state. Streaming callers pick `ttlMs`
    * as the staleness horizon their pipeline GC wants.
    */
  def aggWithTtl(events: DataFrame, ttlMs: Long): DataFrame = {
    import events.sparkSession.implicits._
    events.select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"), col("value"))
      .as[Ev]
      .groupByKey(_._1)
      .transformWithState(new TtlSweepProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("user_id", "n_events", "sum_value", "first_us", "last_us")
  }

  /** (shard_id, doc_id, n_bytes, n_tokens) keyed by shard_id — the feed
    * carries its shard assignment (the offset-annotated doc_id-ordered
    * ingest contract documented at [[IncrementalShards.processBatch]]).
    */
  private type Doc = (Long, Long, Long, Long)

  /** Output manifest row: (shard_id, n_docs, n_bytes, n_tokens,
    * first_doc, last_doc).
    */
  private type Manifest = (Long, Long, Long, Long, Long, Long)

  private class ShardFlushProcessor(flushMs: Long)
      extends StatefulProcessor[Long, Doc, Manifest] {
    @transient private var part: ValueState[(Long, Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      part = getHandle.getValueState[(Long, Long, Long, Long, Long)]("part",
        Encoders.product[(Long, Long, Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Manifest] = {
      var (nd, nb, nt, fd, ld) =
        if (part.exists()) part.get() else (0L, 0L, 0L, Long.MaxValue, Long.MinValue)
      rows.foreach { case (_, docId, bytes, tokens) =>
        nd += 1; nb += bytes; nt += tokens
        fd = math.min(fd, docId); ld = math.max(ld, docId)
      }
      part.update((nd, nb, nt, fd, ld))
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + flushMs)
      Iterator.empty // the manifest row flushes only when the shard is complete
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Manifest] =
      if (part.exists()) {
        val (nd, nb, nt, fd, ld) = part.get()
        part.clear()
        Iterator((key, nd, nb, nt, fd, ld))
      } else Iterator.empty
  }

  /** Shard manifest flushed by quiet-period timers instead of per-batch
    * merges: one (shard_id, n_docs, n_bytes, n_tokens, first_doc,
    * last_doc) row per shard, emitted once the shard has seen no docs for
    * `flushMs` of processing time. Input must carry shard_id (offset-
    * annotated feed).
    */
  def shardFlushByTimer(docs: DataFrame, flushMs: Long): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("shard_id"), col("doc_id"),
        col("n_bytes").cast("long"), col("n_tokens").cast("long"))
      .as[Doc]
      .groupByKey(_._1)
      .transformWithState(new ShardFlushProcessor(flushMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
      .toDF("shard_id", "n_docs", "n_bytes", "n_tokens", "first_doc", "last_doc")
  }
}
