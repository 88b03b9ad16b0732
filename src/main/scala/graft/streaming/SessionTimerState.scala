package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timeout-emitted sessionization via transformWithState EVENT-TIME
  * TIMERS — the capability the gap-detection formulations can't express:
  * a session is emitted when the user goes QUIET (watermark passes
  * last-event + gap), not when their next event happens to arrive. The
  * event-driven twin (q_events_sessionize) only closes a session on the
  * next event, so a user's final session dangles forever in a true
  * stream; the timer closes it the moment the watermark proves no
  * in-gap event can still arrive.
  *
  * Mechanics: per user one (start, last, n) ValueState plus ONE armed
  * timer at last + gap. In-batch events fold in event-time order
  * (closing any gap-crossed sessions inline, exactly the batch
  * formulation's strict `> gap` rule); the processor then re-arms the
  * timer to the new last + gap (previous timer deleted — at most one
  * live timer per user, O(users) timer state). handleExpiredTimer emits
  * the open session and clears state; a later event simply starts a new
  * session.
  *
  * Scale: state is 24 bytes + one timer per ACTIVE user, RocksDB-backed;
  * emission cost is one row per closed session. Batch mode runs input as
  * one batch and fires every timer at the final watermark (+∞), so the
  * batch run emits exactly the full session set — that is the oracle
  * (shared with q_events_sessionize's session grouping); StreamingSpec
  * drives the real multi-batch stream with an advancing watermark.
  */
object SessionTimerState {

  private val GapUs = 1800000000L // 30 min, same as q_events_sessionize

  /** (user_id, ts_us) keyed by user_id; output (user_id, start_us,
    * end_us, n_events).
    */
  private type Ev = (Long, Long)

  private class SessionTimerProcessor
      extends StatefulProcessor[Long, Ev, (Long, Long, Long, Long)] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("session",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val sorted = rows.map(_._2).toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var st: Option[(Long, Long, Long)] = if (sess.exists()) Some(sess.get()) else None
      for (ts <- sorted) st match {
        case Some((s0, last, n)) if ts - last > GapUs =>
          out += ((key, s0, last, n)) // gap crossed inside the feed
          st = Some((ts, ts, 1L))
        case Some((s0, last, n)) =>
          st = Some((s0, math.max(last, ts), n + 1))
        case None =>
          st = Some((ts, ts, 1L))
      }
      st.foreach { s =>
        sess.update(s)
        // one live timer per user: re-arm to the new quiet deadline.
        // Registered at ms precision from µs event times: round the last-
        // event ms UP and add 1 ms so the timer can never fire before the
        // full gap has provably elapsed — truncation would put the
        // deadline up to ~1 ms early, and an event at exactly last+GapUs
        // (in-session under the strict > gap rule) could race an
        // already-fired timer and split the session vs the batch oracle.
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer((s._2 + 999) / 1000 + GapUs / 1000 + 1)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
      if (sess.exists()) {
        val (s0, last, n) = sess.get()
        sess.clear()
        Iterator((key, s0, last, n))
      } else Iterator.empty
    }
  }

  /** Sessions from a (possibly streaming) events frame; event-time mode —
    * streaming callers must set a watermark on `ts` upstream.
    */
  def sessionsByTimer(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      .as[Ev]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor, TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "start_us", "end_us", "n_events")
  }
}
