package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q_events_attribution (last-touch attribution) via
  * transformWithState — the carried-forward "most recent click" of the
  * batch window (`last(... ignoreNulls) ROWS UNBOUNDED PRECEDING .. -1`)
  * is EXACTLY a per-user ValueState: one (click_id, click_ts) pair,
  * updated as clicks stream in, read by each purchase before any
  * same-batch update at the same row position.
  *
  * Scale design: state per user is a single 16-byte pair regardless of
  * history length — O(users) total, RocksDB-backed past memory. Each
  * purchase is emitted exactly once, in the micro-batch it arrives in,
  * so the union of emissions over any batching of a time-ordered feed
  * equals the one-shot batch run (StreamingSpec pins this on a 3-way
  * time-split stream; the batch-mode twin is oracle-checked against the
  * same DuckDB SQL as q_events_attribution).
  *
  * Integer-only arithmetic (microsecond gaps) — no float parity caveats.
  */
object EventState {

  /** (user_id, ts_us, event_id, event_type) keyed by user_id. */
  private type Ev = (Long, Long, Long, String)

  private val HorizonUs = 86400000000L // 24h, same as the batch operator

  private class LastTouchProcessor
      extends StatefulProcessor[Long, Ev, (Long, Long, Option[Long], Option[Long])] {
    @transient private var lastClick: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastClick = getHandle.getValueState[(Long, Long)]("last_click",
        Encoders.product[(Long, Long)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long, Option[Long], Option[Long])] = {
      // same total order as the batch window: (ts_us, event_id)
      val sorted = rows.toArray.sortBy(r => (r._2, r._3))
      var st: Option[(Long, Long)] = if (lastClick.exists()) Some(lastClick.get()) else None
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Option[Long], Option[Long])]
      for (r <- sorted) {
        if (r._4 == "purchase") {
          val hit = st.filter { case (_, clickTs) => r._2 - clickTs <= HorizonUs }
          out += ((r._3, key, hit.map(_._1), hit.map(c => r._2 - c._2)))
        }
        if (r._4 == "click") st = Some((r._3, r._2))
      }
      st.foreach(lastClick.update)
      out.iterator
    }
  }

  def attributionTws(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_._1)
      .transformWithState(new LastTouchProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("event_id", "user_id", "attributed_click", "gap_us")
  }
}
