package graft

import graft.operators.EventQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** q_events_nextstep pinned against a driver-side brute-force recount
  * (the R10OpsSpec discipline): session supports, pair supports, and the
  * conditional next-step probabilities must all equal an independent
  * in-memory recomputation from the raw occurrences, and the emitted
  * distribution must be well-formed (p ∈ (0, 1], support ≤ pair support,
  * next symbol never inside its own condition pattern).
  */
class NextstepSpec extends SparkTestBase with Matchers {

  private def sym(eventId: Long): String = {
    val v = eventId % 64
    if (v >= 33) "e5" else if (v >= 17) "e4" else if (v >= 9) "e3"
    else if (v >= 5) "e2" else if (v >= 3) "e1" else "e0"
  }

  test("supports and probabilities equal a driver-side recount on the seqmine grain") {
    val rows = EventQueries.eventsNextstep.query(spark, sfTiny).collect()
    rows should not be empty

    val occ = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2) / 604800000000L), sym(r.getLong(1)), r.getLong(2)))
    val sessions = occ.groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    // per-session first/last per symbol — the alphabet-bounded grain
    val grain = sessions.view.mapValues(
      _.groupBy(_._1).view.mapValues(ts => (ts.map(_._2).min, ts.map(_._2).max)).toMap).toMap
    val minsup = math.max(sessions.size / 20, 2)
    def pairSup(sa: String, sb: String): Int = grain.values.count { m =>
      m.contains(sa) && m.contains(sb) && m(sa)._1 < m(sb)._2
    }
    def tripleSup(sa: String, sb: String, sc: String): Int = sessions.count { case (k, evs) =>
      val m = grain(k)
      m.contains(sa) && m.contains(sc) && m(sa)._1 < m(sc)._2 &&
        evs.exists { case (s, t) => s == sb && t > m(sa)._1 && t < m(sc)._2 }
    }

    val alphabet = occ.map(_._2).distinct
    rows.foreach { r =>
      val Array(sa, sb) = r.getString(0).split(">")
      val sc = r.getString(1)
      sc should not be sa
      sc should not be sb
      alphabet should contain(sc)
      val ps = pairSup(sa, sb)
      ps should be >= minsup // only frequent patterns condition
      r.getLong(3) shouldBe ps.toLong
      r.getLong(2) shouldBe tripleSup(sa, sb, sc).toLong
      r.getLong(2) should be <= r.getLong(3)
      val p = r.getDouble(4)
      p should (be > 0.0 and be <= 1.0)
      p shouldBe math.round(r.getLong(2).toDouble / r.getLong(3) * 1e6) / 1e6
    }
    // completeness: every (frequent pair, other symbol) with support >= 1 is present
    val emitted = rows.map(r => (r.getString(0), r.getString(1))).toSet
    for {
      sa <- alphabet; sb <- alphabet if sa != sb && pairSup(sa, sb) >= minsup
      sc <- alphabet if sc != sa && sc != sb && tripleSup(sa, sb, sc) >= 1
    } emitted should contain((s"$sa>$sb", sc))
  }
}
