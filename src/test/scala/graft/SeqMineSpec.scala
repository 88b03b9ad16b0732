package graft

import graft.operators.EventQueries
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** q_events_seqmine (GSP-style subsequence mining): brute-force
  * equivalence on crafted sessions (incl. the strict-order tie case and
  * the apriori-losslessness of the triple candidate generation at
  * minsup=1), and the skew guard — a 50k-event MEGA-SESSION contributes
  * exactly one support per pattern and cannot blow the pair stage up,
  * because supports are computed on the (session, symbol) first/last
  * grain (alphabet-bounded), never on event pairs (50k² would not
  * finish).
  */
class SeqMineSpec extends SparkTestBase with Matchers {

  private val sessions: Map[(Long, Long), Seq[(String, Long)]] = Map(
    (1L, 0L) -> Seq("a" -> 1L, "b" -> 2L, "c" -> 3L),
    (2L, 0L) -> Seq("a" -> 1L, "c" -> 2L, "b" -> 3L, "c" -> 4L),
    (3L, 0L) -> Seq("b" -> 1L, "a" -> 2L, "c" -> 3L),
    (4L, 0L) -> Seq("a" -> 5L, "b" -> 5L), // same-ts tie: strict < ⇒ NOT a>b
    (5L, 1L) -> Seq("a" -> 1L, "b" -> 9L, "a" -> 10L))

  private def brute2(seqs: Iterable[Seq[(String, Long)]], a: String, b: String): Long =
    seqs.count(es => es.exists { case (s1, t1) =>
      s1 == a && es.exists { case (s2, t2) => s2 == b && t1 < t2 } }).toLong

  private def brute3(seqs: Iterable[Seq[(String, Long)]],
      a: String, b: String, c: String): Long =
    seqs.count(es => es.exists { case (s1, t1) => s1 == a &&
      es.exists { case (s2, t2) => s2 == b && t1 < t2 &&
        es.exists { case (s3, t3) => s3 == c && t2 < t3 } } }).toLong

  test("seqmine == brute-force subsequence supports (minsup=1, apriori lossless)") {
    import spark.implicits._
    val occ = sessions.toSeq.flatMap { case ((u, d), es) =>
      es.map { case (sym, t) => (u, d, sym, t) } }
      .toDF("user_id", "day", "sym", "ts_us")
    val got = EventQueries.seqmineOn(occ, minSupFloor = 1, supDivisor = 1000000)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val syms = Seq("a", "b", "c")
    val want2 = for (a <- syms; b <- syms if a != b;
        s = brute2(sessions.values, a, b) if s >= 1)
      yield (s"$a>$b", 2, s)
    val want3 = for (a <- syms; b <- syms; c <- syms
        if a != b && b != c && a != c;
        s = brute3(sessions.values, a, b, c) if s >= 1)
      yield (s"$a>$b>$c", 3, s)
    got shouldBe (want2 ++ want3).toSet
    // the tie case specifically: session 4 must not have contributed a>b
    got.find(_._1 == "a>b").get._3 shouldBe brute2(sessions.values, "a", "b")
  }

  test("skew guard: a 50k-event mega-session contributes ONE support per pattern") {
    import spark.implicits._
    // mega-session: one (user, day) with 50,000 events over the alphabet;
    // an occurrence-pair formulation would form 2.5e9 pairs and not finish
    val mega = (0 until 50000).map(i => (9L, 9L, s"s${i % 4}", i.toLong))
    val small = Seq(
      (1L, 0L, "s0", 1L), (1L, 0L, "s1", 2L),
      (2L, 0L, "s1", 1L), (2L, 0L, "s0", 2L))
    val occ = (mega ++ small).toDF("user_id", "day", "sym", "ts_us")
    val got = EventQueries.seqmineOn(occ, minSupFloor = 1, supDivisor = 1000000)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // mega contributes exactly 1 per pattern (session-grain counting):
    // s0>s1 = mega + session 1 = 2; s1>s0 = mega + session 2 = 2
    got.find(_._1 == "s0>s1").get._3 shouldBe 2L
    got.find(_._1 == "s1>s0").get._3 shouldBe 2L
    // every triple over the mega alphabet is supported once (mega only)
    got.filter(_._2 == 3).foreach(_._3 shouldBe 1L)
    got.count(_._2 == 3) shouldBe 4 * 3 * 2 // pairwise-distinct triples over 4 syms
  }

  test("registered query is non-degenerate at sf0.001: skewed alphabet separates supports") {
    val rows = EventQueries.eventsSeqmine.query(spark, sfTiny).collect()
    rows should not be empty
    val pairSup = rows.filter(_.getInt(1) == 2).map(_.getLong(2))
    // the synthesized geometric alphabet must produce a SPREAD of supports
    // (the uniform fixture alphabet was degenerate: all equal)
    pairSup.distinct.length should be > 3
    // and 3-patterns survive minsup
    rows.count(_.getInt(1) == 3) should be > 0
  }
}
