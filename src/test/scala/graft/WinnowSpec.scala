package graft

import graft.operators.TextQueries
import org.apache.spark.sql.functions.{col, size => asize}
import org.scalatest.matchers.should.Matchers

/** Winnowing (q_text_winnow). The DuckDB oracle owns value equality; this
  * pins the algorithm's three published properties (Schleimer et al.
  * 2003): full window coverage, the 2/(w+1) expected density, and the
  * detection-threshold guarantee — a shared run of ≥ w+k−1 tokens always
  * yields a common fingerprint.
  */
class WinnowSpec extends SparkTestBase with Matchers {

  private val (k, w) = (3, 4)

  test("every w-gram window of every doc contains a selected fingerprint") {
    val sel = TextQueries.winnowOn(
        Tables.documents(spark, sfTiny).select("doc_id", "text"), k, w)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), asize(graft.functions.Tokenize.tokens(col("text"))).as("nt"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    var (nGrams, nSel) = (0L, 0L)
    docs.foreach { case (id, nt) =>
      val ng = nt - k + 1
      if (nt >= k + w - 1) {
        nGrams += ng
        val pos = sel.collect { case (d, p) if d == id => p }
        nSel += pos.size
        (0 to ng - w).foreach { wi =>
          assert(pos.exists(p => p >= wi && p <= wi + w - 1),
            s"doc $id window $wi has no fingerprint")
        }
      }
    }
    // expected density 2/(w+1) = 0.4; real text has ties/structure
    val density = nSel.toDouble / nGrams
    assert(density > 0.25 && density < 0.6, s"density $density off 2/(w+1)")
    info(s"density $density over $nGrams grams")
  }

  test("a shared run of w+k-1 tokens always yields a common fingerprint") {
    import spark.implicits._
    // doc 1 embeds tokens 40..45 of doc 0 (= w+k-1 = 6 tokens) in
    // otherwise-disjoint vocabulary; doc 2 shares nothing with doc 0
    val a = (0 until 80).map(i => s"a$i")
    val b = (0 until 40).map(i => s"b$i") ++ a.slice(40, 46) ++ (40 until 80).map(i => s"b$i")
    val c = (0 until 80).map(i => s"c$i")
    val docs = Seq((0L, a.mkString(" ")), (1L, b.mkString(" ")), (2L, c.mkString(" ")))
      .toDF("doc_id", "text")
    val fp = TextQueries.winnowOn(docs, k, w).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
    assert((fp(0L) intersect fp(1L)).nonEmpty,
      "shared 6-token run produced no common fingerprint")
    assert((fp(0L) intersect fp(2L)).isEmpty,
      "disjoint docs share a fingerprint (hash collision or selection bug)")
  }

  test("match step: copied passage detected, boilerplate df-capped away") {
    import spark.implicits._
    // docs 0 and 1 share a 30-token passage (a strong match); docs 10..29
    // ALL share one 10-token boilerplate run — its fingerprints exceed
    // dfCap=16 docs and must produce NO pairs among them
    val passage = (0 until 30).map(i => s"p$i")
    val boiler = (0 until 10).map(i => s"bp$i")
    val docs = (
      Seq(
        (0L, ((0 until 30).map(i => s"a$i") ++ passage).mkString(" ")),
        (1L, (passage ++ (0 until 30).map(i => s"b$i")).mkString(" "))) ++
      (10 until 30).map(d =>
        (d.toLong, (boiler ++ (0 until 20).map(i => s"u${d}_$i")).mkString(" ")))
    ).toDF("doc_id", "text")
    val pairs = TextQueries.winnowPairsOn(docs, k, w).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // the copied passage must surface with many shared fingerprints
    val (nShared, overlap) = pairs.getOrElse((0L, 1L),
      fail("copied 30-token passage produced no match pair"))
    assert(nShared >= 5, s"only $nShared shared fingerprints for a 30-token copy")
    assert(overlap > 0.2 && overlap <= 1.0, s"overlap $overlap implausible")
    // the 20-doc boilerplate run is df-capped: no pair among docs 10..29
    val boilerPairs = pairs.keys.filter { case (a, b) => a >= 10L && b >= 10L }
    assert(boilerPairs.isEmpty, s"df-cap failed: boilerplate pairs $boilerPairs")
  }

  test("winnow-gated span attribution: window mass exact, sub-window matches 0, window-less docs null") {
    import spark.implicits._
    val passage = (0 until 30).map(i => s"p$i")
    val run12 = (0 until 12).map(i => s"r$i")
    val docs = Seq(
      // docs 0/1: 30-token copied passage → 11 shared 20-token windows
      (0L, ((0 until 10).map(i => s"a$i") ++ passage).mkString(" "), "srcA"),
      (1L, (passage ++ (0 until 40).map(i => s"b$i")).mkString(" "), "srcB"),
      // docs 2/3: 12-token shared run (winnow-detectable, sub-window) in
      // otherwise-unique ≥20-token docs → matched, 0 shared windows
      (2L, (run12 ++ (0 until 20).map(i => s"c$i")).mkString(" "), "srcA"),
      (3L, ((0 until 20).map(i => s"d$i") ++ run12).mkString(" "), "srcB"),
      // docs 4/5: 12-token shared run in 16-token docs — no complete
      // window on either side → matched, fraction NULL
      (4L, (run12 ++ (0 until 4).map(i => s"e$i")).mkString(" "), "srcA"),
      (5L, ((0 until 4).map(i => s"f$i") ++ run12).mkString(" "), "srcB"),
      // docs 6/7: ONE-SIDED window-less pair (doc 6 has 16 tokens — no
      // window; doc 7 has 32 — windows) → matched, fraction still NULL:
      // least() skips nulls in both engines, so the gate must be explicit
      (6L, (run12 ++ (0 until 4).map(i => s"g$i")).mkString(" "), "srcA"),
      (7L, ((0 until 20).map(i => s"h$i") ++ run12).mkString(" "), "srcB"),
    ).toDF("doc_id", "text", "source")
    val rows = TextQueries.winnowSpansOn(docs, k, w).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getString(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    val (s1, s2, _, sw01, frac01) = rows.getOrElse((0L, 1L),
      fail("copied-passage pair missing from winnow-span attribution"))
    (s1, s2) shouldBe ("srcA", "srcB") // cross-source attribution carried
    sw01 shouldBe 11L // 30-token run → 30-20+1 identical window strings
    // doc0: 40 tokens → 21 windows (the smaller side)
    frac01 shouldBe Some(math.rint(11.0 / 21.0 * 1e6) / 1e6)
    val (_, _, _, sw23, frac23) = rows.getOrElse((2L, 3L),
      fail("sub-window match pair missing"))
    sw23 shouldBe 0L     // a 12-token run certifies fingerprints, not a window
    frac23 shouldBe Some(0.0)
    val (_, _, _, sw45, frac45) = rows.getOrElse((4L, 5L),
      fail("window-less match pair missing"))
    sw45 shouldBe 0L
    frac45 shouldBe None // neither side has a complete window: no denominator
    val (_, _, _, sw67, frac67) = rows.getOrElse((6L, 7L),
      fail("one-sided window-less match pair missing"))
    sw67 shouldBe 0L
    frac67 shouldBe None // the SMALLER doc has no window: still no denominator
  }

  test("persisted winnow pairs == fresh derivation, row for row (the r16 spans amortization)") {
    def strs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val fresh = strs(TextQueries.winnowPairsOn(
      Tables.documents(spark, sfTiny).select("doc_id", "text")))
    val persisted = strs(TextQueries.winnowPairsPersisted(spark, sfTiny))
    persisted shouldBe fresh
    // and the registered spans row (which reads the persisted relation)
    // equals the all-inline derivation
    val inline = strs(TextQueries.winnowSpansOn(Tables.documents(spark, sfTiny)))
    val registered = strs(TextQueries.textWinnowSpans.query(spark, sfTiny))
    registered shouldBe inline
  }
}
