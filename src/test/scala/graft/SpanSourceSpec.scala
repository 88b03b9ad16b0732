package graft

import graft.operators.TextQueries
import org.scalatest.matchers.should.Matchers

/** q_text_span_source on a crafted corpus with KNOWN copy directions:
  * the attribution must name the true earliest holder, count the exact
  * shared-window mass, and leave originals unattributed.
  */
class SpanSourceSpec extends SparkTestBase with Matchers {

  // w0..w39: distinct tokens so windows collide only where text is
  // genuinely shared
  private def run(): Map[Long, (Long, Long, Option[Double], Option[Long], Long)] = {
    import spark.implicits._
    val a = (0 until 30).map(i => s"w$i").mkString(" ") // original, 30 toks
    // B copies A's tokens 5..29 (25 toks -> 6 shared windows) + own tail
    val b = ((5 until 30).map(i => s"w$i") ++ (0 until 10).map(i => s"b$i")).mkString(" ")
    // C copies a 20-token run present in BOTH A and B (tokens 8..27):
    // canonical source must be A (min doc_id), not B
    val c = ((8 until 28).map(i => s"w$i") ++ (0 until 15).map(i => s"c$i")).mkString(" ")
    // D shares nothing
    val d = (0 until 25).map(i => s"d$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    TextQueries.spanSourceOn(docs).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
    }.toMap
  }

  test("attribution names the earliest holder with exact shared-window mass") {
    val got = run()
    // A: 11 windows (30 toks), the original — nothing copied
    got(1L) shouldBe ((11L, 0L, Some(0.0), None, 0L))
    // B: 16 windows (35 toks); windows fully inside A's tokens 5..29 are
    // positions 0..5 -> 6 copied windows, top source A
    got(2L) shouldBe ((16L, 6L, Some(0.375), Some(1L), 6L))
    // C: 16 windows (35 toks); only window 0 (tokens 8..27) is shared —
    // held by A (5..29 region) AND B, canonical = min holder = A
    got(3L) shouldBe ((16L, 1L, Some(0.0625), Some(1L), 1L))
    // D: 6 windows (25 toks), untouched
    got(4L) shouldBe ((6L, 0L, Some(0.0), None, 0L))
  }

  test("intra-document repetition is not cross-attributed") {
    import spark.implicits._
    // one doc repeating its own 20-token block twice: windows duplicate
    // WITHIN the doc, min holder == the doc itself -> zero copied mass
    val block = (0 until 20).map(i => s"r$i").mkString(" ")
    val docs = Seq((7L, s"$block $block")).toDF("doc_id", "text")
    val r = TextQueries.spanSourceOn(docs).collect().head
    r.getLong(1) shouldBe 21L // 40 toks -> 21 windows
    r.getLong(2) shouldBe 0L
    r.isNullAt(4) shouldBe true
  }
}
