package graft

import graft.operators.{SearchQueries, ServeQueries, TextQueries}
import org.scalatest.matchers.should.Matchers

/** The registered state-served rows must equal their one-shot twins ROW
  * FOR ROW — the claim their shared oracles encode. This pins the
  * QueryDef plumbing itself (the deterministic two-batch state build +
  * serve), on top of the library-level equivalences
  * IncrementalIndexSpec/IncrementalSpanSpec already prove.
  */
class ServeQueriesSpec extends SparkTestBase with Matchers {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).toSeq

  test("q_serve_hybrid_state ≡ q_text_hybrid row for row") {
    val served = rows(ServeQueries.serveHybridState.query(spark, sfTiny))
    served should not be empty
    served shouldBe rows(SearchQueries.textHybrid.query(spark, sfTiny))
  }

  test("q_serve_spansource_state ≡ q_text_span_source row for row") {
    val served = rows(ServeQueries.serveSpanSourceState.query(spark, sfTiny))
    served should not be empty
    served shouldBe rows(TextQueries.textSpanSource.query(spark, sfTiny))
    // the build is idempotent: a second QueryDef call serves the same
    // committed state (replay-protected), not a double-landed one
    rows(ServeQueries.serveSpanSourceState.query(spark, sfTiny)) shouldBe served
  }

  test("q_serve_novelty_state ≡ q_text_novelty row for row") {
    val served = rows(ServeQueries.serveNoveltyState.query(spark, sfTiny))
    served should not be empty
    served shouldBe rows(
      graft.operators.CurationQueries.textNovelty.query(spark, sfTiny))
  }
}
