package graft

import graft.operators.FunctionQueries
import org.scalatest.matchers.should.Matchers

/** Golden test for the map-function family (q_fn_map has no DuckDB oracle —
  * map literal/ordering parity is fragile across engines; SURVEY.md §2.B).
  */
class MapFunctionSpec extends SparkTestBase with Matchers {

  test("q_fn_map: str_to_map round-trips keys/values deterministically") {
    val rows = FunctionQueries.fnMap.query(spark, sfTiny).limit(5).collect()
    rows should have size 5
    rows.foreach { r =>
      r.getString(1) shouldBe "k" // first key of "k=<n>,type=<t>"
      r.getString(2).toInt should (be >= 0 and be <= 99)
      Set("click", "view", "signup", "purchase", "error") should contain(r.getString(3))
      r.getInt(4) shouldBe 2
    }
    // deterministic across runs
    val again = FunctionQueries.fnMap.query(spark, sfTiny).limit(5).collect()
    rows.toSeq shouldBe again.toSeq
  }
}
