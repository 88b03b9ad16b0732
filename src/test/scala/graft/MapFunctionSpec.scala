package graft

import graft.operators.FunctionQueries
import org.scalatest.matchers.should.Matchers

/** Golden test for the map-function family (q_fn_map is also DuckDB-oracled
  * via the sorted-entries scalarization; this spec pins the shape locally).
  */
class MapFunctionSpec extends SparkTestBase with Matchers {

  test("q_fn_map: str_to_map round-trips keys/values deterministically") {
    val rows = FunctionQueries.fnMap.query(spark, sfTiny).limit(5).collect()
    rows should have size 5
    rows.foreach { r =>
      // canonical sorted entries string of "k=<n>,type=<t>"
      r.getString(1) should fullyMatch regex "k:\\d{1,2},type:(click|view|signup|purchase|error)"
      Set("click", "view", "signup", "purchase", "error") should contain(r.getString(2))
      r.getInt(3) shouldBe 2
    }
    // deterministic across runs
    val again = FunctionQueries.fnMap.query(spark, sfTiny).limit(5).collect()
    rows.toSeq shouldBe again.toSeq
  }
}
