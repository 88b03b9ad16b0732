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

  test("q_fn_xml: xpath (on its 1/16 slice) and from_xml agree; malformed doc yields null fields") {
    // since r15 the xpath trio prices a deterministic event_id % 16 = 0
    // slice (from_xml stays full grain) — assert agreement ON the slice
    // and null OFF it, over enough rows to include both kinds
    val rows = FunctionQueries.fnXml.query(spark, sfTiny).limit(64).collect()
    rows should have size 64
    val (on, off) = rows.partition(_.getLong(0) % 16 == 0)
    on should not be empty
    off should not be empty
    on.foreach { r =>
      r.getString(1) shouldBe r.getString(3) // xpath_string == struct field
      r.getLong(2) shouldBe r.getLong(4)     // xpath_long == struct field
    }
    off.foreach { r =>
      r.isNullAt(1) shouldBe true
      r.isNullAt(2) shouldBe true
    }
    rows.foreach { r =>
      r.getBoolean(5) shouldBe true          // broken doc parsed to null field
      Set("click", "view", "signup", "purchase", "error") should contain(r.getString(3))
    }
  }

  test("q_fn_variant: typed extraction matches the JSON text; compact round-trip") {
    val rows = FunctionQueries.fnVariant.query(spark, sfTiny).limit(20).collect()
    rows should have size 20
    rows.foreach { r =>
      r.getBoolean(2) shouldBe true // try_parse_json('{nope') is NULL
      r.getString(3) shouldBe s"""{"k":${r.getInt(1)}}""" // compact serialization
    }
  }
}
