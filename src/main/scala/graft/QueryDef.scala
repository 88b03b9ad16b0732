package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator: a Spark query over the fixture dir plus, where the
  * semantics are ANSI-SQL-expressible, a DuckDB twin for the driver's
  * hash-compare oracle (SURVEY.md §2.B / §5.2).
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object QueryDef {
  /** Determinism helpers shared by oracle-checked queries (SURVEY.md §7.5):
    * money/measure doubles are cast to exact DECIMAL before aggregation, and
    * aggregate results are narrowed to a small scale before the final cast
    * to DOUBLE, so both engines convert the *same exact decimal* with a
    * correctly-rounded (sub-2^53 unscaled) conversion → bit-identical
    * doubles on both sides.
    */
  val Dec = "DECIMAL(18,4)"
}
