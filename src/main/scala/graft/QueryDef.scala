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

  /** Count-visible evaluation gate (r13 verdict item 3): an always-true
    * filter over the named columns, placed after the final projection.
    * Under the bench's `.count()` pricing, Catalyst prunes every column
    * the count doesn't need — a row whose entire work is output-only
    * (xpath extraction, try_cast probes, a sketch UDAF) prices as a bare
    * scan, up to 190× below what a user materializing the result pays.
    * Routing the expensive columns through a filter predicate makes
    * their evaluation load-bearing for the count while changing neither
    * the row set nor the schema (pmod(hash, 1) = 0 for every input,
    * including nulls — xxhash64 is non-nullable — and no optimizer rule
    * folds a non-literal pmod). Costs one hash per row on the
    * materializing path; semantically the identity, so oracle SQL is
    * unchanged.
    */
  def countGate(df: DataFrame, cols: String*): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    df.filter(pmod(xxhash64(cols.map(col): _*), lit(1L)) === 0L)
  }
}

