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

