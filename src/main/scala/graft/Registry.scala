package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness query: a DataFrame builder over an sf directory plus, when
  * SQL-expressible, the equivalent DuckDB oracle SQL (same column names and
  * ordering — the driver hash-compares values after sorting columns by
  * name). Queries without an oracle get the driver's weaker rows-only check.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered queries, in registration order. Modules contribute
    * their own defs; SparkEntry flattens this into the driver contract. */
  def all: Seq[(String, QueryDef)] =
    queries.RefQueries.defs ++
      queries.ExtQueries.defs ++
      queries.MoreQueries.defs
}
