package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time data-quality expectations — the CHECK-constraint /
  * Delta-Live-Tables "expect" layer for [[AtomicTable]] writes. An
  * expectation is a named boolean Column; ANSI CHECK tri-state applies
  * (a row violates only when the expression is definitely FALSE —
  * UNKNOWN/null passes, matching SQL CHECK and Delta constraints).
  *
  * Two enforcement modes:
  *  - fail: [[check]] counts violations of every expectation in ONE
  *    column-pruned aggregate pass and throws [[ViolationException]]
  *    if any row violates any expectation — the write never starts, so
  *    a bad batch can't poison the table. The extra pass reads only
  *    the columns the expectations mention.
  *  - drop: [[dropInvalid]] filters violating rows out (map-only, no
  *    extra pass) for pipelines that quarantine instead of abort.
  *
  * [[commitChecked]] composes fail-mode with the atomic write and
  * commits the per-expectation violation counts (all zero, by
  * construction) as manifest properties — an auditable record that the
  * batch was validated, riding the same version swap as the data. */
object Expectations {

  final case class Report(rows: Long, violations: Map[String, Long]) {
    def failed: Map[String, Long] = violations.filter(_._2 > 0L)
  }

  final class ViolationException(val report: Report) extends RuntimeException(
    s"expectations violated: ${report.failed.toSeq.sortBy(_._1)
      .map { case (n, c) => s"$n ($c rows)" }.mkString(", ")} " +
      s"of ${report.rows} rows")

  // Same CHECK tri-state truth table as not(coalesce(e, true)) — violates
  // only when e is definitely FALSE — but stated null-intolerantly so the
  // optimizer can rewrite dropInvalid's not(violates(e)) into
  // (e OR isnull(col)) and PUSH it to the parquet scan. The coalesce form
  // is opaque to ParquetFilters and left wh_expect_drop's scan with
  // PushedFilters: [] (measured; see OPTIMIZATION_r14.md).
  private def violates(e: Column): Column = e.isNotNull && not(e)

  /** Count violations of every expectation in one aggregate pass over
    * `rows`; throws [[ViolationException]] when any count is nonzero. */
  def check(rows: DataFrame, expectations: Map[String, Column]): Report = {
    require(expectations.nonEmpty, "at least one expectation")
    val names = expectations.keys.toSeq.sorted
    val aggs = count(lit(1)).as("_rows") +: names.zipWithIndex.map {
      case (n, i) => sum(when(violates(expectations(n)), 1L).otherwise(0L))
        .as(s"_v$i")
    }
    val r = rows.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rep = Report(r.getLong(0),
      names.zipWithIndex.map { case (n, i) => n -> r.getLong(1 + i) }.toMap)
    if (rep.failed.nonEmpty) throw new ViolationException(rep)
    rep
  }

  /** Drop-mode enforcement: the rows satisfying every expectation
    * (UNKNOWN passes, per CHECK semantics). Map-only — compose it into
    * any write plan; pair with [[check]]'s counting if the quarantine
    * rate needs recording. */
  def dropInvalid(rows: DataFrame, expectations: Map[String, Column]): DataFrame =
    rows.filter(expectations.values.map(e => not(violates(e))).reduce(_ && _))

  /** Fail-mode validated atomic write: [[check]] first (the write never
    * stages a byte for a violating batch), then [[AtomicTable.replacePartitions]]
    * with the zero-violation report committed as `expect.<name>` manifest
    * properties in the same version swap. */
  def commitChecked(spark: SparkSession, table: String, rows: DataFrame,
      partitionCol: String, expectations: Map[String, Column],
      statsColumns: Seq[String] = Nil, retain: Int = 1): AtomicTable.Manifest = {
    val rep = check(rows, expectations)
    AtomicTable.replacePartitions(spark, table, rows, partitionCol,
      statsColumns = statsColumns, retain = retain,
      properties = rep.violations.map { case (n, c) =>
        s"expect.$n" -> c.toString })
  }
}
