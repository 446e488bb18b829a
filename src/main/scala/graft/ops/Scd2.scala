package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history from a change-event stream.
  *
  * The reference's dim upsert is insert-if-absent only (SURVEY §2.4 L4 —
  * `/root/reference/src/load.py:108-134` never rewrites an existing row), so
  * attribute history is lost. A warehouse at scale keeps it: collapse each
  * key's consecutive runs of an attribute value into validity intervals
  * `[valid_from, valid_to]` — the classic gaps-and-islands rewrite.
  *
  * Plan shape: two window functions over the same `(key ORDER BY time)`
  * partitioning — one sort, one shuffle on the key — then a group-by on
  * `(key, attr, island)` that reuses the same hash partitioning. No
  * self-join, no per-key iteration; at 100 TB this is one exchange over the
  * change log. The island id (`row_number ordered by time` minus
  * `row_number partitioned additionally by attr`) is constant exactly
  * within a maximal run of equal attr values — adjacent runs of the same
  * value separated by a different value get distinct islands, which is what
  * makes re-activated values produce separate intervals (true SCD2).
  */
object Scd2 {

  /** Collapse `events` into per-(key, attr-run) validity intervals.
    * `orderCol` must totally order each key's events (pass a tiebreaker in
    * `tiebreak` when timestamps can collide — nondeterministic tie order
    * would otherwise make island boundaries nondeterministic). */
  def intervals(events: DataFrame, keyCol: String, attrCol: String,
      orderCol: String, tiebreak: String): DataFrame = {
    val byTime = Window.partitionBy(keyCol)
      .orderBy(col(orderCol), col(tiebreak))
    val byAttr = Window.partitionBy(keyCol, attrCol)
      .orderBy(col(orderCol), col(tiebreak))
    val islands = events
      .withColumn("island",
        row_number().over(byTime) - row_number().over(byAttr))
    val runs = islands
      .groupBy(col(keyCol), col(attrCol), col("island"))
      .agg(
        min(col(orderCol)).as("valid_from"),
        max(col(orderCol)).as("valid_to"),
        count(lit(1)).as("n_events"))
    val latest = Window.partitionBy(keyCol)
    runs
      .withColumn("is_current",
        col("valid_to") === max("valid_to").over(latest))
      .drop("island")
  }
}
