package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation.
  *
  * A group-by on a low-cardinality or skewed key sends every row of a hot
  * key to one reducer — at 100 TB one task gets the whole skewed key and
  * the stage runs at the speed of that straggler. Salting splits each key
  * into `salts` sub-keys for the first (partial) aggregation, spreading
  * the hot key across reducers, then a second cheap aggregation over
  * `salts` rows per key removes the salt. Results are identical to the
  * direct group-by as long as every aggregate used is decomposable
  * (sum/count/min/max — avg must be carried as sum+count).
  *
  * AQE's skew-join handling covers joins; deliberate salting remains the
  * tool for skewed aggregations and for deterministic layouts.
  */
object Salting {

  /** Salted sum/count aggregation: groupBy(keys) with sums of `sumCols`
    * and a row count, computed skew-safely. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], sumCols: Seq[(Column, String)],
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"),
        sumCols.zipWithIndex.map { case ((c, _), i) => sum(c).as(s"_s$i") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"),
        sumCols.zipWithIndex.map { case ((_, name), i) => sum(col(s"_s$i")).as(name) }: _*)
  }
}
