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

  /** Skew-safe inner equi-join: the big (skewed) side gets a deterministic
    * row-level salt, the small side is replicated across all `salts`
    * sub-keys, and the join runs on (keys :+ salt) — a hot key's rows land
    * on `salts` reducers instead of one. Output is identical to
    * `big.join(small, keys)` (same using-column layout, salt dropped).
    *
    * This is the aggregation-independent skew lever: partial aggregation
    * already absorbs hot keys for decomposable group-bys, but a shuffle
    * JOIN must co-locate every row of a hot key on one task — at 100 TB
    * that task is the stage. AQE's skew-join split handles the common
    * case at runtime; explicit salting remains the tool when AQE can't
    * see it (stateful streaming joins, deliberate layouts, or skew below
    * its 256 MB partition threshold but above the straggler budget). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }

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
