package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance (materialized-view refresh).
  *
  * At 100 TB you never recompute a corpus-wide aggregate from scratch when a
  * daily batch lands; you keep a per-group *mergeable state* — (count, exact
  * sum, exact sum-of-squares) — and fold each delta batch into it. Count,
  * sum, mean, and variance are all derivable from the merged moments, and
  * because the sums route through exact decimal arithmetic (see
  * graft.functions.Stable) the merge is associative AND order-independent:
  * state ⊕ delta equals a full recompute bit-for-bit, which is exactly what
  * the driver's oracle checks. This is the same algebra Spark's own partial
  * aggregation uses, lifted to cross-run persistence.
  */
object IncrAgg {

  /** Per-group moment state of `valueCol`: (n, sum, sum of squares), both
    * sums exact decimals so merges commute. The square multiplies the
    * DECIMAL cast of the value by itself (exact decimal product) rather
    * than casting the double product — engines disagree on the last ulp
    * of a double→decimal cast of a computed product, but not on decimal
    * arithmetic over identical decimal inputs. Pick `scale` to cover the
    * value's true decimals and no more: the sum-of-squares carries 2·scale
    * decimals, and an oracle engine's decimal→double conversion is only
    * exact while the scaled integer stays under 2^53. */
  def state(df: DataFrame, keys: Seq[String], valueCol: String,
      scale: Int = 4): DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, scale))
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(v).as("s"),
        sum(v * v).as("ss"))
  }

  /** Merge any number of states (union of `state` outputs) and derive the
    * final aggregates. The variance is the textbook moment form computed in
    * double *after* the exact merge — both engines see identical decimal
    * inputs, so the double arithmetic is identical too. */
  def merge(states: DataFrame, keys: Seq[String]): DataFrame = {
    val n = col("n_total").cast("double")
    val s = col("s_total").cast("double")
    val ss = col("ss_total").cast("double")
    states
      .groupBy(keys.map(col): _*)
      .agg(
        sum("n").as("n_total"),
        sum("s").as("s_total"),
        sum("ss").as("ss_total"))
      .select(
        keys.map(col) ++ Seq(
          col("n_total"),
          s.as("sum_v"),
          (s / n).as("avg_v"),
          when(col("n_total") > 1, (ss - s * s / n) / (n - lit(1.0)))
            .otherwise(lit(null)).as("var_v")): _*)
  }
}
