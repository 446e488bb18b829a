package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate sketches for cardinality and quantiles — the constant-space
  * per-group answers used when exact distinct counts or exact percentiles
  * would need a full shuffle of the key space. HyperLogLog++
  * (approx_count_distinct) and KLL-style quantile sketches
  * (approx_percentile) are mergeable, so partial aggregation and AQE
  * re-planning stay correct; at 100 TB each group's state is a few KB
  * regardless of cardinality.
  *
  * Sketch outputs are approximate by contract — engine-specific, so these
  * are rows-only in the driver harness; accuracy is asserted in tests
  * against the exact answers (relative error bounds).
  */
object Sketches {

  /** Per-status approximate cardinality and median. Sketch-only: mixing
    * exact percentile and approx_percentile buffers in one aggregate
    * triggers pathological imperative-buffer serialization (measured
    * 100-500s on 150k rows vs ~1s split apart); exact counterparts are
    * computed separately where needed (SketchesSpec). */
  def orderSketches(orders: DataFrame, rsd: Double = 0.02): DataFrame =
    orders.groupBy("o_orderstatus")
      .agg(
        approx_count_distinct(col("o_custkey"), rsd).as("approx_customers"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"))
      .orderBy("o_orderstatus")
}
