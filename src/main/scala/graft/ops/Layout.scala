package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering (Z-order) for data-skipping layouts.
  *
  * Parquet/ORC readers skip row groups whose column min/max stats exclude a
  * predicate. A table sorted by one key skips perfectly on that key and not
  * at all on others; interleaving the bits of two keys into one Morton
  * (Z-order) value and range-clustering by it gives every participating
  * key locality — each file covers a small rectangle of the key space, so
  * point/range predicates on EITHER column prune most files. This is the
  * layout trick behind Delta's `OPTIMIZE ZORDER BY` and the z-curve
  * literature; at 100 TB it's the difference between scanning a full table
  * and reading a few files for a two-column selective query.
  *
  * The z-value is pure bit arithmetic over codegen'd built-ins (shift, and,
  * or) — no UDF — and the cluster step is `repartitionByRange` (sampled
  * range boundaries, one exchange) + a within-partition sort, which is
  * exactly the shuffle a write-time `ORDER BY` would cost.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative int
    * columns (x gets even bit positions, y odd). Plain column name args —
    * the expression is built as one SQL string so the whole thing folds
    * into a single codegen'd projection. */
  def zValue(x: String, y: String, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"shiftleft(shiftrightunsigned(CAST($x AS BIGINT), $i) & 1, ${2 * i})",
        s"shiftleft(shiftrightunsigned(CAST($y AS BIGINT), $i) & 1, ${2 * i + 1})")
    }
    expr(terms.mkString("(", " | ", ")"))
  }

  /** Equivalent SQL fragment for an ANSI oracle (DuckDB operators). */
  def zValueSql(x: String, y: String, bits: Int = 10): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Cluster `df` into `n` z-ordered partitions on (x, y): range-partition
    * by z then sort within each partition, so a subsequent write produces
    * files whose (x, y) bounding boxes tile the space. */
  def clusterByZ(df: DataFrame, x: String, y: String, n: Int,
      bits: Int = 10): DataFrame = {
    val withZ = df.withColumn("_z", zValue(x, y, bits))
    withZ
      .repartitionByRange(n, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Per-partition bounding boxes of (x, y) — the file-stats view a reader
    * would prune with; total box area is the skipping metric a layout job
    * reports. */
  def boundingBoxes(df: DataFrame, x: String, y: String): DataFrame =
    df.groupBy(spark_partition_id().as("pid"))
      .agg(
        min(col(x)).as("x_min"), max(col(x)).as("x_max"),
        min(col(y)).as("y_min"), max(col(y)).as("y_max"),
        count(lit(1)).as("n_rows"))
}
