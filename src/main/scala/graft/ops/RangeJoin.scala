package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each point to the intervals containing it.
  *
  * The naive plan for `p BETWEEN s AND e` is a broadcast nested loop —
  * O(|points|·|intervals|) comparisons, the classic scale-killer. The
  * scalable shape is bucketization: slice the domain into fixed-width
  * buckets, explode each interval into the buckets it overlaps, take each
  * point's single bucket, equi-join on the bucket id (hash shuffle, never
  * a cross product), and apply the exact containment predicate as a
  * residual filter. A (point, interval) pair can only meet in the point's
  * own bucket, so the join produces no duplicates by construction.
  *
  * Cost model: the interval side inflates by ceil(span/width)+1 rows; the
  * equi-join then only compares pairs whose buckets collide. Pick
  * `bucketDays` near the typical interval span so the inflation stays
  * small while buckets stay selective (width ≫ span → every bucket pairs
  * with everything; width ≪ span → the explode dominates).
  */
object RangeJoin {

  /** Join `points` (a DateType column `pointCol`) to the `intervals` rows
    * whose `[startCol, endCol]` (DateType, inclusive) contain them. Output
    * is the point columns followed by the interval columns. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val pB = points.withColumn("_bucket",
      floor(unix_date(col(pointCol)) / bucketDays))
    val iB = intervals.withColumn("_bucket",
      explode(sequence(
        floor(unix_date(col(startCol)) / bucketDays),
        floor(unix_date(col(endCol)) / bucketDays))))
    pB.join(iB, Seq("_bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_bucket")
  }
}
