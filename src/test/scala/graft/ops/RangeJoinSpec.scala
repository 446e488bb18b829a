package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class RangeJoinSpec extends SparkSuite {

  private lazy val points = Tables.lineitem(spark, sf0001)
    .select(col("l_shipdate").cast("date").as("d")).distinct()
  private lazy val intervals = Tables.orders(spark, sf0001)
    .filter(col("o_orderkey") % 20 === 0) // keep the naive side affordable
    .select(col("o_orderkey"),
      col("o_orderdate").cast("date").as("s"),
      date_add(col("o_orderdate").cast("date"),
        pmod(col("o_orderkey"), lit(30)).cast("int")).as("e"))

  test("bucketized range join equals the naive BETWEEN join exactly") {
    val bucketized = RangeJoin.pointInInterval(points, "d", intervals, "s", "e")
      .select("d", "o_orderkey").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).sorted
    val naive = points.join(intervals, col("d").between(col("s"), col("e")))
      .select("d", "o_orderkey").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).sorted
    assert(bucketized.nonEmpty)
    assert(bucketized === naive)
  }

  test("bucketization produces no duplicate pairs (a pair meets in one bucket)") {
    val out = RangeJoin.pointInInterval(points, "d", intervals, "s", "e")
      .groupBy("d", "o_orderkey").count().filter(col("count") > 1)
    assert(out.count() === 0)
  }

  test("the plan is an equi-join on the bucket, not a nested loop") {
    val p = RangeJoin.pointInInterval(points, "d", intervals, "s", "e")
      .queryExecution.sparkPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not plan as a cross product:\n$p")
  }
}
