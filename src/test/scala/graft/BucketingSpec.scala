package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The 100 TB merge-join story: both sides bucketed on the join key →
  * sort-merge join with NO shuffle exchange. This is the layout the
  * fact-table MERGE assumes at warehouse scale (SURVEY.md §2.4 L3). */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val tmp = Files.createTempDirectory("graft-bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf0001)
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/b_orders").mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, sf0001)
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

      val prePlan = joined.queryExecution.sparkPlan.toString
      // the join itself must not shuffle; only the aggregate exchanges
      val joinSection = prePlan.substring(prePlan.indexOf("SortMergeJoin"))
      assert(prePlan.contains("SortMergeJoin"))
      assert(!joinSection.contains("ShuffleExchange") &&
        !joinSection.contains("Exchange hashpartitioning"),
        s"join subtree must be exchange-free:\n$joinSection")

      // and the result matches the unbucketed join
      val expected = Tables.orders(spark, sf0001)
        .join(Tables.lineitem(spark, sf0001), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
