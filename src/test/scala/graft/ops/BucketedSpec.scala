package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.{SparkSuite, Tables}

/** Bucketed co-located joins (ops/Bucketed.scala): the zero-exchange
  * fact-to-fact join plan, one-file-per-bucket layout, and bucket
  * pruning. */
class BucketedSpec extends SparkSuite {

  test("bucketed equi-join plans with zero Exchange on either side") {
    // the scenario bucketing exists for is both sides too big to
    // broadcast — simulate it by disabling auto-broadcast for the pin
    // (at sf0.001 the tiny customer side would broadcast, which is also
    // exchange-free but doesn't exercise the co-located merge path)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val joined = Bucketed.customerOrdersJoined(spark, sf0001)
      val exchanges = joined.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"co-bucketed join must not shuffle:\n${joined.queryExecution.sparkPlan}")
      assert(joined.queryExecution.sparkPlan.toString.contains("SortMergeJoin"),
        "both sides are big: expect a merge join, not a broadcast")
    } finally spark.conf.set(key, prev)
  }

  test("bucketed join result equals the plain shuffle join") {
    val bucketed = Bucketed.customerOrdersJoined(spark, sf0001)
      .select("c_custkey", "o_orderkey", "o_totalprice")
    val plain = Tables.customer(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "o_orderkey", "o_totalprice")
    assert(bucketed.exceptAll(plain).unionByName(plain.exceptAll(bucketed)).isEmpty,
      "bucketing is a physical layout choice; results must be identical")
  }

  test("writer lays out exactly one file per bucket") {
    val (_, ordTable) = Bucketed.stageCustomerOrders(spark, sf0001)
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $ordTable")
      .filter(col("col_name") === "Location")
      .collect().head.getString(1)
    val dir = java.nio.file.Paths.get(new java.net.URI(loc))
    val parts = java.nio.file.Files.list(dir)
    val files =
      try {
        import scala.jdk.CollectionConverters._
        parts.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toList
      } finally parts.close()
    assert(files.size === 8, s"8 buckets -> 8 files, got: $files")
    // bucket ids 0..7 each appear exactly once (file name carries _0000N)
    val ids = files.flatMap("_(\\d{5})\\.".r.findFirstMatchIn(_)).map(_.group(1).toInt)
    assert(ids.sorted === (0 until 8).toList, s"one file per bucket id: $files")
  }

  test("a key-literal predicate prunes to a single bucket") {
    val (cust, _) = Bucketed.stageCustomerOrders(spark, sf0001)
    val one = spark.table(cust).filter(col("c_custkey") === 42L)
    val scan = one.queryExecution.sparkPlan.toString
    assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
      s"expected bucket pruning in:\n$scan")
  }
}
