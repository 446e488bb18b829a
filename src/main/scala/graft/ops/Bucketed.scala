package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style bucketed tables: the co-location primitive that turns the
  * biggest 100 TB shuffle — fact-to-fact joins on a shared key — into a
  * zero-exchange merge. Writing both sides `CLUSTERED BY (key) INTO n
  * BUCKETS` hash-places every key's rows in the same bucket file on both
  * tables, so a later equi-join reads bucket i of each side in the same
  * task and never exchanges: the join cost is a linear co-scan no matter
  * how many times the tables are joined afterwards. That amortization is
  * the point — a nightly-refreshed fact pair pays one bucketed write,
  * then every downstream join of the pair is shuffle-free.
  *
  * The write path pre-repartitions by the SAME hash Spark's bucketing
  * uses (`HashPartitioning.partitionIdExpression` = pmod(murmur3(key),
  * n)), so each task owns exactly one bucket and writes exactly ONE file
  * per bucket — the layout bucket-side sort metadata requires, keeping
  * scans eligible for sort-elision and keeping file counts flat (n files,
  * not n×tasks). Bucket pruning falls out for free: a `key = literal`
  * predicate scans 1/n of the files (`SelectedBucketsCount` in the plan),
  * metadata-level skipping like [[graft.etl.AtomicTable]]'s zone maps but
  * keyed by hash instead of range.
  *
  * Reference scope: the reference joins facts to dims in pandas
  * (`/root/reference/src/load.py:60-98`, always in-memory); bucketing is
  * the scale-path generalization for joins whose both sides are too big
  * to broadcast. */
object Bucketed {

  /** dir → (customerTable, ordersTable) staged this JVM. */
  private val staged = new ConcurrentHashMap[String, (String, String)]()

  /** Write `df` as an external parquet bucketed table (one file per
    * bucket, sorted by `key` within each bucket), replacing any previous
    * table of the same name. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      buckets: Int, key: String): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Stage customer+orders from `dir` as bucketed tables co-clustered on
    * custkey (idempotent per JVM; table names are dir-keyed so different
    * scale factors coexist in one catalog). Returns the table names. */
  def stageCustomerOrders(s: SparkSession, dir: String, buckets: Int = 8)
      : (String, String) = {
    val got = staged.computeIfAbsent(dir, { _ =>
      val h = Integer.toHexString(dir.hashCode).take(8)
      val base = java.nio.file.Files.createTempDirectory("graft-bkt").toString
      val cust = s"graft_bkt_customer_$h"
      val ord = s"graft_bkt_orders_$h"
      writeBucketed(graft.Tables.customer(s, dir), cust, s"$base/customer",
        buckets, "c_custkey")
      writeBucketed(graft.Tables.orders(s, dir), ord, s"$base/orders",
        buckets, "o_custkey")
      (cust, ord)
    })
    got
  }

  /** The co-located join itself: both sides read as bucketed scans, so
    * the equi-join on the bucket key plans with NO Exchange on either
    * side (pinned in BucketedSpec). */
  def customerOrdersJoined(s: SparkSession, dir: String): DataFrame = {
    val (cust, ord) = stageCustomerOrders(s, dir)
    s.table(cust).join(s.table(ord), col("c_custkey") === col("o_custkey"))
  }
}
