package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Readers for the harness tables (`/root/testdata/sf0.001` etc., schemas
  * in FIXTURES.md section B). All plan building goes through these so scans
  * are uniform and any physical-layout decision (pruning-friendly reads,
  * the nanosecond-timestamp normalization for `events`) lives in one place.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) (FIXTURES.md §B), which Spark
    * either rejects or surfaces as a nanosecond long depending on
    * `spark.sql.legacy.parquet.nanosAsLong`. Normalize to TimestampType
    * (microseconds — the data is µs-aligned) so downstream plans are uniform.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case TimestampType => raw
      case LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
}
