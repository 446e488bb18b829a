package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` has shipped under three parquet encodings across harness
    * generations (FIXTURES.md §B): TIMESTAMP(MICROS, adjustedToUTC=true) →
    * TimestampType; TIMESTAMP(MICROS, adjustedToUTC=false) → TimestampNTZType;
    * TIMESTAMP(NANOS) → LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`. Normalize all three to
    * TimestampType so downstream plans are uniform. The session timezone is
    * pinned UTC (build.sbt), so the NTZ→TZ cast is lossless and matches
    * DuckDB's naive read of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        // `ts / 1000` would be double division: ns epochs (~1.7e18) exceed a
        // double's 53-bit mantissa and drift by up to 1 µs after truncation.
        // IntegralDivide (`div`) stays exact on longs.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }
}
