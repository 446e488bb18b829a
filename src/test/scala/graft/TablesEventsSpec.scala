package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Guard against testdata regeneration changing the `events.ts` parquet
  * encoding: `Tables.events` must normalize every encoding the harness has
  * ever shipped (µs adjusted-to-UTC → TimestampType, µs naive →
  * TimestampNTZType, legacy nanos → LongType) to the same TimestampType
  * column with identical instants. This is the reader bug that zeroed all
  * 15 events queries in round 4 — keep all three arms covered.
  */
class TablesEventsSpec extends SparkSuite {

  /** Write the sf0.001 events table back out under a chosen ts encoding and
    * return a dir layout Tables.events can read (`<dir>/events.parquet`).
    */
  private def stage(encode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft-events-enc").toString
    encode(Tables.events(spark, sf0001)).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val expected: Array[Long] = {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    df.select(unix_micros(col("ts"))).orderBy("ts").limit(100)
      .collect().map(_.getLong(0))
  }

  private def check(dir: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).orderBy("ts").limit(100)
      .collect().map(_.getLong(0))
    assert(got.sameElements(expected))
  }

  test("native testdata encoding reads as TimestampType") {
    // whatever the current harness generation ships, the reader must accept it
    assert(Tables.events(spark, sf0001).schema("ts").dataType == TimestampType)
  }

  test("µs adjusted-to-UTC (TimestampType) round-trips") {
    check(stage(identity)) // Spark writes TimestampType as µs-UTC parquet
  }

  test("µs naive (TimestampNTZType) is normalized losslessly") {
    check(stage(_.withColumn("ts", col("ts").cast(TimestampNTZType))))
  }

  test("legacy nanos-as-long is normalized") {
    // raw ns longs surface as LongType under nanosAsLong; emulate that file
    check(stage(_.withColumn("ts", (unix_micros(col("ts")) * 1000L))))
  }
}
