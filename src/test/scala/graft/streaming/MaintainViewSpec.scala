package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.etl.{AtomicTable, IncrementalView, MergeInto}

/** Streaming-maintained incremental view: a file stream feeds a graft
  * table through the streaming sink, and [[Streams.maintainView]] keeps
  * a summary view fresh from the table's changefeed — every micro-batch
  * triggers one exactly-once refresh, so restarts and replays cannot
  * double-apply. */
class MaintainViewSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType),
    StructField("p", StringType)))

  test("the view tracks a streaming-ingested source, exactly once") {
    val base = Files.createTempDirectory("mv-stream")
    val srcFiles = base.resolve("in")
    val table = base.resolve("t").toString
    val mv = base.resolve("mv").toString
    def batch(name: String, rows: (Long, Double, String)*): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3))), schema)
        .coalesce(1).write.parquet(srcFiles.resolve(name).toString)
    def sinkOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcFiles.toString + "/*")
        .writeStream.format("graft")
        .option("partition", "p").option("retain", "10")
        .option("checkpointLocation", base.resolve("ckpt-sink").toString)
        .trigger(Trigger.AvailableNow())
        .start(table)
      try q.awaitTermination() finally q.stop()
    }
    def maintainOnce(): Unit = {
      val q = Streams.maintainView(spark, mv,
        base.resolve("ckpt-mv").toString)
      try q.awaitTermination() finally q.stop()
    }
    def viewRows(): Map[String, (String, Long)] =
      IncrementalView.read(spark, mv)
        .select(col("p"), col("v_sum").cast("string"),
          col(IncrementalView.RowsCol))
        .as[(String, String, Long)].collect()
        .map(r => r._1 -> (new java.math.BigDecimal(r._2)
          .stripTrailingZeros.toPlainString, r._3)).toMap

    // the streaming sink commits each epoch as a dynamic partition
    // replace, so the append-only changefeed contract wants epoch- or
    // event-scoped partitions (the documented streaming-sink layout) —
    // each batch lands in partitions of its own
    batch("b0", (1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b"))
    sinkOnce()
    IncrementalView.create(spark, table, schema, mv,
      Seq("p"), Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"), "p",
      keyCols = Seq("id"), retain = 10)
    assert(viewRows() === Map("a" -> ("3", 2L), "b" -> ("3", 1L)))

    // two more ingest epochs, then one maintenance pass over BOTH
    batch("b1", (4L, 4.0, "c"), (5L, 6.0, "c"))
    batch("b2", (6L, 5.0, "d"))
    sinkOnce()
    maintainOnce()
    assert(viewRows() === Map("a" -> ("3", 2L), "b" -> ("3", 1L),
      "c" -> ("10", 2L), "d" -> ("5", 1L)))

    // a replayed maintenance pass (fresh stream, same table state)
    // must no-op: the applied version already rode the first refresh
    val before = AtomicTable.manifest(java.nio.file.Paths.get(mv)).get
    maintainOnce()
    assert(AtomicTable.manifest(java.nio.file.Paths.get(mv)).get.version
      === before.version)

    // the view agrees with the full recompute at every point
    val want = IncrementalView.aggregate(
      MergeInto.readMerged(spark, table, schema), Seq("p"),
      Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"))
      .select(col("p"), col("v_sum").cast("string"),
        col(IncrementalView.RowsCol))
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> (new java.math.BigDecimal(r._2)
        .stripTrailingZeros.toPlainString, r._3)).toMap
    assert(viewRows() === want)
  }
}
