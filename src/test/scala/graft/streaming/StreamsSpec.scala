package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.ops.EventWindows

/** Streaming results must agree with their batch twins: a parquet batch
  * driven through readStream + processAllAvailable is the synchronous
  * harness for the streaming operators. */
class StreamsSpec extends SparkSuite {
  import spark.implicits._

  /** events normalized to µs timestamps in a temp dir (streaming file
    * sources need a directory; raw testdata is nanos). */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    Tables.events(spark, sf0001).coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming tumbling window equals the batch operator") {
    val q = Streams.tumblingCounts(Streams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventWindows.tumbling(spark.read.parquet(eventsDir)).collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("tumbling + session + dedup agree with batch under RocksDB state") {
    // the 100 TB state-store posture: same pipelines, provider flipped by
    // config only — bounded executor memory instead of all-state-on-heap
    Streams.withRocksDbState(spark) {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      val streamed = Streams.tumblingAvailableNow(spark, eventsDir,
        queryName = "tumbling_rocks_out").collect().toSeq
      val batch = EventWindows.tumbling(spark.read.parquet(eventsDir))
        .collect().toSeq
      assert(streamed === batch)
      val sessions = Streams.sessionsAvailableNow(spark, eventsDir,
        queryName = "session_rocks_out").collect().toSeq
      val sessionsBatch = EventWindows.sessions(spark.read.parquet(eventsDir))
        .collect().toSeq
      assert(sessions === sessionsBatch)
      val deduped = Streams.dedupAvailableNow(spark, eventsDir,
        queryName = "dedup_rocks_out").count()
      val dedupBatch = spark.read.parquet(eventsDir)
        .select("user_id", "event_type").distinct().count()
      assert(deduped === dedupBatch)
    }
    // scoping restored the default provider
    assert(!spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass").exists(_.contains("RocksDB")))
  }

  test("streaming session window equals the batch operator") {
    val q = Streams.sessionCounts(Streams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("session_out")
        .orderBy("user_id", "session_start").collect().toSeq
      val batch = EventWindows.sessions(spark.read.parquet(eventsDir)).collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming as-of join equals the batch most-recent-click lookup") {
    val streamed = Streams.asofAvailableNow(spark, eventsDir).collect().toSeq
    // batch oracle: per purchase, the max-(ts, id) click at or before it
    val ev = spark.read.parquet(eventsDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
    val purchases = ev.filter($"event_type" === "purchase")
    val batch = purchases.join(clicks,
        $"user_id" === $"c_user" &&
          ($"c_ts" < $"ts" || ($"c_ts" === $"ts" && $"c_id" < $"event_id")),
        "left_outer")
      .groupBy($"user_id", $"event_id".as("purchase_id"), $"ts")
      .agg(max_by($"c_id", struct($"c_ts", $"c_id")).as("click_id"))
      .select($"user_id", $"purchase_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_at"),
        $"click_id")
      .orderBy("purchase_id").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stateful running totals match the batch aggregate after one batch") {
    val stream = Streams.readEvents(spark, eventsDir)
      .select($"user_id", $"ts", $"value").as[Streams.UserEvent]
    val q = Streams.runningTotals(stream)
      .writeStream.format("memory").queryName("running_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("running_out")
        .groupBy("user_id").agg(max("n_events").as("n_events"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val batch = spark.read.parquet(eventsDir)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed === batch)
    } finally q.stop()
  }
}
