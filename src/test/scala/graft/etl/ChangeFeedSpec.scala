package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Row-level CDC from manifests alone ([[ChangeFeed]]) and the DSv2
  * `readChangeFeed` scan option's insert-only/loud-failure contract. */
class ChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("p", StringType)))

  private def changesOf(dir: String, from: Long, to: Long,
      keys: Seq[String] = Seq("id")): Set[(Long, Long, String, String, Long)] =
    ChangeFeed.changes(spark, dir, schema, from, to, keys)
      .as[(Long, Long, String, String, Long)].collect().toSet

  test("appends, rewrites, drops and vector deletes classify row-level") {
    val dir = Files.createTempDirectory("graft-cdc").toString
    def df(rows: (Long, Long, String)*) = rows.toDF("id", "v", "p")
    AtomicTable.replacePartitions(spark, dir,
      df((1L, 10L, "a"), (2L, 20L, "a"), (5L, 50L, "b")), "p",
      retain = 100)                                               // v1
    AtomicTable.appendPartitions(spark, dir,
      df((3L, 30L, "a")), "p", retain = 100)                      // v2
    // v3: rewrite partition a — reprice id=2, drop id=3, keep id=1
    AtomicTable.replacePartitions(spark, dir,
      df((1L, 10L, "a"), (2L, 21L, "a")), "p", retain = 100,
      expectedVersion = Some(2L))                                 // v3
    // v4: vector-delete id=5 from b (merge-on-read, bytes untouched)
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((5L, "b")).toDF("id", "p"), Seq("id"), "p", retain = 100) // v4
    // v5: drop partition b outright
    AtomicTable.commitManifest(Paths.get(dir), Map.empty,
      dropPartitions = Set("b"), retain = 100)                    // v5

    assert(changesOf(dir, 1, 1) === Set(
      (1L, 10L, "a", "insert", 1L), (2L, 20L, "a", "insert", 1L),
      (5L, 50L, "b", "insert", 1L)))
    assert(changesOf(dir, 2, 2) === Set((3L, 30L, "a", "insert", 2L)),
      "an append emits only the appended rows")
    assert(changesOf(dir, 3, 3) === Set(
      (2L, 20L, "a", "update_preimage", 3L),
      (2L, 21L, "a", "update_postimage", 3L),
      (3L, 30L, "a", "delete", 3L)),
      "a rewrite diffs by key: unchanged rows emit nothing")
    assert(changesOf(dir, 4, 4) === Set((5L, 50L, "b", "delete", 4L)),
      "a vector delete recovers the FULL preimage row")
    // v5 drops b, whose id=5 was already vector-deleted: nothing left
    assert(changesOf(dir, 5, 5) === Set.empty,
      "dropping an effectively-empty partition emits nothing")
    // the whole range, unioned
    assert(changesOf(dir, 1, 5).size === 8)
  }

  test("a dropped partition with live rows emits them as deletes") {
    val dir = Files.createTempDirectory("graft-cdc2").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10L, "a"), (5L, 50L, "b")).toDF("id", "v", "p"), "p",
      retain = 100)                                               // v1
    AtomicTable.commitManifest(Paths.get(dir), Map.empty,
      dropPartitions = Set("b"), retain = 100)                    // v2
    assert(changesOf(dir, 2, 2) === Set((5L, 50L, "b", "delete", 2L)))
  }

  test("without key columns a rewrite degrades to set semantics") {
    val dir = Files.createTempDirectory("graft-cdc3").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10L, "a"), (2L, 20L, "a")).toDF("id", "v", "p"), "p",
      retain = 100)                                               // v1
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10L, "a"), (2L, 21L, "a")).toDF("id", "v", "p"), "p",
      retain = 100)                                               // v2
    assert(changesOf(dir, 2, 2, keys = Nil) === Set(
      (2L, 20L, "a", "delete", 2L), (2L, 21L, "a", "insert", 2L)),
      "no keys: changed rows emit as delete+insert, identical rows nothing")
  }

  test("a compaction that preserves contents emits no change rows") {
    val dir = Files.createTempDirectory("graft-cdc4").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10L, "a"), (2L, 20L, "a")).toDF("id", "v", "p"), "p",
      retain = 100)                                               // v1
    AtomicTable.appendPartitions(spark, dir,
      Seq((3L, 30L, "a")).toDF("id", "v", "p"), "p", retain = 100) // v2
    AtomicTable.compact(spark, dir, schema, "p", retain = 100)    // v3
    assert(changesOf(dir, 3, 3) === Set.empty,
      "bin-packing moved bytes but changed no row")
  }

  test("two-level tables classify row-level changes per composite partition") {
    val dir = Files.createTempDirectory("graft-cdc-ml").toString
    val schema2 = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("ym", StringType), StructField("st", StringType)))
    def df(rows: (Long, Long, String, String)*) =
      rows.toDF("id", "v", "ym", "st")
    AtomicTable.replacePartitions(spark, dir,
      df((1L, 10L, "a", "F"), (2L, 20L, "a", "O"), (3L, 30L, "b", "F")),
      "ym,st", retain = 100)                                        // v1
    // v2: rewrite ONLY composite a/F — reprice id=1
    AtomicTable.replacePartitions(spark, dir,
      df((1L, 11L, "a", "F")), "ym,st", retain = 100,
      expectedVersion = Some(1L))                                   // v2
    // v3: vector-delete id=3 from b/F
    MergeInto.deleteKeysMor(spark, dir, schema2,
      df((3L, 0L, "b", "F")).select("id", "ym", "st"), Seq("id"), "ym,st",
      retain = 100)                                                 // v3
    val out = ChangeFeed.changes(spark, dir, schema2, 2, 3, Seq("id"))
      .as[(Long, Long, String, String, String, Long)].collect().toSet
    assert(out === Set(
      (1L, 10L, "a", "F", "update_preimage", 2L),
      (1L, 11L, "a", "F", "update_postimage", 2L),
      (3L, 30L, "b", "F", "delete", 3L)))
  }

  test("streaming readChangeFeed: per-commit attribution, loud on rewrites") {
    val dir = Files.createTempDirectory("graft-cdc-st").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10L, "a")).toDF("id", "v", "p"), "p", retain = 100)  // v1
    AtomicTable.appendPartitions(spark, dir,
      Seq((2L, 20L, "a")).toDF("id", "v", "p"), "p", retain = 100)  // v2
    AtomicTable.appendPartitions(spark, dir,
      Seq((3L, 30L, "b")).toDF("id", "v", "p"), "p", retain = 100)  // v3
    def drain(): Set[(Long, String, Long)] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
      val ckpt = Files.createTempDirectory("graft-cdc-st-ckpt").toString
      val q = spark.readStream.format("graft")
        .option("readChangeFeed", "true").load(dir)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "_change_type", "_commit_version").collect()
            .foreach { r =>
              buf.add((r.getLong(0), r.getString(1), r.getLong(2))); ()
            }
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSet
    }
    assert(drain() === Set((1L, "insert", 1L), (2L, "insert", 2L),
      (3L, "insert", 3L)),
      "every commit's rows carry their own _commit_version")
    // a rewrite in the drained range fails the stream loudly
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 11L, "a")).toDF("id", "v", "p"), "p", retain = 100)  // v4
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    assert(e.getCause.getMessage.contains("ChangeFeed.changes"))
  }

  test("readChangeFeed scan: inserts attributed per commit, loud on rewrites") {
    val dir = Files.createTempDirectory("graft-cdc5").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10L, "a")).toDF("id", "v", "p"), "p", retain = 100) // v1
    AtomicTable.appendPartitions(spark, dir,
      Seq((2L, 20L, "a")).toDF("id", "v", "p"), "p", retain = 100) // v2
    AtomicTable.appendPartitions(spark, dir,
      Seq((3L, 30L, "b")).toDF("id", "v", "p"), "p", retain = 100) // v3
    val feed = spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(dir)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(feed === Set((1L, "insert", 1L), (2L, "insert", 2L),
      (3L, "insert", 3L)))
    // a rewrite in the range cannot be expressed as a scan: fail loudly
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 11L, "a"), (2L, 20L, "a")).toDF("id", "v", "p"), "p",
      retain = 100)                                               // v4
    val e = intercept[IllegalStateException] {
      spark.read.format("graft")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(dir).collect()
    }
    assert(e.getMessage.contains("ChangeFeed.changes"))
    // bounded BEFORE the rewrite, the feed still reads fine
    assert(spark.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .option("endingVersion", "3").load(dir).count() === 2L)
  }

  test("vector preimages on numeric-looking partitions keep declared types") {
    // the vector dirs' partition values come back TYPE-INFERRED from
    // the dir names (p=1 reads as INT) — the preimage semi-join must
    // compare in the DECLARED string type, per-partition, or keys could
    // coerce/mis-pair (same guard subtractDeletes applies)
    val dir = Files.createTempDirectory("graft-cdc6").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((7L, 10L, "1"), (8L, 20L, "1"), (7L, 30L, "2"), (9L, 40L, "2"))
        .toDF("id", "v", "p"), "p", retain = 100)                 // v1
    // ONE commit grows vectors in both partitions: id 7 deleted from
    // "1" only (the id-7 row of "2" must survive), id 9 from "2"
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((7L, "1"), (9L, "2")).toDF("id", "p"), Seq("id"), "p",
      retain = 100)                                               // v2
    val ch = ChangeFeed.changes(spark, dir, schema, 2L, 2L, Seq("id"))
    assert(ch.schema("p").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(changesOf(dir, 2, 2) === Set(
      (7L, 10L, "1", "delete", 2L), (9L, 40L, "2", "delete", 2L)))
  }

  test("a properties-only commit on a still-empty table emits no changes") {
    val dir = Files.createTempDirectory("graft-cdc7").toString
    Files.createDirectories(Paths.get(dir))
    AtomicTable.commitManifest(Paths.get(dir), Map.empty,
      properties = Map("owner" -> "etl"), retain = 100)           // v1
    assert(changesOf(dir, 1, 1) === Set.empty,
      "no partitions on either side: empty change frame, not a crash")
  }
}
