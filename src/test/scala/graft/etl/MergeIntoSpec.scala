package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Row-level MERGE / DELETE over AtomicTable (etl/MergeInto.scala):
  * upsert semantics, copy-on-write bounded to touched partitions,
  * empty-partition drop, and optimistic-concurrency abort. */
class MergeIntoSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("p", StringType)))

  private def frame(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v", "p")
  }

  private def seed(): String = {
    val dir = Files.createTempDirectory("graft-merge").toString
    AtomicTable.replacePartitions(spark, dir,
      frame((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "c")), "p")
    dir
  }

  private def state(dir: String): Set[(Long, Long, String)] =
    AtomicTable.read(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("upsert replaces matched keys and inserts new ones") {
    val dir = seed()
    MergeInto.upsert(spark, dir, schema,
      frame((2L, 99L, "a"), (5L, 50L, "b")), Seq("id"), "p")
    assert(state(dir) === Set((1L, 10L, "a"), (2L, 99L, "a"),
      (3L, 30L, "b"), (5L, 50L, "b"), (4L, 40L, "c")))
  }

  test("untouched partitions are carried by reference (same data dirs)") {
    val dir = seed()
    val before = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get.partitions
    MergeInto.upsert(spark, dir, schema, frame((2L, 99L, "a")), Seq("id"), "p")
    val after = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get.partitions
    assert(after("b") === before("b") && after("c") === before("c"),
      "partitions without updates must keep their exact data dirs")
    assert(after("a") !== before("a"), "the touched partition is rewritten")
  }

  test("delete removes keys and drops emptied partitions from the manifest") {
    val dir = seed()
    // fast path: keys carry the partition column
    MergeInto.deleteKeys(spark, dir, schema,
      frame((4L, 0L, "c")).select("id", "p"), Seq("id"), "p")
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(!m.partitions.contains("c"), "fully-deleted partition must drop")
    assert(state(dir) === Set((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b")))
  }

  test("delete without partition info locates affected partitions itself") {
    val dir = seed()
    import spark.implicits._
    MergeInto.deleteKeys(spark, dir, schema,
      Seq(2L, 3L).toDF("id"), Seq("id"), "p")
    assert(state(dir) === Set((1L, 10L, "a"), (4L, 40L, "c")))
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(!m.partitions.contains("b"), "emptied partition must drop")
  }

  private val changeSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("p", StringType),
    StructField("op", StringType),
    StructField("seq", LongType)))

  private def changes(rows: (Long, Long, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "v", "p", "op", "seq")
  }

  test("applyChanges: last writer per key wins, deletes and upserts in one commit") {
    val dir = seed()
    val before = AtomicTable.currentVersion(java.nio.file.Paths.get(dir)).get
    // key 1: two upserts, seq 2 wins; key 2: upsert then delete — the
    // delete wins; key 4: delete empties partition c; key 7: fresh insert
    MergeInto.applyChanges(spark, dir, schema,
      changes((1L, 100L, "a", "u", 1L), (1L, 111L, "a", "u", 2L),
        (2L, 200L, "a", "u", 1L), (2L, 0L, "a", "d", 2L),
        (4L, 0L, "c", "d", 1L), (7L, 70L, "b", "u", 1L)),
      Seq("id"), "p", "op", Seq("seq"))
    assert(state(dir) === Set((1L, 111L, "a"), (3L, 30L, "b"), (7L, 70L, "b")))
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(!m.partitions.contains("c"), "fully-deleted partition must drop")
    assert(m.version === before + 1, "mixed upserts+deletes must be ONE commit")
  }

  test("cdcApplyCommit: streaming apply is exactly-once and replay-safe") {
    import graft.streaming.Streams
    val dir = Files.createTempDirectory("graft-cdc").toString
    val src = Files.createTempDirectory("graft-cdc-src")
    // three change files → three micro-batches (maxFilesPerTrigger=1)
    // distinct mtimes keep FileStreamSource's batch order deterministic
    changes((1L, 10L, "a", "u", 1L), (2L, 20L, "a", "u", 1L)).coalesce(1)
      .write.parquet(src.resolve("b0").toString)
    Thread.sleep(50)
    changes((1L, 11L, "a", "u", 2L), (3L, 30L, "b", "u", 1L)).coalesce(1)
      .write.parquet(src.resolve("b1").toString)
    Thread.sleep(50)
    changes((2L, 0L, "a", "d", 3L)).coalesce(1)
      .write.parquet(src.resolve("b2").toString)
    val checkpoint = Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = spark.readStream.schema(changeSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString + "/*")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.cdcApplyCommit(dir, schema, Seq("id"), "p",
          "op", Seq("seq"))(df, id))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    assert(state(dir) === Set((1L, 11L, "a"), (3L, 30L, "b")),
      "sequential fold of the three change batches")
    // replayed epoch: same batchId again must not even bump the version
    val v = AtomicTable.currentVersion(java.nio.file.Paths.get(dir)).get
    Streams.cdcApplyCommit(dir, schema, Seq("id"), "p", "op", Seq("seq"))(
      changes((1L, 999L, "a", "u", 9L)), 0L)
    assert(AtomicTable.currentVersion(java.nio.file.Paths.get(dir)).get === v,
      "a replayed batchId must be skipped before staging anything")
    assert(state(dir) === Set((1L, 11L, "a"), (3L, 30L, "b")))
  }

  test("a concurrent commit between read and swap aborts the merge") {
    val dir = seed()
    val sneak = () => {
      // lands a competing commit after the merge has read its base
      // version but before its own swap — the classic lost-update race
      AtomicTable.replacePartitions(spark, dir, frame((9L, 90L, "z")), "p")
      ()
    }
    intercept[java.util.ConcurrentModificationException] {
      MergeInto.upsert(spark, dir, schema, frame((2L, 99L, "a")),
        Seq("id"), "p", beforeCommit = sneak)
    }
    // the competing commit survives untouched; the merge left no trace
    assert(state(dir) === Set((1L, 10L, "a"), (2L, 20L, "a"),
      (3L, 30L, "b"), (4L, 40L, "c"), (9L, 90L, "z")))
  }
}
