package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Merge-on-read deletion vectors (etl/MergeInto + AtomicTable.deletes):
  * a vector delete moves no data bytes, readMerged subtracts it, a
  * partition rewrite or materialization folds + clears it, and the GC /
  * vacuum lifecycle pins vector dirs exactly as long as a retained
  * manifest references them. */
class DeleteVectorSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("p", StringType)))

  private def frame(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v", "p")
  }

  private def seed(): String = {
    val dir = Files.createTempDirectory("graft-dv").toString
    AtomicTable.replacePartitions(spark, dir,
      frame((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "c")), "p")
    dir
  }

  private def merged(dir: String): Set[(Long, Long, String)] =
    MergeInto.readMerged(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  private def raw(dir: String): Set[(Long, Long, String)] =
    AtomicTable.read(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("a vector delete moves no data bytes and subtracts at read time") {
    val dir = seed()
    val before = AtomicTable.manifest(Paths.get(dir)).get.partitions
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a"), (4L, 0L, "c")).select("id", "p"), Seq("id"), "p")
    val m = AtomicTable.manifest(Paths.get(dir)).get
    assert(m.partitions === before,
      "every data dir must be carried by reference — a vector delete rewrites nothing")
    assert(m.deletes.keySet === Set("a", "c"))
    assert(merged(dir) === Set((1L, 10L, "a"), (3L, 30L, "b")))
    assert(raw(dir) === Set((1L, 10L, "a"), (2L, 20L, "a"),
      (3L, 30L, "b"), (4L, 40L, "c")), "the raw files still hold the rows")
  }

  test("vectors append per partition and all apply") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((1L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    val m = AtomicTable.manifest(Paths.get(dir)).get
    assert(m.deletes("a").size === 2, "second vector must append, not replace")
    assert(merged(dir) === Set((3L, 30L, "b"), (4L, 40L, "c")))
  }

  test("the locate path places vectors without the partition column") {
    val dir = seed()
    import spark.implicits._
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq(3L).toDF("id"), Seq("id"), "p")
    assert(AtomicTable.manifest(Paths.get(dir)).get.deletes.keySet === Set("b"))
    assert(merged(dir) === Set((1L, 10L, "a"), (2L, 20L, "a"), (4L, 40L, "c")))
  }

  test("deleteWhereMor deletes by predicate over the merged state") {
    val dir = seed()
    MergeInto.deleteWhereMor(spark, dir, schema, col("v") >= 30L, Seq("id"), "p")
    assert(merged(dir) === Set((1L, 10L, "a"), (2L, 20L, "a")))
    // second predicate evaluates against the already-merged state
    MergeInto.deleteWhereMor(spark, dir, schema, col("v") >= 20L, Seq("id"), "p")
    assert(merged(dir) === Set((1L, 10L, "a")))
  }

  test("rewriting a partition folds and clears its vectors; others survive") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((1L, 0L, "a"), (2L, 0L, "a"), (4L, 0L, "c")).select("id", "p"),
      Seq("id"), "p")
    // upsert re-inserts key 2 into partition a: the rewrite must fold
    // the vector (key 1 stays gone) and the EXPLICIT re-insert of key 2
    // must not be re-deleted by a stale vector afterwards
    MergeInto.upsert(spark, dir, schema, frame((2L, 99L, "a")), Seq("id"), "p")
    val m = AtomicTable.manifest(Paths.get(dir)).get
    assert(m.deletes.keySet === Set("c"),
      "the rewritten partition's vector must clear; the untouched one must survive")
    assert(merged(dir) === Set((2L, 99L, "a"), (3L, 30L, "b")))
    assert(raw(dir).contains((4L, 40L, "c")) && !raw(dir).contains((1L, 10L, "a")),
      "partition a was physically rewritten, partition c was not")
  }

  test("materializeDeletes folds everything, drops emptied partitions, clears vectors") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a"), (4L, 0L, "c")).select("id", "p"), Seq("id"), "p")
    val m = MergeInto.materializeDeletes(spark, dir, schema, "p")
    assert(m.deletes.isEmpty, "materialization must clear every folded vector")
    assert(!m.partitions.contains("c"), "a fully-deleted partition must drop")
    assert(raw(dir) === merged(dir),
      "after materialization the raw files ARE the merged state")
    assert(merged(dir) === Set((1L, 10L, "a"), (3L, 30L, "b")))
    // idempotent when nothing is outstanding
    assert(MergeInto.materializeDeletes(spark, dir, schema, "p").version === m.version)
  }

  test("compact folds vectors instead of resurrecting deleted keys") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    AtomicTable.compact(spark, dir, schema, "p")
    val m = AtomicTable.manifest(Paths.get(dir)).get
    assert(m.deletes.isEmpty)
    assert(raw(dir) === Set((1L, 10L, "a"), (3L, 30L, "b"), (4L, 40L, "c")),
      "the compacted files must not resurrect the vector-deleted key")
  }

  test("CoW deleteKeys composes with outstanding vectors") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((1L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    // CoW-delete key 2: rewrites partition a, which must ALSO fold the
    // outstanding vector on a (key 1 must not resurrect)
    MergeInto.deleteKeys(spark, dir, schema,
      frame((2L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    assert(merged(dir) === Set((3L, 30L, "b"), (4L, 40L, "c")))
    assert(raw(dir) === Set((3L, 30L, "b"), (4L, 40L, "c")),
      "partition a emptied by fold+delete must be gone physically too")
  }

  test("gc pins vector dirs while referenced and reclaims them after the fold") {
    val dir = seed()
    val m1 = MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    val dvDir = Paths.get(dir).resolve(m1.deletes("a").head)
    assert(Files.isDirectory(dvDir))
    // an unrelated commit (partition b replaced) prunes manifest v1-v2
    // under retain=1 — the vector dir is still referenced by the new
    // current manifest and must survive its gc
    AtomicTable.replacePartitions(spark, dir, frame((3L, 33L, "b")), "p")
    assert(Files.isDirectory(dvDir),
      "gc must pin a vector dir the current manifest references")
    assert(merged(dir) === Set((1L, 10L, "a"), (3L, 33L, "b"), (4L, 40L, "c")))
    // folding clears the reference; the NEXT commit's gc reclaims it
    MergeInto.materializeDeletes(spark, dir, schema, "p")
    AtomicTable.replacePartitions(spark, dir, frame((3L, 34L, "b")), "p")
    assert(!Files.exists(dvDir),
      "an unreferenced vector dir must be reclaimed by the following gc")
  }

  test("time travel subtracts exactly the vectors each version carried") {
    val dir = Files.createTempDirectory("graft-dv-tt").toString
    AtomicTable.replacePartitions(spark, dir,
      frame((1L, 10L, "a"), (2L, 20L, "a")), "p", retain = 3)
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a")).select("id", "p"), Seq("id"), "p", retain = 3)
    assert(MergeInto.readMergedAt(spark, dir, schema, 1L).collect().length === 2,
      "the pre-vector snapshot must not see a later vector")
    assert(MergeInto.readMergedAt(spark, dir, schema, 2L).collect()
      .map(_.getLong(0)).toSet === Set(1L))
  }

  test("deleteMorCommit: streaming privacy deletes are exactly-once vector appends") {
    import graft.streaming.Streams
    val dir = seed()
    val src = Files.createTempDirectory("graft-dvstream")
    import spark.implicits._
    Seq((2L, "a")).toDF("id", "p").coalesce(1)
      .write.parquet(src.resolve("b0").toString)
    Thread.sleep(50)
    Seq((4L, "c")).toDF("id", "p").coalesce(1)
      .write.parquet(src.resolve("b1").toString)
    val keySchema = StructType(Seq(
      StructField("id", LongType), StructField("p", StringType)))
    val checkpoint = Files.createTempDirectory("graft-dv-ckpt").toString
    val q = spark.readStream.schema(keySchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString + "/*")
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.deleteMorCommit(dir, schema, Seq("id"), "p")(df, id))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    assert(merged(dir) === Set((1L, 10L, "a"), (3L, 30L, "b")))
    val m = AtomicTable.manifest(Paths.get(dir)).get
    assert(m.partitions.keySet === Set("a", "b", "c"),
      "no partition rewritten — the deletes are pure vector appends")
    // replayed epoch: same batchId must not even bump the version
    val v = m.version
    Streams.deleteMorCommit(dir, schema, Seq("id"), "p")(
      frame((1L, 0L, "a")).select("id", "p"), 0L)
    assert(AtomicTable.currentVersion(Paths.get(dir)).get === v)
    assert(merged(dir) === Set((1L, 10L, "a"), (3L, 30L, "b")))
  }

  test("mismatched vector keys are rejected") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((2L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    intercept[IllegalArgumentException] {
      MergeInto.deleteKeysMor(spark, dir, schema,
        frame((3L, 30L, "b")).select("id", "v", "p"), Seq("id", "v"), "p")
    }
  }
}
