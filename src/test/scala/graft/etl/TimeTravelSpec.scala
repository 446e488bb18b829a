package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite

/** Timestamp time travel, the commit-log history view, and RESTORE —
  * all metadata-only operators over AtomicTable's retained manifests. */
class TimeTravelSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", StringType),
    StructField("source", StringType)))

  private def freshTable(): String =
    Files.createTempDirectory("graft-tt").resolve("t").toString

  private def write(table: String, ids: Range, src: String,
      tag: String = "p", retain: Int = 10): Unit =
    AtomicTable.replacePartitions(spark, table,
      ids.map(i => (i.toLong, s"$tag$i", src)).toDF("id", "payload", "source"),
      "source", retain = retain, statsColumns = Seq("id"))

  test("commit timestamps are strictly monotonic and readAsOf resolves them") {
    val table = freshTable()
    val root = Paths.get(table)
    write(table, 1 to 10, "a")        // v1
    write(table, 1 to 10, "b")        // v2
    write(table, 11 to 20, "a", "q")  // v3 replaces partition a
    val ts = (1L to 3L).map(v => AtomicTable.commitTimeMs(root, v))
    assert(ts == ts.sorted && ts.distinct.size == 3,
      s"commit times must strictly increase, got $ts")

    // exact commit instant -> that version; between commits -> the earlier
    assert(AtomicTable.versionAsOf(root, ts(1)) === Some(2L))
    assert(AtomicTable.versionAsOf(root, ts(2) - 1) === Some(2L))
    assert(AtomicTable.versionAsOf(root, ts(0)) === Some(1L))
    assert(AtomicTable.versionAsOf(root, ts(0) - 1) === None)
    assert(AtomicTable.versionAsOf(root, ts(2) + 1000000) === Some(3L))

    val atV2 = AtomicTable.readAsOf(spark, table, schema, ts(1))
    assert(atV2.count() === 20)
    assert(atV2.filter(col("source") === "a" && col("payload").startsWith("p"))
      .count() === 10)
    intercept[IllegalArgumentException] {
      AtomicTable.readAsOf(spark, table, schema, ts(0) - 1)
    }
  }

  test("history lists retained commits newest-first with operation and row totals") {
    val table = freshTable()
    val root = Paths.get(table)
    write(table, 1 to 10, "a")
    write(table, 1 to 5, "b")
    AtomicTable.compact(spark, table, schema, "source", retain = 10)
    val h = AtomicTable.history(root)
    assert(h.map(_.version) === Seq(3L, 2L, 1L))
    assert(h.map(_.operation) === Seq("compact", "write", "write"))
    assert(h.head.numPartitions === 2)
    // every partition was written with statsColumns -> row totals known
    assert(h.map(_.rows) === Seq(Some(15L), Some(15L), Some(10L)))
    assert(h.map(_.tsMs) === h.map(_.tsMs).sorted.reverse)
  }

  test("restore commits the old snapshot as a new version, data and stats intact") {
    val table = freshTable()
    val root = Paths.get(table)
    write(table, 1 to 10, "a")               // v1: a only
    write(table, 1 to 5, "b")                // v2: a + b
    write(table, 100 to 120, "a", "bad")     // v3: clobbers a
    write(table, 200 to 210, "c", "bad")     // v4: adds c
    val m = AtomicTable.restore(root, 2L, retain = 10)
    assert(m.version === 5L)
    assert(m.operation === "restore(v2)")
    val df = AtomicTable.read(spark, table, schema)
    assert(df.count() === 15)
    assert(df.filter(col("payload").startsWith("bad")).count() === 0)
    assert(df.filter(col("source") === "c").count() === 0)
    // stats restored with the snapshot: zone maps prune like they did at v2
    assert(m.stats.keySet === Set("a", "b"))
    assert(m.stats("a").rows === 10L)
    // the bad history stays readable inside retention (nothing rewound)
    assert(AtomicTable.readAt(spark, table, schema, 3L)
      .filter(col("payload").startsWith("bad")).count() === 21)
    assert(AtomicTable.history(root).head.operation === "restore(v2)")
  }

  test("restore carries the snapshot's delete vectors and aborts on a racing commit") {
    val table = freshTable()
    val root = Paths.get(table)
    write(table, 1 to 10, "a")
    MergeInto.deleteKeysMor(spark, table, schema,
      Seq(3L, 7L).map(i => (i, "a")).toDF("id", "source"),
      Seq("id"), "source", retain = 10)     // v2: vectors hide 3 and 7
    write(table, 1 to 10, "b")              // v3
    val m = AtomicTable.restore(root, 2L, retain = 10)
    assert(m.deletes.keySet === Set("a"))
    val df = MergeInto.readMerged(spark, table, schema)
    assert(df.count() === 8)
    assert(df.filter(col("id").isin(3L, 7L)).count() === 0)

    // a stale restore premise must not clobber a fresh commit
    intercept[java.util.ConcurrentModificationException] {
      val cur = AtomicTable.manifest(root).get
      AtomicTable.commitManifest(root, Map.empty,
        properties = Map("racer" -> "1"), retain = 10)
      AtomicTable.commitManifest(root, cur.partitions,
        expectedVersion = Some(cur.version), retain = 10,
        operation = "restore(stale)")
    }
  }

  test("restored data dirs survive the commit's GC at tight retention") {
    val table = freshTable()
    val root = Paths.get(table)
    write(table, 1 to 10, "a", retain = 10)
    write(table, 11 to 20, "a", "x", retain = 10)
    // tight retention on the restore itself: v1's manifest may age out,
    // but v3 references v1's data dirs, so the bytes must survive GC
    AtomicTable.restore(root, 1L, retain = 2)
    val df = AtomicTable.read(spark, table, schema)
    assert(df.count() === 10)
    assert(df.filter(col("payload").startsWith("p")).count() === 10)
  }
}
