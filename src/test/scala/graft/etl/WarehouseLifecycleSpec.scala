package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** UPDATE ... SET (MergeInto.updateWhere), schema-evolution reads
  * (AtomicTable.readEvolved), and write-time expectations
  * (etl/Expectations): the remaining warehouse-lifecycle operators. */
class WarehouseLifecycleSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("p", StringType)))

  private def frame(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v", "p")
  }

  private def seed(): String = {
    val dir = Files.createTempDirectory("graft-upd").toString
    AtomicTable.replacePartitions(spark, dir,
      frame((1L, 10L, "a"), (2L, 20L, "a"), (3L, 30L, "b"), (4L, 40L, "c")), "p")
    dir
  }

  private def state(dir: String): Set[(Long, Long, String)] =
    MergeInto.readMerged(spark, dir, schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("updateWhere rewrites only matching rows, only touched partitions") {
    val dir = seed()
    val before = AtomicTable.manifest(Paths.get(dir)).get.partitions
    MergeInto.updateWhere(spark, dir, schema, col("v") >= 20L && col("v") < 40L,
      Map("v" -> (col("v") * 10L)), "p")
    assert(state(dir) === Set((1L, 10L, "a"), (2L, 200L, "a"),
      (3L, 300L, "b"), (4L, 40L, "c")))
    val after = AtomicTable.manifest(Paths.get(dir)).get.partitions
    assert(after("c") === before("c"),
      "a partition with no matching row must keep its exact data dir")
    assert(after("a") !== before("a"))
    assert(after("b") !== before("b"))
  }

  test("updateWhere with no matches burns no version") {
    val dir = seed()
    val v = AtomicTable.currentVersion(Paths.get(dir)).get
    MergeInto.updateWhere(spark, dir, schema, col("v") > 1000L,
      Map("v" -> lit(0L)), "p")
    assert(AtomicTable.currentVersion(Paths.get(dir)).get === v)
  }

  test("updateWhere rejects partition-column and unknown assignments") {
    val dir = seed()
    intercept[IllegalArgumentException] {
      MergeInto.updateWhere(spark, dir, schema, lit(true),
        Map("p" -> lit("z")), "p")
    }
    intercept[IllegalArgumentException] {
      MergeInto.updateWhere(spark, dir, schema, lit(true),
        Map("nope" -> lit(1L)), "p")
    }
  }

  test("updateWhere folds outstanding delete vectors on the partitions it rewrites") {
    val dir = seed()
    MergeInto.deleteKeysMor(spark, dir, schema,
      frame((1L, 0L, "a")).select("id", "p"), Seq("id"), "p")
    MergeInto.updateWhere(spark, dir, schema, col("id") === 2L,
      Map("v" -> lit(99L)), "p")
    assert(state(dir) === Set((2L, 99L, "a"), (3L, 30L, "b"), (4L, 40L, "c")),
      "the rewrite must not resurrect the vector-deleted key")
    assert(AtomicTable.manifest(Paths.get(dir)).get.deletes.isEmpty)
  }

  private val evolved = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),     // was int in v1 files: widened
    StructField("p", StringType),
    StructField("tag", StringType))) // absent in v1 files: null-filled

  test("readEvolved null-fills pre-evolution partitions and widens narrow history") {
    val dir = Files.createTempDirectory("graft-evo").toString
    import spark.implicits._
    // v1: three columns, v as INT
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, 10, "a"), (2L, 20, "b")).toDF("id", "v", "p"), "p")
    // v2: a NEW partition arrives with the evolved shape — old files
    // are not rewritten (metadata-only evolution)
    val before = AtomicTable.manifest(Paths.get(dir)).get.partitions
    AtomicTable.replacePartitions(spark, dir,
      Seq((3L, 30L, "c", "fresh")).toDF("id", "v", "p", "tag"), "p")
    val after = AtomicTable.manifest(Paths.get(dir)).get.partitions
    assert(after("a") === before("a") && after("b") === before("b"))
    val rows = AtomicTable.readEvolved(spark, dir, evolved)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(rows === Set((1L, 10L, "a", None), (2L, 20L, "b", None),
      (3L, 30L, "c", Some("fresh"))))
    // the strict read still fails loudly on the absent column (a typo
    // must not silently become a null column)
    intercept[org.apache.spark.sql.AnalysisException] {
      AtomicTable.read(spark, dir, evolved).collect()
    }
  }

  test("admitPartitions: zone maps admit only partitions whose bounds hold a key") {
    val dir = Files.createTempDirectory("graft-admit").toString
    // range-clustered table: each partition covers a disjoint id range,
    // with zone maps tracked on id
    AtomicTable.replacePartitions(spark, dir,
      frame((1L, 1L, "a"), (10L, 1L, "a"), (11L, 1L, "b"), (20L, 1L, "b"),
        (21L, 1L, "c"), (30L, 1L, "c")), "p", statsColumns = Seq("id"))
    val m = AtomicTable.manifest(Paths.get(dir)).get
    assert(AtomicTable.admitPartitions(m, schema, "id", Seq("5", "25")) ===
      Set("a", "c"))
    assert(AtomicTable.admitPartitions(m, schema, "id", Seq("15")) === Set("b"))
    assert(AtomicTable.admitPartitions(m, schema, "id", Seq("99")) === Set())
    // a partition without stats is conservatively admitted
    AtomicTable.replacePartitions(spark, dir, frame((40L, 1L, "d")), "p")
    val m2 = AtomicTable.manifest(Paths.get(dir)).get
    assert(AtomicTable.admitPartitions(m2, schema, "id", Seq("99")) === Set("d"))
  }

  test("key-located deletes on a clustered table stay correct under the pruned locate") {
    val dir = Files.createTempDirectory("graft-locate").toString
    AtomicTable.replacePartitions(spark, dir,
      frame((1L, 1L, "a"), (10L, 2L, "a"), (11L, 3L, "b"), (20L, 4L, "b"),
        (21L, 5L, "c"), (30L, 6L, "c")), "p", statsColumns = Seq("id"))
    import spark.implicits._
    // CoW path: keys without partitions, zone maps bound the locate
    MergeInto.deleteKeys(spark, dir, schema,
      Seq(10L, 21L).toDF("id"), Seq("id"), "p")
    assert(MergeInto.readMerged(spark, dir, schema).collect()
      .map(_.getLong(0)).toSet === Set(1L, 11L, 20L, 30L))
    // MOR path: same pruning, vector placed on the right partition
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq(20L).toDF("id"), Seq("id"), "p")
    assert(AtomicTable.manifest(Paths.get(dir)).get.deletes.keySet === Set("b"))
    assert(MergeInto.readMerged(spark, dir, schema).collect()
      .map(_.getLong(0)).toSet === Set(1L, 11L, 30L))
  }

  test("expectations: fail mode counts and aborts before any byte stages") {
    val dir = Files.createTempDirectory("graft-exp").toString
    val bad = frame((1L, 10L, "a"), (2L, -5L, "a"), (3L, -1L, "b"))
    val ex = intercept[Expectations.ViolationException] {
      Expectations.commitChecked(spark, dir, bad, "p",
        Map("v_nonneg" -> (col("v") >= 0L), "id_set" -> col("id").isNotNull))
    }
    assert(ex.report.violations === Map("v_nonneg" -> 2L, "id_set" -> 0L))
    assert(AtomicTable.manifest(Paths.get(dir)).isEmpty,
      "a failed batch must not commit — or even stage — anything")
    // null expectation result passes (ANSI CHECK tri-state)
    val rep = Expectations.check(
      frame((1L, 10L, "a")).withColumn("v", lit(null).cast("long")),
      Map("v_nonneg" -> (col("v") >= 0L)))
    assert(rep.violations("v_nonneg") === 0L)
  }

  test("expectations: drop mode filters, checked commit records the audit") {
    val dir = Files.createTempDirectory("graft-exp2").toString
    val mixed = frame((1L, 10L, "a"), (2L, -5L, "a"), (3L, 30L, "b"))
    val kept = Expectations.dropInvalid(mixed, Map("v_nonneg" -> (col("v") >= 0L)))
    val m = Expectations.commitChecked(spark, dir, kept, "p",
      Map("v_nonneg" -> (col("v") >= 0L)))
    assert(m.properties("expect.v_nonneg") === "0")
    assert(state(dir) === Set((1L, 10L, "a"), (3L, 30L, "b")))
  }
}
