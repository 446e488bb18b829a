package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.SparkSuite
import graft.streaming.Streams

/** Warehouse maintenance + streaming-sink specs: file compaction and the
  * exactly-once foreachBatch commit, both over AtomicTable's atomic
  * version-swap protocol. */
class WarehouseOpsSpec extends SparkSuite {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-wh").resolve("t").toString

  test("compact bin-packs files per partition without changing data") {
    val table = freshTable()
    // 4 shuffle partitions x 3 partition values -> several files each
    val rows = (1 to 1200)
      .map(i => (i.toLong, s"v$i", s"src${i % 3}"))
      .toDF("id", "payload", "source")
      .repartition(4)
    AtomicTable.replacePartitions(spark, table, rows, "source")
    val root = Paths.get(table)
    val before = AtomicTable.dataFileCount(root)
    assert(before > 3, s"expected multiple files per partition, got $before")

    val schema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("payload", org.apache.spark.sql.types.StringType),
      StructField("source", org.apache.spark.sql.types.StringType)))
    val v = AtomicTable.currentVersion(root).get
    AtomicTable.compact(spark, table, schema, "source")

    assert(AtomicTable.dataFileCount(root) === 3L) // one file per partition
    assert(AtomicTable.currentVersion(root).get === v + 1)
    val after = AtomicTable.read(spark, table, schema)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after === (1 to 1200).map(i => (i.toLong, s"v$i", s"src${i % 3}")).toSet)
  }

  test("zone-map stats: readPruned skips partitions from metadata alone, " +
      "stays exact, and never trusts stale stats") {
    val table = freshTable()
    val schema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("v", org.apache.spark.sql.types.LongType),
      StructField("part", org.apache.spark.sql.types.StringType)))
    // three partitions with disjoint v ranges, zone maps tracked
    val rows = ((1L to 100L).map(i => (i, i, "p1")) ++
      (1L to 100L).map(i => (i, i + 1000L, "p2")) ++
      (1L to 100L).map(i => (i, i + 2000L, "p3"))).toDF("id", "v", "part")
    AtomicTable.replacePartitions(spark, table, rows, "part",
      statsColumns = Seq("v"))
    val m = AtomicTable.manifest(Paths.get(table)).get
    assert(m.stats("p2") === AtomicTable.PartStats(100L,
      Map("v" -> "1001"), Map("v" -> "1100")))

    // the range hits only p2: the scan must touch ONLY p2's files
    val pruned = AtomicTable.readPruned(spark, table, schema,
      "v", "1001", "1100")
    assert(pruned.inputFiles.forall(_.contains("part=p2")),
      s"pruned scan read outside p2: ${pruned.inputFiles.toSeq}")
    assert(pruned.count() === 100L)
    // the residual filter keeps the result exact within a partition
    assert(AtomicTable.readPruned(spark, table, schema, "v", "1050", "1060")
      .count() === 11L)
    // a range outside every zone map reads nothing
    assert(AtomicTable.readPruned(spark, table, schema, "v", "9000", "9999")
      .count() === 0L)

    // replace p2 WITHOUT stats: its zone map must drop, and readPruned
    // must conservatively read it again (stale stats would wrongly prune
    // the new v=5000 row)
    AtomicTable.replacePartitions(spark, table,
      Seq((1L, 5000L, "p2")).toDF("id", "v", "part"), "part")
    val m2 = AtomicTable.manifest(Paths.get(table)).get
    assert(!m2.stats.contains("p2"))
    assert(m2.stats.contains("p1"), "untouched partitions keep their stats")
    assert(AtomicTable.readPruned(spark, table, schema, "v", "5000", "5000")
      .count() === 1L)
  }

  test("zone-map stats key by the MANIFEST partition name, immune to " +
      "partition-value type inference") {
    // "00123" and "123" are distinct string partitions but the same
    // value under spark's dir-name type inference — stats keyed through
    // an inferred read would orphan one and cross-wire the other
    val table = freshTable()
    val schema = StructType(Seq(
      StructField("v", org.apache.spark.sql.types.LongType),
      StructField("part", org.apache.spark.sql.types.StringType)))
    // space/colon exercise Hive path escaping; the '+' pair exercises
    // the percent-only decoding ('a+b:c' form-decodes to 'a b:c' — a
    // URL-style decoder would collapse the two partitions onto one key)
    val rows = (Seq((1L, "00123"), (2L, "00123"), (1000L, "123"),
      (7L, "a b:c"), (8L, "a+b:c")))
      .toDF("v", "part")
    AtomicTable.replacePartitions(spark, table, rows, "part",
      statsColumns = Seq("v"))
    val m = AtomicTable.manifest(Paths.get(table)).get
    assert(m.stats("00123") === AtomicTable.PartStats(2L,
      Map("v" -> "1"), Map("v" -> "2")))
    assert(m.stats("123") === AtomicTable.PartStats(1L,
      Map("v" -> "1000"), Map("v" -> "1000")))
    assert(m.stats("a b:c") === AtomicTable.PartStats(1L,
      Map("v" -> "7"), Map("v" -> "7")))
    assert(m.stats("a+b:c") === AtomicTable.PartStats(1L,
      Map("v" -> "8"), Map("v" -> "8")))
    // the partition column itself is not a legal stats column
    intercept[IllegalArgumentException] {
      AtomicTable.replacePartitions(spark, table, rows, "part",
        statsColumns = Seq("part"))
    }
    // a read for v=1000 must NOT be pruned away by 00123's bounds
    assert(AtomicTable.readPruned(spark, table, schema, "v", "1000", "1000")
      .count() === 1L)
  }

  test("zone maps on DATE columns: ISO-string bounds order correctly " +
      "and prune partitions by date range") {
    val table = freshTable()
    val schema = StructType(Seq(
      StructField("d", org.apache.spark.sql.types.DateType),
      StructField("part", org.apache.spark.sql.types.StringType)))
    // month partitions with disjoint date ranges; ISO text order == date
    // order, which is what statsCompare relies on for DateType
    val rows = Seq(
      ("2025-01-05", "m1"), ("2025-01-28", "m1"),
      ("2025-02-02", "m2"), ("2025-02-27", "m2"),
      ("2025-12-31", "m12"), ("2025-12-01", "m12"))
      .toDF("ds", "part")
      .select(to_date(col("ds")).as("d"), col("part"))
    AtomicTable.replacePartitions(spark, table, rows, "part",
      statsColumns = Seq("d"))
    val m = AtomicTable.manifest(Paths.get(table)).get
    assert(m.stats("m12") === AtomicTable.PartStats(2L,
      Map("d" -> "2025-12-01"), Map("d" -> "2025-12-31")))
    val feb = AtomicTable.readPruned(spark, table, schema,
      "d", "2025-02-01", "2025-02-28")
    assert(feb.inputFiles.forall(_.contains("part=m2")),
      s"date zone maps failed to prune: ${feb.inputFiles.toSeq}")
    assert(feb.count() === 2L)
    // "2025-1x" style lexicographic traps: December must NOT be read for
    // a January range (would happen if "2025-12-01" < "2025-02-01"
    // compared wrongly)
    val jan = AtomicTable.readPruned(spark, table, schema,
      "d", "2025-01-01", "2025-01-31")
    assert(jan.inputFiles.forall(_.contains("part=m1")))
    assert(jan.count() === 2L)
  }

  test("z-order layout + zone maps compose: a range read over the " +
      "clustered key prunes most partitions from metadata") {
    val table = freshTable()
    val schema = StructType(Seq(
      StructField("x", org.apache.spark.sql.types.LongType),
      StructField("y", org.apache.spark.sql.types.LongType),
      StructField("zbin", org.apache.spark.sql.types.LongType)))
    // cluster rows by z-value, derive a partition id from the SAME
    // ordering, and commit with zone maps on x: clustering is what makes
    // the per-partition [min,max] of x tight enough to prune on
    val rows = (0L until 4096L).map(i => (i % 64, i / 64)).toDF("x", "y")
    val clustered = graft.ops.Layout.clusterByZ(rows, "x", "y", n = 16)
    val withBin = clustered
      .withColumn("zbin", org.apache.spark.sql.functions.spark_partition_id()
        .cast("long"))
    AtomicTable.replacePartitions(spark, table, withBin, "zbin",
      statsColumns = Seq("x", "y"))
    val m = AtomicTable.manifest(Paths.get(table)).get
    assert(m.partitions.size === 16)
    // a tight x-range read touches only the partitions whose z-boxes
    // intersect it — at most half the table, typically far less
    val pruned = AtomicTable.readPruned(spark, table, schema, "x", "0", "7")
    val touched = pruned.inputFiles
      .flatMap(f => "zbin=(\\d+)".r.findFirstMatchIn(f).map(_.group(1)))
      .toSet
    assert(touched.size <= 8,
      s"z-order zone maps should prune most partitions, touched $touched")
    assert(pruned.count() === rows.filter($"x" <= 7).count())
    // BOTH clustered dimensions bounded: the conjunction of box tests
    // keeps strictly fewer partitions than either bound alone
    val box = AtomicTable.readPrunedMulti(spark, table, schema,
      Seq(("x", "0", "7"), ("y", "0", "7")))
    val touched2 = box.inputFiles
      .flatMap(f => "zbin=(\\d+)".r.findFirstMatchIn(f).map(_.group(1)))
      .toSet
    assert(touched2.size < touched.size,
      s"2-D bounds must prune further: $touched2 vs $touched")
    assert(box.count() ===
      rows.filter($"x" <= 7 && $"y" <= 7).count())
  }

  test("compactFragmented rewrites only fragmented partitions; healthy " +
      "partition bytes are untouched") {
    val table = freshTable()
    val schema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("part", org.apache.spark.sql.types.StringType)))
    // p1 committed in one file; p2 fragmented across 4 files
    AtomicTable.replacePartitions(spark, table,
      (1L to 50L).map((_, "p1")).toDF("id", "part").coalesce(1), "part")
    AtomicTable.replacePartitions(spark, table,
      (1L to 400L).map((_, "p2")).toDF("id", "part").repartition(4), "part")
    val root = Paths.get(table)
    val m = AtomicTable.manifest(root).get
    val p1DirBefore = m.partitions("p1")

    AtomicTable.compactFragmented(spark, table, schema, "part", minFiles = 3)
    val m2 = AtomicTable.manifest(root).get
    assert(m2.partitions("p1") === p1DirBefore,
      "healthy partition must be carried forward by reference, not rewritten")
    assert(m2.partitions("p2") !== m.partitions("p2"))
    // p2 now one file; total data identical
    val p2Files = Files.list(root.resolve(m2.partitions("p2").head))
    try assert(p2Files.filter(_.getFileName.toString.endsWith(".parquet"))
      .count() === 1L)
    finally p2Files.close()
    assert(AtomicTable.read(spark, table, schema).count() === 450L)

    // nothing fragmented -> no new version
    val v = AtomicTable.currentVersion(root).get
    AtomicTable.compactFragmented(spark, table, schema, "part", minFiles = 3)
    assert(AtomicTable.currentVersion(root).get === v)
  }

  test("exactlyOnceBatchCommit: replayed batch is a no-op, epochs append") {
    val table = freshTable()
    val root = Paths.get(table)
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")

    Streams.exactlyOnceBatchCommit(table)(b0, 0L)
    val v1 = AtomicTable.currentVersion(root).get
    // at-least-once replay of the same epoch: must not write or bump
    Streams.exactlyOnceBatchCommit(table)(b0, 0L)
    assert(AtomicTable.currentVersion(root).get === v1)
    assert(AtomicTable.manifest(root).get.properties("last_batch_id") === "0")

    Streams.exactlyOnceBatchCommit(table)(b1, 1L)
    assert(AtomicTable.manifest(root).get.properties("last_batch_id") === "1")
    val schema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("v", org.apache.spark.sql.types.StringType),
      StructField("batch_id", IntegerType)))
    val all = AtomicTable.read(spark, table, schema)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(all === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("incrementalAggCommit: streaming view maintenance equals full recompute; replay is a no-op") {
    import graft.ops.IncrAgg
    val table = freshTable()
    val b0 = Seq(("a", 1.5), ("a", 2.25), ("b", 3.0)).toDF("k", "v")
    val b1 = Seq(("a", 4.0), ("c", 5.5)).toDF("k", "v")
    val sink = Streams.incrementalAggCommit(table, Seq("k"), "v") _
    sink(b0, 0L)
    sink(b0, 0L) // at-least-once replay: must not double-count
    sink(b1, 1L)

    val stateSchema = StructType(Seq(
      StructField("k", org.apache.spark.sql.types.StringType),
      StructField("n", org.apache.spark.sql.types.LongType),
      StructField("s", org.apache.spark.sql.types.DecimalType(38, 4)),
      StructField("ss", org.apache.spark.sql.types.DecimalType(38, 8)),
      StructField("part", org.apache.spark.sql.types.StringType)))
    val maintained = IncrAgg.merge(
      AtomicTable.read(spark, table, stateSchema).drop("part"), Seq("k"))
      .orderBy("k").collect().toSeq
    val recomputed = IncrAgg.merge(
      IncrAgg.state(b0.unionByName(b1), Seq("k"), "v"), Seq("k"))
      .orderBy("k").collect().toSeq
    assert(maintained === recomputed)
    assert(maintained.map(_.getAs[Long]("n_total")).sum === 5L)
  }

  test("readAt time travel works inside the retention window, refuses outside") {
    val table = freshTable()
    val root = Paths.get(table)
    val schema = StructType(Seq(
      StructField("id", org.apache.spark.sql.types.LongType),
      StructField("v", org.apache.spark.sql.types.StringType),
      StructField("part", org.apache.spark.sql.types.StringType)))
    def commit(v: String, retain: Int) =
      AtomicTable.replacePartitions(spark, table,
        Seq((1L, v, "p1")).toDF("id", "v", "part"), "part", retain = retain)

    commit("a", retain = 3) // v1
    commit("b", retain = 3) // v2
    assert(AtomicTable.readAt(spark, table, schema, 1L)
      .select("v").as[String].head() === "a")
    assert(AtomicTable.read(spark, table, schema)
      .select("v").as[String].head() === "b")

    commit("c", retain = 2) // v3: window is {2, 3} — v1 ages out
    assert(AtomicTable.readAt(spark, table, schema, 2L)
      .select("v").as[String].head() === "b")
    intercept[IllegalArgumentException] {
      AtomicTable.readAt(spark, table, schema, 1L)
    }
  }

  test("ingestToWarehouse lands the events stream exactly once") {
    val table = freshTable()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    // stage nanos->µs (streaming file sources need a schema-stable dir)
    val src = Files.createTempDirectory("graft-ev-src").toString
    graft.Tables.events(spark, sf0001).write.mode("overwrite").parquet(src)
    Streams.ingestToWarehouse(spark, src, table, ckpt)

    val schema = StructType(Streams.eventsSchema.fields :+
      StructField("batch_id", IntegerType))
    val landed = AtomicTable.read(spark, table, schema)
    val expected = spark.read.parquet(src).count()
    assert(landed.count() === expected)

    // a second AvailableNow run over the same checkpoint finds no new
    // files: no new batches, no new versions, count unchanged
    val v = AtomicTable.currentVersion(Paths.get(table)).get
    Streams.ingestToWarehouse(spark, src, table, ckpt)
    assert(AtomicTable.currentVersion(Paths.get(table)).get === v)
    assert(AtomicTable.read(spark, table, schema).count() === expected)
  }
}
