package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Multi-level partitioning through the Scala ETL API: a table
  * partitioned by SEVERAL identity columns ("c1,c2" specs), with the
  * composite manifest keys, nested `c1=v1/c2=v2` data dirs, zone maps,
  * row-level rewrites, vectors, compaction and retention GC all
  * holding the single-level contracts per level. */
class MultiPartitionSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType),
    StructField("ym", StringType),
    StructField("status", StringType)))

  private def fresh(): String =
    Files.createTempDirectory("graft-mp").resolve("t").toString

  private def seed(n: Int = 60) = (1 to n).map(i =>
    (i.toLong, i * 1.5, s"1995-0${i % 3 + 1}", if (i % 2 == 0) "F" else "O"))
    .toDF("id", "v", "ym", "status")

  test("key helpers: single-level keys never split, multi-level roundtrip") {
    assert(AtomicTable.partCols("ym") === Seq("ym"))
    assert(AtomicTable.partCols("ym, status") === Seq("ym", "status"))
    assert(AtomicTable.partKey(Seq("a/b")) === "a/b",
      "a single-level value may contain '/' and stays verbatim")
    assert(AtomicTable.partKeyValues("a/b", 1) === Seq("a/b"))
    val k = AtomicTable.partKey(Seq("1995-01", "with/slash"))
    assert(AtomicTable.partKeyValues(k, 2) === Seq("1995-01", "with/slash"),
      "multi-level values roundtrip through hive escaping")
    assert(AtomicTable.txnDirOf("data/txn-x/a=1/b=2") === "data/txn-x")
    assert(AtomicTable.partColsOfDir("data/txn-x/a=1/b=2") === Seq("a", "b"))
  }

  test("two-level replace: composite keys, nested dirs, full read-back") {
    val t = fresh()
    val m = AtomicTable.replacePartitions(spark, t, seed(), "ym,status")
    assert(m.partitions.keySet === Set(
      "1995-01/F", "1995-01/O", "1995-02/F", "1995-02/O",
      "1995-03/F", "1995-03/O"))
    m.allDirs.foreach { d =>
      assert(d.matches("data/txn-[^/]+/ym=[^/]+/status=[^/]+"), d)
    }
    val back = AtomicTable.read(spark, t, schema)
    assert(back.count() === 60L)
    assert(back.as[(Long, Double, String, String)].collect().toSet ===
      seed().as[(Long, Double, String, String)].collect().toSet)
  }

  test("append extends one composite partition, others untouched") {
    val t = fresh()
    AtomicTable.replacePartitions(spark, t, seed(), "ym,status", retain = 5)
    val m1 = AtomicTable.manifest(Paths.get(t)).get
    AtomicTable.appendPartitions(spark, t,
      Seq((100L, 9.9, "1995-01", "F")).toDF("id", "v", "ym", "status"),
      "ym,status", retain = 5)
    val m2 = AtomicTable.manifest(Paths.get(t)).get
    assert(m2.partitions("1995-01/F").size ===
      m1.partitions("1995-01/F").size + 1)
    assert(m2.partitions("1995-02/O") === m1.partitions("1995-02/O"))
    assert(AtomicTable.read(spark, t, schema).count() === 61L)
  }

  test("zone maps key by composite partition and prune reads") {
    val t = fresh()
    AtomicTable.replacePartitions(spark, t, seed(), "ym,status",
      statsColumns = Seq("id"))
    val m = AtomicTable.manifest(Paths.get(t)).get
    assert(m.stats.keySet === m.partitions.keySet)
    val total = m.stats.values.map(_.rows).sum
    assert(total === 60L)
    // ids are interleaved across partitions; a range that only one
    // composite admits reads only it
    val admitted = m.partitions.keySet.filter { p =>
      val s = m.stats(p)
      s.mins("id").toLong <= 2L && s.maxs("id").toLong >= 2L
    }
    val pruned = AtomicTable.readPruned(spark, t, schema, "id", "2", "2")
    assert(pruned.count() === 1L)
    assert(admitted.nonEmpty)
  }

  test("upsert and deleteKeys rewrite only touched composite partitions") {
    val t = fresh()
    AtomicTable.replacePartitions(spark, t, seed(), "ym,status", retain = 5)
    val m1 = AtomicTable.manifest(Paths.get(t)).get
    // reprice id=4 (1995-02/F): exactly one composite partition rewrites
    MergeInto.upsert(spark, t, schema,
      Seq((4L, 99.0, "1995-02", "F")).toDF("id", "v", "ym", "status"),
      Seq("id"), "ym,status", retain = 5)
    val m2 = AtomicTable.manifest(Paths.get(t)).get
    assert(m2.partitions("1995-02/F") !== m1.partitions("1995-02/F"))
    assert(m2.partitions.filter(_._1 != "1995-02/F") ===
      m1.partitions.filter(_._1 != "1995-02/F"),
      "untouched composites carried by reference")
    val got = AtomicTable.read(spark, t, schema)
      .filter(col("id") === 4L).select("v").as[Double].collect()
    assert(got.toSeq === Seq(99.0))
    // delete all of 1995-01/O by key (keys carry both partition cols)
    val gone = AtomicTable.read(spark, t, schema)
      .filter(col("ym") === "1995-01" && col("status") === "O")
      .select("id", "ym", "status")
    MergeInto.deleteKeys(spark, t, schema, gone, Seq("id"), "ym,status",
      retain = 5)
    val m3 = AtomicTable.manifest(Paths.get(t)).get
    assert(!m3.partitions.contains("1995-01/O"),
      "fully-deleted composite partition drops from the manifest")
    assert(AtomicTable.read(spark, t, schema)
      .filter(col("ym") === "1995-01" && col("status") === "O").count() === 0L)
  }

  test("merge-on-read vectors and their fold work per composite partition") {
    val t = fresh()
    AtomicTable.replacePartitions(spark, t, seed(), "ym,status", retain = 5)
    MergeInto.deleteKeysMor(spark, t, schema,
      Seq((2L, "1995-03", "F"), (3L, "1995-01", "O"))
        .toDF("id", "ym", "status"),
      Seq("id"), "ym,status", retain = 5)
    val m = AtomicTable.manifest(Paths.get(t)).get
    assert(m.deletes.keySet === Set("1995-03/F", "1995-01/O"))
    val merged = MergeInto.readMerged(spark, t, schema)
    assert(merged.count() === 58L)
    assert(merged.filter(col("id").isin(2L, 3L)).count() === 0L)
    // fold: vectors clear, rows stay gone
    MergeInto.materializeDeletes(spark, t, schema, "ym,status")
    val m2 = AtomicTable.manifest(Paths.get(t)).get
    assert(m2.deletes.isEmpty)
    assert(AtomicTable.read(spark, t, schema).count() === 58L)
  }

  test("compact bin-packs each composite partition and GC clears old levels") {
    val t = fresh()
    AtomicTable.replacePartitions(spark, t, seed().repartition(4),
      "ym,status", retain = 1)
    val root = Paths.get(t)
    assert(AtomicTable.dataFileCount(root) > 6L)
    AtomicTable.compact(spark, t, schema, "ym,status", retain = 1)
    assert(AtomicTable.dataFileCount(root) === 6L)
    assert(AtomicTable.read(spark, t, schema).count() === 60L)
    // retain=1 GC'd the seed commit: its txn dir (and the nested value
    // levels inside it) must be gone from disk entirely
    val live = AtomicTable.manifest(root).get.allDirs
      .map(AtomicTable.txnDirOf).toSet
    val dataDir = root.resolve("data")
    val onDisk = {
      val s = Files.list(dataDir)
      try {
        val b = Seq.newBuilder[String]
        s.forEach(p => b += s"data/${p.getFileName}")
        b.result()
      } finally s.close()
    }
    assert(onDisk.toSet === live, s"stale staging levels: $onDisk vs $live")
  }

  test("cdc applyChanges resolves per-key and lands on composite partitions") {
    val t = fresh()
    AtomicTable.replacePartitions(spark, t, seed(6), "ym,status", retain = 5)
    // id=1 (1995-02/O): two changes, later seq wins; id=2: delete
    val changes = Seq(
      (1L, 10.0, "1995-02", "O", "u", 1L),
      (1L, 11.0, "1995-02", "O", "u", 2L),
      (2L, 0.0, "1995-03", "F", "d", 1L))
      .toDF("id", "v", "ym", "status", "op", "seq")
    MergeInto.applyChanges(spark, t, schema, changes, Seq("id"),
      "ym,status", "op", Seq("seq"), retain = 5)
    val out = AtomicTable.read(spark, t, schema)
    assert(out.filter(col("id") === 1L).select("v").as[Double]
      .collect().toSeq === Seq(11.0))
    assert(out.filter(col("id") === 2L).count() === 0L)
    assert(out.count() === 5L)
  }
}
