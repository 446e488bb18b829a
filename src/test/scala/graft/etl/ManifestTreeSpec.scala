package graft.etl

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** The two-tier metadata tree (manifest ROOT + immutable per-partition
  * blobs — the Iceberg manifest-list shape): commits write O(touched)
  * metadata files over a many-partition table, pruned planning reads
  * only the admitted partitions' blobs, pre-split (format 1) manifests
  * read and upgrade transparently, and blob GC/vacuum follow the same
  * once-committed / age-gate discipline as data dirs. This is the pin
  * for the r11 scale finding: a one-JSON-per-version manifest made
  * every commit re-render O(table-files) metadata. */
class ManifestTreeSpec extends SparkSuite {
  import spark.implicits._

  private def mkTable(parts: Int, rowsPer: Int = 4): Path = {
    val dir = Files.createTempDirectory("graft-mtree")
    val rows = (0 until parts).flatMap { i =>
      (0 until rowsPer).map(j => (('a' + i).toChar.toString, i * 100L + j, s"s$i-$j"))
    }
    AtomicTable.replacePartitions(spark, dir.toString,
      rows.toDF("p", "x", "s"), "p", statsColumns = Seq("x"), retain = 10)
    dir
  }

  private def manifestFiles(dir: Path): Set[String] = {
    def walk(p: Path): Seq[String] =
      if (!Files.isDirectory(p)) Nil
      else {
        val s = Files.list(p)
        try s.iterator.asScala.toList.flatMap { f =>
          if (Files.isDirectory(f)) walk(f)
          else Seq(dir.relativize(f).toString)
        }
        finally s.close()
      }
    walk(dir.resolve("_manifests")).toSet
  }

  test("a one-partition commit over a many-partition table writes O(1) metadata files") {
    val dir = mkTable(parts = 8)
    val before = manifestFiles(dir)
    // touch exactly one of the eight partitions
    AtomicTable.appendPartitions(spark, dir.toString,
      Seq(("a", 999L, "new")).toDF("p", "x", "s"), "p",
      statsColumns = Seq("x"), retain = 10)
    val added = manifestFiles(dir) -- before
    val roots = added.filter(_.matches("_manifests/v\\d+\\.json"))
    val blobs = added.filter(_.startsWith("_manifests/blobs/"))
    assert(roots.size === 1, s"exactly one new root, got $added")
    assert(blobs.size === 1,
      s"ONE touched partition = ONE new blob, got $added — O(touched), " +
        "not O(table)")
    // and the untouched partitions' pointers carried forward verbatim
    val r = AtomicTable.rootOpt(dir).get
    val rPrev = AtomicTable.rootAt(dir, r.version - 1)
    ('b' to 'h').map(_.toString).foreach { p =>
      assert(r.blobs(p) === rPrev.blobs(p),
        s"untouched partition '$p' must carry its blob pointer forward")
    }
    assert(r.blobs("a") !== rPrev.blobs("a"))
  }

  test("pruned DSv2 planning hydrates ONLY the admitted partitions' blobs") {
    val dir = mkTable(parts = 8)
    val blobOf = AtomicTable.rootOpt(dir).get.blobs
    AtomicTable.blobReadLog.clear()
    AtomicTable.recordBlobReads = true
    try {
      val got = spark.read.format("graft").load(dir.toString)
        .filter($"p" === "c").select($"x").as[Long].collect().sorted
      assert(got.toSeq === Seq(200L, 201L, 202L, 203L))
      val read = AtomicTable.blobReadLog.iterator().asScala.toSet
      assert(read.nonEmpty, "the admitted partition's blob must be read")
      assert(read === Set(blobOf("c")),
        s"planning WHERE p='c' over 8 partitions must hydrate exactly " +
          s"c's blob; read $read of ${blobOf.values.toSet}")
    } finally {
      AtomicTable.recordBlobReads = false
      AtomicTable.blobReadLog.clear()
    }
  }

  test("metadata-only aggregate pushdown reads zero blobs") {
    val dir = mkTable(parts = 6)
    AtomicTable.blobReadLog.clear()
    AtomicTable.recordBlobReads = true
    try {
      val n = spark.read.format("graft").load(dir.toString)
        .groupBy().count().as[Long].head()
      assert(n === 24L)
      val read = AtomicTable.blobReadLog.iterator().asScala.toSet
      assert(read.isEmpty,
        s"COUNT(*) is answered from the root's partition stats — no " +
          s"blob may load, got $read")
    } finally {
      AtomicTable.recordBlobReads = false
      AtomicTable.blobReadLog.clear()
    }
  }

  test("a pre-split (format 1) manifest reads as-is and upgrades into blobs on first commit") {
    val dir = Files.createTempDirectory("graft-mtree-v1")
    // stage real parquet the way a format-1 writer laid it out
    Seq(1L, 2L).toDF("x")
      .repartition(1).write.parquet(dir.resolve("data/txn-legacy/p=a").toString)
    // hand-write the format-1 root: everything inline, no blobs
    Files.createDirectories(dir.resolve("_manifests"))
    Files.writeString(dir.resolve("_manifests").resolve("v1.json"),
      """{"version":1,"operation":"write","tsMs":1000,
        |"partitions":{"a":["data/txn-legacy/p=a"]},
        |"properties":{"k":"v"},
        |"stats":{"a":{"rows":2,"mins":{"x":"1"},"maxs":{"x":"2"}}}}""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, true)))
    // reads: hydration passes the inline manifest through
    val m1 = AtomicTable.manifest(dir).get
    assert(m1.partitions("a") === Seq("data/txn-legacy/p=a"))
    assert(m1.properties("k") === "v")
    assert(AtomicTable.read(spark, dir.toString, schema)
      .select($"x").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // first commit over it: UNTOUCHED partition 'a' re-homes into a blob
    AtomicTable.appendPartitions(spark, dir.toString,
      Seq(("b", 3L)).toDF("p", "x"), "p", retain = 5)
    val r = AtomicTable.rootOpt(dir).get
    assert(r.inline.isEmpty, "the new root must be format 2")
    assert(r.blobs.keySet === Set("a", "b"),
      s"the upgrade commit must re-home 'a' AND write 'b', got ${r.blobs.keySet}")
    assert(r.properties("k") === "v")
    assert(AtomicTable.read(spark, dir.toString, schema)
      .select($"x").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // the re-homed blob backfilled per-dir bytes (estimateStatistics path)
    assert(AtomicTable.manifest(dir).get.bytes
      .get("data/txn-legacy/p=a").exists(_ > 0L))
  }

  test("blob GC: pruned versions' private blobs go, shared carried blobs survive") {
    val dir = mkTable(parts = 3) // v1: a, b, c
    def touch(p: String, x: Long): Unit =
      AtomicTable.replacePartitions(spark, dir.toString,
        Seq((p, x, "r")).toDF("p", "x", "s"), "p",
        statsColumns = Seq("x"), retain = 2)
    touch("a", 1000L) // v2: fresh blob for a; b, c carried from v1
    touch("a", 2000L) // v3: v1 ages out (retain=2 keeps v2, v3)
    val live = (2L to 3L).flatMap(v =>
      AtomicTable.rootAt(dir, v).blobs.values).toSet
    val onDisk = {
      val s = Files.list(dir.resolve("_manifests").resolve("blobs"))
      try s.iterator.asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(onDisk === live,
      s"after GC the blobs dir must hold exactly the retained roots' " +
        s"references: disk=$onDisk live=$live")
    // b and c never rewritten: one blob each, shared across v2 and v3
    val r2 = AtomicTable.rootAt(dir, 2L)
    val r3 = AtomicTable.rootAt(dir, 3L)
    assert(r2.blobs("b") === r3.blobs("b"))
    // and v2 (time travel inside retention) still reads its snapshot
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, true)))
    assert(AtomicTable.readAt(spark, dir.toString, schema, 2L)
      .where($"p" === "a").select($"x").as[Long].head() === 1000L)
  }

  test("fragmentation scans and file counts read the root alone: zero blob reads") {
    val dir = mkTable(parts = 4)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, true)))
    // fragment partition a: two appends -> three dirs/files
    AtomicTable.appendPartitions(spark, dir.toString,
      Seq(("a", 50L, "x")).toDF("p", "x", "s"), "p",
      statsColumns = Seq("x"), retain = 10)
    AtomicTable.appendPartitions(spark, dir.toString,
      Seq(("a", 51L, "y")).toDF("p", "x", "s"), "p",
      statsColumns = Seq("x"), retain = 10)
    val r = AtomicTable.rootOpt(dir).get
    assert(r.fileCounts("a") === 3 && r.fileCounts("b") === 1,
      s"the root must carry per-partition file counts: ${r.fileCounts}")
    AtomicTable.blobReadLog.clear()
    AtomicTable.recordBlobReads = true
    try {
      // below the threshold: the scan decides from the root and returns
      AtomicTable.compactFragmented(spark, dir.toString, schema, "p",
        minFiles = 99)
      // the total file count answers from the root too
      assert(AtomicTable.dataFileCount(dir) ===
        r.fileCounts.values.sum.toLong)
      assert(AtomicTable.blobReadLog.isEmpty,
        "maintenance scheduling must read O(partitions) roots, zero blobs")
      // above it: only the FRAGMENTED partition's metadata hydrates
      AtomicTable.compactFragmented(spark, dir.toString, schema, "p",
        minFiles = 3, statsColumns = Seq("x"), retain = 10)
      val read = scala.jdk.CollectionConverters
        .IteratorHasAsScala(AtomicTable.blobReadLog.iterator()).asScala.toSet
      assert(read.nonEmpty && read.forall(Set(r.blobs("a"))),
        s"the rewrite must hydrate only partition a's blob, got $read " +
          s"of ${r.blobs.values.toSet}")
      assert(AtomicTable.rootOpt(dir).get.fileCounts("a") === 1,
        "the compacted partition's root count must drop to one file")
    } finally {
      AtomicTable.recordBlobReads = false
      AtomicTable.blobReadLog.clear()
    }
  }

  test("a keyed SQL DELETE hydrates only the admitted group's metadata") {
    val w = Files.createTempDirectory("mtree-rl").toString
    spark.conf.set("spark.sql.catalog.gmt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmt.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmt.db")
    spark.sql("CREATE TABLE gmt.db.rl (k BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k', 'retain'='5')")
    // six partitions with DISJOINT key ranges: the root's zone maps
    // decide which single group a point key can live in
    (0 until 6).flatMap(i =>
      (0 until 4).map(j => (i * 1000L + j, ('a' + i).toChar.toString)))
      .toDF("k", "p").createOrReplaceTempView("mtree_rl_src")
    spark.sql("INSERT INTO gmt.db.rl SELECT * FROM mtree_rl_src")
    val dir = Paths.get(w, "db", "rl")
    val blobOf = AtomicTable.rootOpt(dir).get.blobs
    AtomicTable.blobReadLog.clear()
    AtomicTable.recordBlobReads = true
    try {
      // the row-level rewrite: group-filter scan, replace scan, and the
      // commit's own carry-forward must all stay inside partition 'c'
      spark.sql("DELETE FROM gmt.db.rl WHERE k = 2001")
      val read = scala.jdk.CollectionConverters
        .IteratorHasAsScala(AtomicTable.blobReadLog.iterator()).asScala.toSet
      assert(read.nonEmpty && read.forall(Set(blobOf("c"))),
        s"a keyed DELETE at 100 TB must plan one root + one group's " +
          s"blob; hydrated $read of ${blobOf.values.toSet}")
    } finally {
      AtomicTable.recordBlobReads = false
      AtomicTable.blobReadLog.clear()
    }
    assert(spark.sql("SELECT count(*) FROM gmt.db.rl")
      .collect().head.getLong(0) === 23L)
    assert(spark.sql("SELECT count(*) FROM gmt.db.rl WHERE k = 2001")
      .collect().head.getLong(0) === 0L)
  }

  test("restore carries the target's blob pointers: one new root, zero blob writes") {
    val dir = mkTable(parts = 6) // v1
    AtomicTable.replacePartitions(spark, dir.toString,
      Seq(("a", 9999L, "mut")).toDF("p", "x", "s"), "p",
      statsColumns = Seq("x"), retain = 10) // v2 rewrites partition a
    val before = manifestFiles(dir)
    val m = AtomicTable.restore(dir, 1L, retain = 10) // v3 = v1 again
    val added = manifestFiles(dir) -- before
    assert(added.count(_.startsWith("_manifests/blobs/")) === 0,
      s"restore must write ZERO blobs (pointers carry), got $added")
    assert(added.size === 1, s"restore = one new root, got $added")
    assert(AtomicTable.rootAt(dir, 3L).blobs === AtomicTable.rootAt(dir, 1L).blobs,
      "the restored root must reference the target version's blobs verbatim")
    assert(m.version === 3L)
    // and the restored contents read exactly like v1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType, true)))
    assert(AtomicTable.read(spark, dir.toString, schema)
      .where($"p" === "a").select($"x").as[Long].collect().sorted.toSeq ===
      (0L until 4L).toSeq)
  }

  test("withHeadRoot re-probes the root+hydrate pair across a simulated gc race") {
    val dir = mkTable(parts = 3)
    // the race: a concurrent process's commit+gc deletes a blob BETWEEN
    // our root read and its hydration. Simulated by a run body that
    // throws the gc race's signature once — the helper must re-read the
    // CURRENT root and re-run the caller's pruning, not surface the
    // NoSuchFileException mid-plan (the pre-split manifest() loop's
    // documented cross-process tolerance, kept through the tree split)
    var calls = 0
    val m = AtomicTable.withHeadRoot(dir)(
      fail("table exists — the none branch must not run"): AtomicTable.Manifest) { r =>
      calls += 1
      if (calls == 1)
        throw new java.nio.file.NoSuchFileException("simulated gc race")
      AtomicTable.hydrate(dir, r, r.partitions.keySet)
    }
    assert(calls === 2, "one re-probe after the simulated race")
    assert(m.partitions.keySet === Set("a", "b", "c"))
    assert(AtomicTable.rootOpt(dir).get.blobs.nonEmpty &&
      (m.files.nonEmpty || m.bytes.nonEmpty || m.fileStats.nonEmpty),
      "the retry hydrated the fresh root's blobs")
    // and a persistent failure still surfaces (bounded retries)
    val persistent = intercept[java.nio.file.NoSuchFileException] {
      AtomicTable.withHeadRoot(dir)(fail(): AtomicTable.Manifest) { _ =>
        throw new java.nio.file.NoSuchFileException("always")
      }
    }
    assert(persistent.getMessage.contains("always"))
  }

  test("vacuum reclaims orphaned blobs by age, never referenced ones") {
    val dir = mkTable(parts = 2)
    val bDir = dir.resolve("_manifests").resolve("blobs")
    val orphan = bDir.resolve("pm-orphanorphan.json")
    Files.writeString(orphan, "{}")
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    val referenced = AtomicTable.rootOpt(dir).get.blobs.values.toSet
    AtomicTable.vacuum(dir, olderThanMs = 60_000L)
    assert(!Files.exists(orphan), "the aged orphan blob must be reclaimed")
    referenced.foreach(b => assert(Files.exists(bDir.resolve(b)),
      s"referenced blob $b must survive vacuum"))
  }
}
