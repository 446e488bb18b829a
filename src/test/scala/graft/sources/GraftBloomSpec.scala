package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.AtomicTable

/** Per-file bloom sidecars (`bloom_columns`): point lookups on
  * UNCLUSTERED columns skip files zone maps cannot — every file's
  * [min, max] spans the whole key range when the layout doesn't sort,
  * but the 8 KiB membership filter refutes file by file. Static (=, IN
  * pushdown) and runtime (join-delivered value sets) paths both pinned;
  * honesty guards: missing sidecars never skip, and a false positive
  * only costs a read. */
class GraftBloomSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-bloom").toString
    spark.conf.set("spark.sql.catalog.gbl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbl.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbl.db")
    w
  }

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case b: BatchScanExec => Seq(b)
    case o => o.children.flatMap(scansOf)
  }

  private def plannedFiles(df: DataFrame): Int = {
    df.collect()
    GraftSource.plannedFileCount(
      scansOf(df.queryExecution.executedPlan).head.scan).get
  }

  /** ids are SHUFFLED across the three inserts, so every file's id
    * range spans ~[0, 300) and zone maps can never skip — only the
    * blooms can. */
  private def seed(t: String): Unit = {
    warehouse
    spark.sql(s"CREATE TABLE gbl.db.$t (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES " +
      "('bloom_columns'='id', 'stats_columns'='id', 'retain'='5')")
    (0 until 3).foreach { k =>
      (0L until 300L).filter(_ % 3 == k).map(i => (i, i * 1.5, "a"))
        .toDF("id", "v", "p").coalesce(1)
        .createOrReplaceTempView(s"src_$t")
      spark.sql(s"INSERT INTO gbl.db.$t SELECT * FROM src_$t")
    }
  }

  test("a point lookup reads exactly the file that holds the key") {
    seed("t1")
    val dir = Paths.get(warehouse, "db", "t1")
    // sidecars exist next to every committed data file
    val m = AtomicTable.manifest(dir).get
    m.partitions("a").foreach { d =>
      val s = Files.list(dir.resolve(d))
      val names = try {
        import scala.jdk.CollectionConverters._
        s.iterator.asScala.map(_.getFileName.toString).toSet
      } finally s.close()
      val data = names.filter(_.endsWith(".parquet"))
      assert(data.forall(f => names.contains(s"$f.id.bloom")),
        s"every data file of $d must carry its id sidecar, got $names")
    }
    assert(m.properties(GraftSource.BloomColsProperty) === "id")
    // interleaved ids: zone maps admit all three files...
    assert(m.fileStats.values.flatMap(_.values)
      .forall(st => st.mins("id").toLong <= 2), "every file spans the range")
    // ...but the bloom reads ONE file for id = 7 (7 % 3 = 1 -> file 2)
    val q = spark.sql("SELECT v FROM gbl.db.t1 WHERE id = 7")
    assert(q.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(q) === 1,
      "the point predicate must bloom-skip the two files without the key")
    // IN over keys from two of the three files keeps exactly those two
    val q2 = spark.sql("SELECT sum(id) FROM gbl.db.t1 WHERE id IN (3, 7)")
    assert(q2.as[Long].head() === 10L)
    assert(plannedFiles(q2) === 2)
    // an absent key reads zero files, and answers exactly
    val q3 = spark.sql("SELECT v FROM gbl.db.t1 WHERE id = 999999")
    assert(q3.collect().isEmpty)
    assert(plannedFiles(q3) === 0)
  }

  test("the commit folds sidecars into one bundle per dir; bundle-only probes skip identically") {
    seed("tb")
    val dir = Paths.get(warehouse, "db", "tb")
    val m = AtomicTable.manifest(dir).get
    import scala.jdk.CollectionConverters._
    // every committed dir carries the bundle the commit folded
    m.partitions("a").foreach { d =>
      assert(Files.exists(dir.resolve(d).resolve(GraftBloom.BundleName)),
        s"commit must fold $d's sidecars into a bundle")
    }
    // DELETE every per-file sidecar: the probe must now answer from the
    // bundles alone — one read per DIR, the object-store posture
    m.partitions("a").foreach { d =>
      val s = Files.list(dir.resolve(d))
      try s.iterator.asScala.filter(_.getFileName.toString.endsWith(".bloom"))
        .toList.foreach(Files.delete)
      finally s.close()
    }
    GraftBloom.clearCaches()
    val q = spark.sql("SELECT v FROM gbl.db.tb WHERE id = 7")
    assert(q.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(q) === 1,
      "bundle-only probing must skip exactly like per-file sidecars")
    val q2 = spark.sql("SELECT v FROM gbl.db.tb WHERE id = 999999")
    assert(q2.collect().isEmpty)
    assert(plannedFiles(q2) === 0)
    // ...and DELETING the bundles too degrades honestly: nothing skips,
    // answers stay exact (missing index never loses rows)
    m.partitions("a").foreach { d =>
      Files.deleteIfExists(dir.resolve(d).resolve(GraftBloom.BundleName))
    }
    GraftBloom.clearCaches()
    val q3 = spark.sql("SELECT v FROM gbl.db.tb WHERE id = 7")
    assert(q3.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(q3) === 3, "no index at all: every file reads")
  }

  test("a corrupt or truncated bundle degrades to the sidecar fallback, never crashes") {
    seed("tc")
    val dir = Paths.get(warehouse, "db", "tc")
    val m = AtomicTable.manifest(dir).get
    val bundles = m.partitions("a").map(d =>
      dir.resolve(d).resolve(GraftBloom.BundleName))
    // truncate one bundle mid-payload, garbage another's bytes — the
    // probe must fall back to the per-file sidecars and keep skipping
    val b0 = bundles.head
    val bytes = Files.readAllBytes(b0)
    Files.write(b0, java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 3))
    bundles.drop(1).headOption.foreach(b =>
      Files.write(b, "not a bundle at all".getBytes))
    GraftBloom.clearCaches()
    val q = spark.sql("SELECT v FROM gbl.db.tc WHERE id = 7")
    assert(q.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(q) === 1,
      "corrupt bundles must degrade to sidecar probing, same skipping")
  }

  test("runtime value sets from a selective join probe the sidecars") {
    seed("t2")
    val dimPath = Files.createTempDirectory("graft-bloom-dim").toString
    (0L until 300L).map(i => (i, if (i == 31 || i == 62) "keep" else "drop"))
      .toDF("id", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val j = spark.table("gbl.db.t2").join(broadcast(dim), Seq("id"))
    val rows = j.collect()
    assert(rows.length === 2)
    val scans = scansOf(j.queryExecution.executedPlan)
      .filter(_.runtimeFilters.nonEmpty)
    assert(scans.nonEmpty, "the join must deliver a runtime filter")
    // 31 % 3 = 1 and 62 % 3 = 2: two of three files admit
    assert(GraftSource.plannedFileCount(scans.head.scan).get === 2,
      "runtime values must bloom-skip the file holding neither key")
  }

  test("keyed DML on a bloom table stays exact (group scan never file-skips)") {
    seed("t3")
    spark.sql("DELETE FROM gbl.db.t3 WHERE id = 7")
    assert(spark.sql("SELECT count(*) FROM gbl.db.t3").as[Long].head() === 299L)
    spark.sql("UPDATE gbl.db.t3 SET v = -1.0 WHERE id = 8")
    assert(spark.sql("SELECT v FROM gbl.db.t3 WHERE id = 8")
      .as[Double].head() === -1.0)
    assert(spark.sql("SELECT count(*) FROM gbl.db.t3").as[Long].head() === 299L)
  }

  test("bundle entry names with JSON metacharacters still probe through the bundle") {
    // a data-file (or column) name containing quote/backslash corrupted
    // the hand-concatenated index: at best the parse failed and every
    // probe fell back to per-file GETs; at worst in-range-but-wrong
    // offsets handed back the WRONG filter (silent mis-skip). Jackson
    // escapes — the bundle must serve BOTH entries with zero sidecar
    // reads, and each entry must get ITS OWN bytes.
    val dir = Files.createTempDirectory("graft-bloom-esc")
    val hostile = "a\"b\\c.parquet"
    val b1 = new GraftBloom.Builder; b1.add("k1")
    val b2 = new GraftBloom.Builder; b2.add("k2")
    Files.write(dir.resolve(hostile + ".id.bloom"), b1.toBytes)
    Files.write(dir.resolve("plain.parquet.id.bloom"), b2.toBytes)
    assert(GraftBloom.writeBundle(dir.toString) === 2)
    GraftBloom.clearCaches()
    val sidecarGets = GraftBloom.sidecarReads.get()
    val h = GraftBloom.sidecarOf(dir.resolve(hostile).toString, "id").get
    val p = GraftBloom.sidecarOf(dir.resolve("plain.parquet").toString, "id").get
    assert(GraftBloom.mightContain(h, "k1") && !GraftBloom.mightContain(h, "k2"),
      "the hostile-named entry must map to its own filter bytes")
    assert(GraftBloom.mightContain(p, "k2") && !GraftBloom.mightContain(p, "k1"))
    assert(GraftBloom.sidecarReads.get() === sidecarGets,
      "both probes must answer from the bundle, not per-file fallback")
  }

  test("scheme-qualified writer-side rebuild evicts the plain-keyed bundle cache") {
    // the probe caches bundles under the manifest's PLAIN dir path; the
    // sidecar rebuild refolds via input_file_name's file:/-qualified
    // parent — the un-normalized remove() missed the entry and the
    // probe served the stale bundle until restart
    val dir = Files.createTempDirectory("graft-bloom-inv")
    val b1 = new GraftBloom.Builder; b1.add("oldkey")
    Files.write(dir.resolve("f.parquet.id.bloom"), b1.toBytes)
    GraftBloom.writeBundle(dir.toString)
    GraftBloom.clearCaches()
    val got = GraftBloom.sidecarOf(dir.resolve("f.parquet").toString, "id").get
    assert(GraftBloom.mightContain(got, "oldkey"))
    val b2 = new GraftBloom.Builder; b2.add("newkey")
    Files.write(dir.resolve("f.parquet.id.bloom"), b2.toBytes)
    GraftBloom.writeBundle("file:" + dir.toString)
    val got2 = GraftBloom.sidecarOf(dir.resolve("f.parquet").toString, "id").get
    assert(GraftBloom.mightContain(got2, "newkey") &&
      !GraftBloom.mightContain(got2, "oldkey"),
      "the file:-qualified refold must evict the plain-keyed cache entry")
  }

  test("builder and byte-level setter produce identical sidecars") {
    val b = new GraftBloom.Builder
    val bytes = new Array[Byte](GraftBloom.Bits / 8)
    val vals = (0 until 500).map(i => s"value-$i")
    vals.foreach(b.add)
    vals.foreach(GraftBloom.addToBytes(bytes, _))
    assert(java.util.Arrays.equals(b.toBytes, bytes),
      "the distributed rebuild must write bit-identical sidecars")
    vals.foreach(v => assert(GraftBloom.mightContain(bytes, v)))
  }

  test("compaction rebuilds the sidecars (point skipping survives rewrites)") {
    warehouse
    spark.sql("CREATE TABLE gbl.db.t4 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES " +
      "('bloom_columns'='id', 'retain'='5')")
    (0 until 3).foreach { k =>
      (0L until 300L).filter(_ % 3 == k)
        .map(i => (i, i * 1.5, if (i < 150) "a" else "b"))
        .toDF("id", "v", "p").coalesce(1).createOrReplaceTempView("src_t4")
      spark.sql("INSERT INTO gbl.db.t4 SELECT * FROM src_t4")
    }
    spark.sql("CALL gbl.system.compact('db.t4', 2)")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t4")).get
    assert(m.partitions.values.forall(_.size === 1), "compacted")
    // the rewritten files carry REBUILT sidecars: a point key reads one
    // file of two, an absent key reads zero
    val q = spark.sql("SELECT v FROM gbl.db.t4 WHERE id = 7")
    assert(q.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(q) === 1,
      "the other partition's rebuilt bloom must refute the key")
    val q2 = spark.sql("SELECT v FROM gbl.db.t4 WHERE id = 999999")
    assert(q2.collect().isEmpty)
    assert(plannedFiles(q2) === 0)
  }

  test("rebuild_blooms backfills a table indexed after the fact") {
    warehouse
    // created WITHOUT bloom_columns: three interleaved full-range files
    spark.sql("CREATE TABLE gbl.db.t5 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    (0 until 3).foreach { k =>
      (0L until 300L).filter(_ % 3 == k).map(i => (i, i * 1.5, "a"))
        .toDF("id", "v", "p").coalesce(1).createOrReplaceTempView("src_t5")
      spark.sql("INSERT INTO gbl.db.t5 SELECT * FROM src_t5")
    }
    // no index yet: the point lookup reads all three files
    val before = spark.sql("SELECT v FROM gbl.db.t5 WHERE id = 7")
    assert(before.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(before) === 3)
    // declare + backfill, one scan, properties-only commit
    spark.sql("ALTER TABLE gbl.db.t5 SET TBLPROPERTIES " +
      "('bloom_columns'='id')")
    spark.sql("CALL gbl.system.rebuild_blooms('db.t5', '')")
    val after = spark.sql("SELECT v FROM gbl.db.t5 WHERE id = 7")
    assert(after.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(after) === 1,
      "the backfilled sidecars must skip the two keyless files")
    assert(AtomicTable.manifest(Paths.get(warehouse, "db", "t5")).get
      .properties(GraftSource.BloomColsProperty) === "id")
  }
}
