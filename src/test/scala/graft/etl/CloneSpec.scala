package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSuite

/** CLONE TABLE: hard-link zero-copy snapshots with independent lifetimes. */
class CloneSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("p", StringType)))

  private def write(table: String, ids: Range, part: String): Unit =
    AtomicTable.replacePartitions(spark, table,
      ids.map(i => (i.toLong, i * 10L, part)).toDF("id", "v", "p"),
      "p", retain = 10, statsColumns = Seq("id"))

  test("a clone reproduces the snapshot without copying bytes") {
    val src = Files.createTempDirectory("graft-clone-src").toString
    val dst = Files.createTempDirectory("graft-clone").resolve("t")
    write(src, 1 to 10, "a")
    write(src, 11 to 15, "b")
    val m = AtomicTable.cloneTable(Paths.get(src), dst)
    assert(m.version === 1L && m.operation === "clone(v2)")
    assert(m.stats("a").rows === 10L, "zone maps carried")
    val df = AtomicTable.read(spark, dst.toString, schema)
    assert(df.count() === 15)
    // zero-copy: the cloned file shares its inode with the source file
    val srcFile = Paths.get(src).resolve(m.partitions("a").head)
    val lnk = Files.list(dst.resolve(m.partitions("a").head))
    val linked = try lnk.iterator().next() finally lnk.close()
    assert(Files.getAttribute(linked, "unix:ino") ===
      Files.getAttribute(srcFile.resolve(linked.getFileName.toString), "unix:ino"))
  }

  test("clone and source have independent lifetimes") {
    val src = Files.createTempDirectory("graft-clone-src2").toString
    val dst = Files.createTempDirectory("graft-clone2").resolve("t").toString
    write(src, 1 to 10, "a")
    AtomicTable.cloneTable(Paths.get(src), Paths.get(dst))
    // churn the SOURCE past its retention so its original dirs are GC'd
    (1 to 4).foreach { i =>
      AtomicTable.replacePartitions(spark, src,
        Seq((100L + i, 1L, "a")).toDF("id", "v", "p"), "p", retain = 1)
    }
    assert(AtomicTable.read(spark, src, schema).count() === 1)
    assert(AtomicTable.read(spark, dst, schema).count() === 10,
      "source GC must not reach into the clone")
    // and the other direction: drop the clone, source unaffected
    AtomicTable.replacePartitions(spark, dst,
      Seq((7L, 70L, "a")).toDF("id", "v", "p"), "p", retain = 1)
    assert(AtomicTable.read(spark, dst, schema).count() === 1)
    assert(AtomicTable.read(spark, src, schema).count() === 1)
  }

  test("a clone carries the bloom index: sidecars and bundles of committed files") {
    val wh = Files.createTempDirectory("graft-clone-bloom").toString
    spark.conf.set("spark.sql.catalog.gcb",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcb.root", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcb.db")
    spark.sql("CREATE TABLE gcb.db.t (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('bloom_columns'='id', 'retain'='5')")
    spark.sql("INSERT INTO gcb.db.t VALUES (1, 'a'), (2, 'a')")
    val src = Paths.get(wh, "db", "t")
    val dst = Files.createTempDirectory("graft-clone-bloom-dst").resolve("t")
    AtomicTable.cloneTable(src, dst)
    // every committed data file's sidecar AND the dir's fold bundle
    // must ride the clone, or the snapshot silently loses its point
    // skipping (reads stay correct either way — that is the honesty
    // contract — but a clone is a full-fidelity snapshot)
    val m = AtomicTable.manifest(dst).get
    m.partitions.values.flatten.foreach { d =>
      val names = {
        val s = Files.list(dst.resolve(d))
        try {
          import scala.jdk.CollectionConverters._
          s.iterator.asScala.map(_.getFileName.toString).toSet
        } finally s.close()
      }
      val data = names.filter(_.endsWith(".parquet"))
      assert(data.nonEmpty)
      data.foreach(f => assert(names.contains(s"$f.id.bloom"),
        s"sidecar of $f must clone, got $names"))
      assert(names.contains(graft.sources.GraftBloom.BundleName),
        s"the fold bundle must clone, got $names")
    }
  }

  test("a versioned clone pins the requested snapshot and carries vectors") {
    val src = Files.createTempDirectory("graft-clone-src3").toString
    val dst = Files.createTempDirectory("graft-clone3").resolve("t").toString
    write(src, 1 to 10, "a")                                     // v1
    MergeInto.deleteKeysMor(spark, src, schema,
      Seq((3L, "a")).toDF("id", "p"), Seq("id"), "p", retain = 10) // v2
    write(src, 11 to 12, "b")                                    // v3
    val m = AtomicTable.cloneTable(Paths.get(src), Paths.get(dst), Some(2L))
    assert(m.deletes.keySet === Set("a"), "vectors carried with the snapshot")
    val merged = MergeInto.readMerged(spark, dst, schema)
    assert(merged.count() === 9, "v2 = 10 rows minus the vector-deleted key")
    assert(merged.filter(col("id") === 3L).count() === 0)
    intercept[IllegalArgumentException] {
      AtomicTable.cloneTable(Paths.get(src), Paths.get(dst)) // dst not empty
    }
  }
}
