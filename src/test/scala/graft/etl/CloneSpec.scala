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
