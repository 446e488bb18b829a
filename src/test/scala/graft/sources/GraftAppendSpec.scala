package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.etl.{AtomicTable, MergeInto}

/** The multi-dir manifest contract: INSERT INTO appends (never clobbers),
  * zone maps merge on append, committed-file lists exclude zombie
  * stragglers, the changefeed emits only appended dirs, and appends into
  * vector-deleted partitions fold first. */
class GraftAppendSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-app").toString
    spark.conf.set("spark.sql.catalog.ap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ap.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ap.db")
    w
  }

  test("changefeed after an append emits ONLY the appended rows") {
    val dir = Files.createTempDirectory("graft-app-cdf").toString
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, "a"), (2L, "a"), (5L, "b")).toDF("id", "p"), "p",
      retain = 10)                                               // v1
    AtomicTable.appendPartitions(spark, dir,
      Seq((3L, "a")).toDF("id", "p"), "p", retain = 10)          // v2
    def ids(from: String): Set[Long] =
      spark.read.format("graft").option("startingVersion", from)
        .load(dir).select("id").as[Long].collect().toSet
    assert(ids("1") === Set(1L, 2L, 3L, 5L))
    assert(ids("2") === Set(3L),
      "an appended partition must re-emit only its appended dirs, " +
        "not the whole partition")
    // a backwards range fails loudly instead of diffing a newer manifest
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("startingVersion", "9")
        .option("endingVersion", "2").load(dir).collect()
    }
  }

  test("zone maps merge on append: rows add, bounds widen, pruning stays safe") {
    val dir = Files.createTempDirectory("graft-app-zm").toString
    AtomicTable.replacePartitions(spark, dir,
      (1L to 5L).map(i => (i, "a")).toDF("id", "p"), "p",
      statsColumns = Seq("id"))                                  // v1
    AtomicTable.appendPartitions(spark, dir,
      (10L to 12L).map(i => (i, "a")).toDF("id", "p"), "p",
      statsColumns = Seq("id"))                                  // v2
    val st = AtomicTable.manifest(Paths.get(dir)).get.stats("a")
    assert(st.rows === 8L)
    assert(st.mins("id") === "1" && st.maxs("id") === "12")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("p", StringType)))
    // inside the merged bounds: the partition must be read
    assert(AtomicTable.readPruned(spark, dir, schema, "id", "10", "11")
      .count() === 2L)
    // outside: pruned from metadata
    assert(AtomicTable.readPruned(spark, dir, schema, "id", "20", "30")
      .count() === 0L)
  }

  test("append into a partition with outstanding delete vectors is refused") {
    val dir = Files.createTempDirectory("graft-app-dv").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("p", StringType)))
    AtomicTable.replacePartitions(spark, dir,
      Seq((1L, "a"), (2L, "a")).toDF("id", "p"), "p")
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((1L, "a")).toDF("id", "p"), Seq("id"), "p")
    val e = intercept[IllegalStateException] {
      AtomicTable.appendPartitions(spark, dir,
        Seq((1L, "a")).toDF("id", "p"), "p")
    }
    assert(e.getMessage.contains("delete vectors"))
  }

  test("SQL INSERT INTO a vector-deleted partition folds the vectors and appends") {
    warehouse
    spark.sql("CREATE TABLE ap.db.fold (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO ap.db.fold VALUES (1, 'a'), (2, 'a'), (5, 'b')")
    val dir = Paths.get(warehouse, "db", "fold").toString
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("p", StringType)))
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((1L, "a")).toDF("id", "p"), Seq("id"), "p")
    // re-inserting the DELETED key must stick: the stale vector would
    // otherwise re-delete it at read time
    spark.sql("INSERT INTO ap.db.fold VALUES (1, 'a')")
    assert(spark.sql("SELECT id FROM ap.db.fold").as[Long].collect().toSet
      === Set(1L, 2L, 5L))
    assert(AtomicTable.manifest(Paths.get(dir)).get.deletes.isEmpty,
      "the append path folded the vectors before appending")
  }

  test("readers open only the committed file list: a zombie straggler is invisible") {
    warehouse
    spark.sql("CREATE TABLE ap.db.z (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO ap.db.z VALUES (1, 'a'), (2, 'a')")
    val root = Paths.get(warehouse, "db", "z")
    val m = AtomicTable.manifest(root).get
    val dirRel = m.partitions("a").head
    assert(m.files.contains(dirRel), "SQL commits record their file lists")
    // simulate a zombie/speculative attempt landing a duplicate file
    // AFTER the commit's prune: copy the committed file under a new name
    val dir = root.resolve(dirRel)
    val committed = Files.list(dir).iterator()
    val f = committed.next().toString
    Files.copy(Paths.get(f), dir.resolve("part-zombie-attempt.parquet"))
    assert(spark.sql("SELECT count(*) FROM ap.db.z").as[Long].head() === 2L,
      "the straggler's rows must not be double-counted")
    assert(AtomicTable.read(spark, root.toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))))
      .count() === 2L, "Scala-API reads honor the file list too")
    assert(AtomicTable.dataFileCount(root) === 1L)
  }

  test("pushed timestamp filters compare as UTC on a non-UTC host") {
    val tzBefore = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      val instant = java.time.Instant.parse("2021-06-01T08:00:00Z")
      assert(GraftSource.filterValueString(
        java.sql.Timestamp.from(instant)) === "2021-06-01 08:00",
        "zone-map comparisons need UTC wall time, not the JVM default zone")
      // end-to-end: a ts range filter must NOT prune the partition that
      // holds the matching row (String.valueOf would render 04:00 EDT
      // and under-admit)
      val dir = Files.createTempDirectory("graft-app-tz").toString
      AtomicTable.replacePartitions(spark, dir,
        Seq((1L, java.sql.Timestamp.from(instant), "a"))
          .toDF("id", "ts", "p"), "p", statsColumns = Seq("ts"))
      val got = spark.read.format("graft").load(dir)
        .filter(col("ts") >= lit("2021-06-01 07:00:00").cast(TimestampType))
        .count()
      assert(got === 1L)
    } finally java.util.TimeZone.setDefault(tzBefore)
  }
}
