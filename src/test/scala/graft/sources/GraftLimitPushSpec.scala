package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite

/** LIMIT / TopN pushdown: the scan truncates its PLANNED FILES once the
  * kept files' exact row counts (manifest file-level stats, DV-free
  * partitions only) cover the limit — `SELECT * FROM t LIMIT 10` at
  * 100 TB reads one file, not the table; `ORDER BY day DESC LIMIT n`
  * reads the newest partitions only. Partial pushdown: Spark keeps its
  * own Limit/Sort, the scan only guarantees a sufficient superset, so
  * every refusal path (residual data filters, delete vectors, missing
  * stats, null partition values in a sort key) falls back to the full
  * plan and stays correct. */
class GraftLimitPushSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-limitpush").toString
    spark.conf.set("spark.sql.catalog.glp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glp.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glp.db")
    w
  }

  /** Three partitions ('a','b','c') x two appends each: six files of 10
    * rows, every file carrying stats (stats_columns declared). */
  private def seed(table: String, stats: Boolean = true): Unit = {
    warehouse
    val props = if (stats)
      "TBLPROPERTIES ('retain'='10', 'stats_columns'='id')"
    else "TBLPROPERTIES ('retain'='10')"
    spark.sql(s"CREATE TABLE glp.db.$table (id BIGINT, v DOUBLE, p STRING) " +
      s"PARTITIONED BY (p) $props")
    for (half <- 0 to 1) {
      Seq("a", "b", "c").zipWithIndex
        .flatMap { case (p, pi) =>
          (0L until 10L).map(i => (pi * 100L + half * 10L + i, i * 1.5, p)) }
        .toDF("id", "v", "p").coalesce(1)
        .createOrReplaceTempView(s"src_$table")
      spark.sql(s"INSERT INTO glp.db.$table SELECT * FROM src_$table")
    }
  }

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case b: BatchScanExec => Seq(b)
    case o => o.children.flatMap(scansOf)
  }

  private def plannedFiles(df: DataFrame): Seq[String] = {
    df.collect()
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    scans.head.scan.asInstanceOf[GraftScan].planInputPartitions()
      .flatMap(_.asInstanceOf[GraftInputPartition].dataFiles).toSeq
  }

  test("bare LIMIT plans exactly enough files") {
    seed("t1")
    val q = spark.sql("SELECT id, v FROM glp.db.t1 LIMIT 5")
    assert(q.collect().length === 5)
    assert(plannedFiles(q).size === 1, "5 rows fit in the first 10-row file")
    val q2 = spark.sql("SELECT id FROM glp.db.t1 LIMIT 15")
    assert(q2.collect().length === 15)
    assert(plannedFiles(q2).size === 2, "15 rows need two 10-row files")
  }

  test("LIMIT larger than the table plans everything and is correct") {
    seed("t2")
    val q = spark.sql("SELECT id FROM glp.db.t2 LIMIT 1000")
    assert(q.collect().length === 60)
    assert(plannedFiles(q).size === 6)
  }

  test("LIMIT composes with a consumed partition filter") {
    seed("t3")
    val q = spark.sql("SELECT id FROM glp.db.t3 WHERE p = 'b' LIMIT 3")
    val rows = q.collect().map(_.getLong(0))
    assert(rows.length === 3)
    assert(rows.forall(id => id >= 100L && id < 200L), "only partition b rows")
    assert(plannedFiles(q).size === 1, "consumed filter + limit: one file")
  }

  test("a residual data filter refuses truncation (no under-delivery)") {
    seed("t4")
    // v >= 0 matches everything, but the scan cannot KNOW that — if it
    // truncated at 5 counted rows and the filter then dropped some, the
    // query would return fewer than 5. All files must stay planned.
    val q = spark.sql("SELECT id FROM glp.db.t4 WHERE v >= 0.0 LIMIT 5")
    assert(q.collect().length === 5)
    assert(plannedFiles(q).size === 6, "residual filter blocks truncation")
  }

  test("ORDER BY partition column DESC LIMIT keeps the tail partitions") {
    seed("t5")
    val q = spark.sql(
      "SELECT p, id FROM glp.db.t5 ORDER BY p DESC LIMIT 5")
    val got = q.collect()
    assert(got.length === 5)
    assert(got.forall(_.getString(0) == "c"), "top-5 by p DESC are all 'c'")
    val files = plannedFiles(q)
    assert(files.size === 1, "one 10-row file of partition c covers 5 rows")
    // and ascending keeps the head
    val qa = spark.sql("SELECT p, id FROM glp.db.t5 ORDER BY p ASC LIMIT 12")
    val gotA = qa.collect()
    assert(gotA.length === 12)
    assert(gotA.count(_.getString(0) == "a") === 12 ||
      (gotA.count(_.getString(0) == "a") === 10 &&
        gotA.count(_.getString(0) == "b") === 2),
      "ascending top-12 comes from 'a' then 'b'")
    assert(gotA.forall(r => r.getString(0) == "a" || r.getString(0) == "b"))
    assert(plannedFiles(qa).size === 2, "10 + 10 counted rows cover 12")
  }

  test("ORDER BY a data column refuses truncation, stays correct") {
    seed("t6")
    val q = spark.sql("SELECT id FROM glp.db.t6 ORDER BY id DESC LIMIT 3")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(219L, 218L, 217L))
    assert(plannedFiles(q).size === 6, "row order inside a partition is unknown")
  }

  test("typed ordering: BIGINT partition keys avoid the '10' < '9' trap") {
    warehouse
    spark.sql("CREATE TABLE glp.db.t7 (v DOUBLE, k BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('retain'='10', 'stats_columns'='v')")
    Seq((1.0, 9L), (2.0, 10L), (3.0, 11L)).toDF("v", "k")
      .createOrReplaceTempView("src_t7")
    spark.sql("INSERT INTO glp.db.t7 SELECT * FROM src_t7")
    val q = spark.sql("SELECT k FROM glp.db.t7 ORDER BY k DESC LIMIT 1")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(11L),
      "lexicographic '9' > '11' must not win")
    assert(plannedFiles(q).size === 1)
  }

  test("delete vectors void the counts: everything planned, answer exact") {
    seed("t8")
    // merge-on-read key delete: data files untouched, vector outstanding
    graft.etl.MergeInto.deleteKeysMor(spark,
      java.nio.file.Paths.get(warehouse, "db", "t8").toString,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v DOUBLE, p STRING"),
      Seq((0L, "a")).toDF("id", "p"), Seq("id"), "p")
    val q = spark.sql("SELECT id FROM glp.db.t8 LIMIT 59")
    assert(q.collect().length === 59, "exactly the surviving rows")
    // partition a carries a vector: its files count 0, so truncation
    // keeps walking; b and c counts (40) < 59 so nothing truncates
    assert(plannedFiles(q).size === 6)
  }

  test("no stats_columns still truncates: row counts are always tracked") {
    // rows-only stats (no declared columns) are recorded by every DSv2
    // write — exact counts cost one increment and unlock LIMIT/count(*)
    // pushdown without opting into zone maps
    seed("t9", stats = false)
    val q = spark.sql("SELECT id FROM glp.db.t9 LIMIT 5")
    assert(q.collect().length === 5)
    assert(plannedFiles(q).size === 1, "rows-only file stats cover LIMIT")
  }

  test("a legacy table without file stats never truncates, stays correct") {
    // pre-stats manifests (Scala-API writes without stats tracking)
    // carry no per-file counts — unknown counts must plan everything
    val dir = java.nio.file.Files.createTempDirectory("glp-legacy").toString
    graft.etl.AtomicTable.replacePartitions(spark,
      dir, (0L until 30L).map(i => (i, (i % 3).toString))
        .toDF("id", "p").repartition(3, $"p"), "p")
    val df = spark.read.format("graft").load(dir).limit(5)
    assert(df.collect().length === 5)
    df.collect()
    val scan = scansOf(df.queryExecution.executedPlan)
      .head.scan.asInstanceOf[GraftScan]
    val m = graft.etl.AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    if (m.fileStats.isEmpty)
      assert(scan.planInputPartitions()
        .flatMap(_.asInstanceOf[GraftInputPartition].dataFiles).length ===
        m.partitions.values.flatten.size,
        "unknown counts never truncate")
  }
}
