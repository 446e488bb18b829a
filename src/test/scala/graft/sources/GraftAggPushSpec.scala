package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite

/** Aggregate pushdown: COUNT(*)/MIN/MAX (optionally grouped by
  * partition columns) answered ENTIRELY from the manifest — zero data
  * bytes read. At 100 TB this turns "count the table" from a full scan
  * into a metadata lookup. The decisive pins here physically DELETE the
  * parquet data files and assert the aggregate still answers correctly
  * (proof the plan never touches data), and conversely that every
  * metadata-inexact case — delete vectors, data filters, untracked
  * columns — REFUSES pushdown and still returns the right answer
  * through the ordinary scan. */
class GraftAggPushSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-aggpush").toString
    spark.conf.set("spark.sql.catalog.gap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gap.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gap.db")
    w
  }

  private def seed(table: String): Path = {
    warehouse
    spark.sql(s"CREATE TABLE gap.db.$table (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10', " +
      "'stats_columns'='id,v')")
    Seq((1L, 0.5, "a"), (2L, 1.5, "a"), (3L, 2.5, "b"), (4L, -1.0, "b"),
      (5L, 9.0, "c")).toDF("id", "v", "p")
      .createOrReplaceTempView(s"src_$table")
    spark.sql(s"INSERT INTO gap.db.$table SELECT * FROM src_$table")
    Paths.get(warehouse, "db", table)
  }

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case b: BatchScanExec => Seq(b)
    case o => o.children.flatMap(scansOf)
  }

  private def pushedAgg(df: DataFrame): Boolean =
    scansOf(df.queryExecution.executedPlan)
      .exists(_.scan.isInstanceOf[GraftAggScan])

  /** Remove every parquet data file under the table root: any plan that
    * still reads data will fail loudly; a metadata-only plan won't. */
  private def dropDataFiles(root: Path): Int = {
    val s = java.nio.file.Files.walk(root)
    try {
      val files = s.iterator()
      var n = 0
      val togo = scala.collection.mutable.ListBuffer.empty[Path]
      while (files.hasNext) {
        val f = files.next()
        if (f.getFileName.toString.endsWith(".parquet")) togo += f
      }
      togo.foreach { f => java.nio.file.Files.delete(f); n += 1 }
      n
    } finally s.close()
  }

  test("global count/min/max answer from metadata — data files deleted") {
    val root = seed("t1")
    val q = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi, " +
        "min(v) AS vlo, max(v) AS vhi FROM gap.db.t1")
    assert(pushedAgg(q), s"expected GraftAggScan:\n${q.queryExecution}")
    assert(dropDataFiles(root) > 0, "seed must have written parquet")
    val r = q.collect().head
    assert(r.getLong(0) === 5L)
    assert(r.getLong(1) === 1L && r.getLong(2) === 5L)
    assert(r.getDouble(3) === -1.0 && r.getDouble(4) === 9.0)
  }

  test("group-by partition column answers from metadata") {
    val root = seed("t2")
    val q = spark.sql(
      "SELECT p, count(*) AS n, max(id) AS hi FROM gap.db.t2 " +
        "GROUP BY p ORDER BY p")
    assert(pushedAgg(q), s"expected GraftAggScan:\n${q.queryExecution}")
    dropDataFiles(root)
    val rs = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rs.toSeq === Seq(("a", 2L, 2L), ("b", 2L, 4L), ("c", 1L, 5L)))
  }

  test("min/max of the partition column itself come from the keys") {
    val root = seed("t3")
    val q = spark.sql(
      "SELECT min(p) AS lo, max(p) AS hi, count(*) AS n FROM gap.db.t3")
    assert(pushedAgg(q))
    dropDataFiles(root)
    val r = q.collect().head
    assert(r.getString(0) === "a" && r.getString(1) === "c")
    assert(r.getLong(2) === 5L)
  }

  test("delete vectors refuse pushdown; the answer stays exact") {
    val root = seed("t4")
    // a merge-on-read key delete leaves the data files untouched and an
    // outstanding vector: physical stats no longer equal logical rows
    graft.etl.MergeInto.deleteKeysMor(spark, root.toString,
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v DOUBLE, p STRING"),
      Seq((3L, "b")).toDF("id", "p"), Seq("id"), "p")
    val q = spark.sql("SELECT count(*) AS n, max(id) AS hi FROM gap.db.t4")
    val r = q.collect().head
    assert(r.getLong(0) === 4L, "count must see the vector-deleted row gone")
    assert(r.getLong(1) === 5L)
    assert(!pushedAgg(q),
      "outstanding delete vectors make physical stats a lie — must refuse")
  }

  test("a data filter refuses pushdown (zone pruning is approximate)") {
    seed("t5")
    val q = spark.sql(
      "SELECT count(*) AS n FROM gap.db.t5 WHERE id > 2")
    assert(!pushedAgg(q))
    assert(q.collect().head.getLong(0) === 3L)
  }

  test("untracked column min/max refuses pushdown, still correct") {
    warehouse
    spark.sql("CREATE TABLE gap.db.t6 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')") // no stats cols
    spark.sql("INSERT INTO gap.db.t6 VALUES (1, 0.5, 'a'), (2, 1.5, 'b')")
    val q = spark.sql("SELECT min(v) AS lo FROM gap.db.t6")
    assert(!pushedAgg(q))
    assert(q.collect().head.getDouble(0) === 0.5)
  }

  test("unsupported aggregate (sum/avg/count(col)) refuses pushdown") {
    seed("t7")
    for (expr <- Seq("sum(id)", "avg(v)", "count(v)")) {
      val q = spark.sql(s"SELECT $expr AS x FROM gap.db.t7")
      assert(!pushedAgg(q), s"$expr must not push")
    }
    assert(spark.sql("SELECT sum(id) AS x FROM gap.db.t7")
      .collect().head.getLong(0) === 15L)
  }

  test("count(*) over an empty-but-committed table is 0 from metadata") {
    seed("t8")
    spark.sql("DELETE FROM gap.db.t8 WHERE p IN ('a','b','c')") // metadata drop
    val q = spark.sql("SELECT count(*) AS n, min(id) AS lo FROM gap.db.t8")
    assert(pushedAgg(q), s"plan:\n${q.queryExecution}")
    val r = q.collect().head
    assert(r.getLong(0) === 0L && r.isNullAt(1))
    // grouped over empty: zero rows
    val g = spark.sql(
      "SELECT p, count(*) AS n FROM gap.db.t8 GROUP BY p")
    assert(g.collect().isEmpty)
  }

  test("typed bounds: dates and timestamps round-trip through the maps") {
    warehouse
    spark.sql("CREATE TABLE gap.db.t9 (d DATE, ts TIMESTAMP, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10', " +
      "'stats_columns'='d,ts')")
    spark.sql("INSERT INTO gap.db.t9 VALUES " +
      "(DATE'2024-01-31', TIMESTAMP'2024-01-31 23:59:59.123456', 'a'), " +
      "(DATE'2023-06-01', TIMESTAMP'2023-06-01 00:00:00', 'b')")
    val q = spark.sql(
      "SELECT min(d) AS dlo, max(ts) AS thi, count(*) AS n FROM gap.db.t9")
    assert(pushedAgg(q), s"plan:\n${q.queryExecution}")
    val r = q.collect().head
    assert(r.getDate(0).toString === "2023-06-01")
    assert(r.getTimestamp(1).toString === "2024-01-31 23:59:59.123456")
    assert(r.getLong(2) === 2L)
    // and the metadata answer equals the scan answer exactly
    val scan = spark.read.format("graft")
      .load(Paths.get(warehouse, "db", "t9").toString)
      .selectExpr("min(d)", "max(ts)").collect().head
    assert(scan.getDate(0) === r.getDate(0))
    assert(scan.getTimestamp(1) === r.getTimestamp(1))
  }

  test("the registry query graft_agg_push plans the metadata-only scan") {
    val df = graft.SparkEntry.queries("graft_agg_push")(
      spark, "/root/testdata/sf0.001")
    assert(pushedAgg(df),
      s"the flagship metadata-aggregate query must actually push:\n" +
        df.queryExecution.executedPlan)
    assert(df.collect().nonEmpty)
  }

  test("time travel aggregates against the pinned snapshot's metadata") {
    seed("t10") // v1: 5 rows
    spark.sql("INSERT INTO gap.db.t10 VALUES (6, 3.0, 'c')") // v2: 6 rows
    val now = spark.sql("SELECT count(*) AS n FROM gap.db.t10")
    val old = spark.sql("SELECT count(*) AS n FROM gap.db.t10 VERSION AS OF 1")
    assert(pushedAgg(now) && pushedAgg(old))
    assert(now.collect().head.getLong(0) === 6L)
    assert(old.collect().head.getLong(0) === 5L)
  }
}
