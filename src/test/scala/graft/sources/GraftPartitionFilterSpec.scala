package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite

/** Partition-column predicates are CONSUMED by the source (not returned
  * as residuals): partition pruning decides them exactly — every row of
  * a partition carries the partition value, admission compares in the
  * declared type's order — so Spark re-evaluating them row-by-row is
  * pure waste, and a residual Filter node blocks aggregate pushdown
  * under WHERE. The pins here assert BOTH halves: the Filter node is
  * gone from the plan (consumption really happened) AND the results are
  * exactly right (admission really is row-accurate), including the
  * numeric-partition trap where text order would lie ("10" < "9"). */
class GraftPartitionFilterSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-pfc").toString
    spark.conf.set("spark.sql.catalog.pfc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pfc.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pfc.db")
    w
  }

  private def filtersOf(p: SparkPlan): Seq[FilterExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      filtersOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      filtersOf(q.plan)
    case f: FilterExec => f +: f.children.flatMap(filtersOf)
    case o => o.children.flatMap(filtersOf)
  }

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case b: BatchScanExec => Seq(b)
    case o => o.children.flatMap(scansOf)
  }

  test("an equality partition predicate leaves NO residual Filter") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t1 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO pfc.db.t1 VALUES (1,'a'),(2,'a'),(3,'b'),(4,'c')")
    val q = spark.sql("SELECT id, p FROM pfc.db.t1 WHERE p = 'a'")
    // Spark pushes [IsNotNull(p), EqualTo(p,'a')] — both consumed
    assert(filtersOf(q.queryExecution.executedPlan).isEmpty,
      s"consumed partition filters must leave no Filter node:\n" +
        q.queryExecution.executedPlan)
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "a")))
    assert(scansOf(q.queryExecution.executedPlan)
      .head.inputRDD.getNumPartitions === 1, "one table partition planned")
  }

  test("typed range on a BIGINT partition column (the '10' < '9' trap)") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t2 (v DOUBLE, k BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO pfc.db.t2 VALUES (0.5,9),(1.5,10),(2.5,100)")
    val q = spark.sql("SELECT v, k FROM pfc.db.t2 WHERE k > 9")
    assert(filtersOf(q.queryExecution.executedPlan).isEmpty,
      s"range on the partition key must consume:\n" +
        q.queryExecution.executedPlan)
    assert(q.collect().map(_.getLong(1)).toSet === Set(10L, 100L),
      "text order would have dropped partition 10")
  }

  test("mixed predicate: partition half consumed, data half residual") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t3 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO pfc.db.t3 VALUES (1,'a'),(2,'a'),(3,'b')")
    val q = spark.sql("SELECT id FROM pfc.db.t3 WHERE p = 'a' AND id > 1")
    val fs = filtersOf(q.queryExecution.executedPlan)
    assert(fs.nonEmpty, "the data predicate must stay residual")
    val cond = fs.map(_.condition.toString).mkString(" ")
    assert(cond.contains("id"), s"residual must carry id: $cond")
    assert(!cond.contains("p#") && !cond.toLowerCase.contains("isnotnull(p"),
      s"partition predicates must be consumed, not re-checked: $cond")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("aggregate pushdown composes with a consumed partition filter") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t4 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5', " +
      "'stats_columns'='id')")
    spark.sql("INSERT INTO pfc.db.t4 VALUES (1,'a'),(2,'a'),(3,'b'),(4,'c')")
    val q = spark.sql(
      "SELECT count(*) AS n, min(id) AS lo, max(id) AS hi " +
        "FROM pfc.db.t4 WHERE p IN ('a', 'b')")
    assert(scansOf(q.queryExecution.executedPlan)
      .exists(_.scan.isInstanceOf[GraftAggScan]),
      s"count of two partitions must be a metadata lookup:\n" +
        q.queryExecution.executedPlan)
    // the decisive pin: the files are gone, the answer is not
    val root = Paths.get(warehouse, "db", "t4")
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asInstanceOf[java.util.Iterator[Path]]
      .forEachRemaining(f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.delete(f))
    finally s.close()
    val r = q.collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 1L && r.getLong(2) === 3L)
  }

  test("a data filter still blocks aggregate pushdown") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t5 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5', " +
      "'stats_columns'='id')")
    spark.sql("INSERT INTO pfc.db.t5 VALUES (1,'a'),(2,'a'),(3,'b')")
    val q = spark.sql(
      "SELECT count(*) AS n FROM pfc.db.t5 WHERE p = 'a' AND id > 1")
    assert(!scansOf(q.queryExecution.executedPlan)
      .exists(_.scan.isInstanceOf[GraftAggScan]))
    assert(q.collect().head.getLong(0) === 1L)
  }

  test("IN with a NULL element stays residual (null never metadata-matches)") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t6 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO pfc.db.t6 VALUES (1,'a'),(2,'null')")
    // p IN ('null', NULL): the literal NULL makes the In unconsumable;
    // the TEXT 'null' partition must still match exactly
    val q = spark.sql(
      "SELECT id FROM pfc.db.t6 WHERE p IN ('null', CAST(NULL AS STRING))")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("multi-level spec: one level consumed, the other untouched") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t7 (id BIGINT, c1 STRING, c2 BIGINT) " +
      "PARTITIONED BY (c1, c2) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO pfc.db.t7 VALUES " +
      "(1,'x',9),(2,'x',10),(3,'y',9),(4,'y',10)")
    val q = spark.sql("SELECT id FROM pfc.db.t7 WHERE c2 >= 10")
    assert(filtersOf(q.queryExecution.executedPlan).isEmpty,
      s"level-2 range must consume:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.getLong(0)).toSet === Set(2L, 4L))
  }

  test("DATE partition column: typed consumption, correct rows") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t8 (id BIGINT, d DATE) " +
      "PARTITIONED BY (d) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO pfc.db.t8 VALUES " +
      "(1, DATE'2024-01-31'), (2, DATE'2024-02-01'), (3, DATE'2024-02-02')")
    val q = spark.sql(
      "SELECT id FROM pfc.db.t8 WHERE d >= DATE'2024-02-01'")
    assert(filtersOf(q.queryExecution.executedPlan).isEmpty)
    assert(q.collect().map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  test("streaming: a consumed partition filter stays row-accurate") {
    warehouse
    spark.sql("CREATE TABLE pfc.db.t9 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO pfc.db.t9 VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO pfc.db.t9 VALUES (3,'a'),(4,'c')")
    val dir = Paths.get(warehouse, "db", "t9").toString
    val q = spark.readStream.format("graft").load(dir)
      .filter($"p" === "a").select("id")
      .writeStream.format("memory").queryName("pfc_t9")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT id FROM pfc_t9")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L),
      "the stream must emit exactly partition a's rows — admission is " +
        "the only gate once the filter is consumed")
  }
}
