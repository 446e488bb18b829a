package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.AtomicTable

/** Multi-level `PARTITIONED BY (c1, c2)` through the SQL surface: the
  * catalog's DDL, INSERT paths, metadata tables, metadata-only DELETE,
  * row-level UPDATE/MERGE, pruned scans and the DSv2 path writer. */
class GraftMultiPartitionSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-mcat").toString
    spark.conf.set("spark.sql.catalog.mcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcat.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcat.db")
    w
  }

  private def seed(table: String): Unit = {
    spark.sql(s"CREATE TABLE $table (id BIGINT, v DOUBLE, ym STRING, " +
      "status STRING) PARTITIONED BY (ym, status)")
    spark.sql(s"INSERT INTO $table VALUES " +
      "(1, 1.5, '1995-01', 'F'), (2, 2.5, '1995-01', 'O'), " +
      "(3, 3.5, '1995-02', 'F'), (4, 4.5, '1995-02', 'O'), " +
      "(5, 5.5, '1995-03', 'F'), (6, 6.5, '1995-03', 'O')")
  }

  test("CREATE + INSERT + SELECT on a two-level table; scans prune per level") {
    warehouse
    seed("mcat.db.m1")
    assert(spark.sql("SELECT sum(id) FROM mcat.db.m1").as[Long].head() === 21L)
    // manifest keys are composite, dirs nest both levels
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "m1")).get
    assert(m.partitions.keySet === Set(
      "1995-01/F", "1995-01/O", "1995-02/F", "1995-02/O",
      "1995-03/F", "1995-03/O"))
    m.allDirs.foreach(d => assert(
      d.matches("data/txn-[^/]+/ym=[^/]+/status=[^/]+"), d))
    // a filter on EITHER level prunes from metadata: input partition
    // count drops before any file is opened
    val byYm = spark.sql("SELECT id FROM mcat.db.m1 WHERE ym = '1995-02'")
    assert(byYm.rdd.getNumPartitions === 2)
    assert(byYm.as[Long].collect().toSet === Set(3L, 4L))
    val byStatus = spark.sql("SELECT id FROM mcat.db.m1 WHERE status = 'F'")
    assert(byStatus.rdd.getNumPartitions === 3)
    assert(byStatus.as[Long].collect().toSet === Set(1L, 3L, 5L))
    val byBoth = spark.sql(
      "SELECT id FROM mcat.db.m1 WHERE ym = '1995-03' AND status = 'O'")
    assert(byBoth.rdd.getNumPartitions === 1)
    assert(byBoth.as[Long].collect().toSet === Set(6L))
  }

  test("$partitions and $detail expose both levels") {
    warehouse
    seed("mcat.db.m2")
    val parts = spark.sql(
      "SELECT partition FROM mcat.db.`m2$partitions` ORDER BY partition")
      .as[String].collect().toSeq
    assert(parts === Seq("1995-01/F", "1995-01/O", "1995-02/F",
      "1995-02/O", "1995-03/F", "1995-03/O"))
    assert(spark.sql("SELECT partition_column FROM mcat.db.`m2$detail`")
      .as[String].head() === "ym,status")
  }

  test("metadata-only DELETE on one level drops every matching composite") {
    warehouse
    seed("mcat.db.m3")
    val root = Paths.get(warehouse, "db", "m3")
    val v1 = AtomicTable.currentVersion(root).get
    spark.sql("DELETE FROM mcat.db.m3 WHERE ym = '1995-02'")
    val m = AtomicTable.manifest(root).get
    assert(m.version === v1 + 1)
    assert(m.operation === "delete")
    assert(m.partitions.keySet ===
      Set("1995-01/F", "1995-01/O", "1995-03/F", "1995-03/O"))
    assert(spark.sql("SELECT count(*) FROM mcat.db.m3").as[Long].head() === 4L)
    // both levels pinned: exactly one composite drops, still metadata-only
    spark.sql("DELETE FROM mcat.db.m3 WHERE ym = '1995-01' AND status = 'O'")
    assert(AtomicTable.manifest(root).get.partitions.keySet ===
      Set("1995-01/F", "1995-03/F", "1995-03/O"))
  }

  test("row-level UPDATE and MERGE rewrite only matching composites") {
    warehouse
    seed("mcat.db.m4")
    val root = Paths.get(warehouse, "db", "m4")
    val before = AtomicTable.manifest(root).get
    spark.sql("UPDATE mcat.db.m4 SET v = v + 100 WHERE ym = '1995-01' AND id = 1")
    val after = AtomicTable.manifest(root).get
    assert(spark.sql("SELECT v FROM mcat.db.m4 WHERE id = 1")
      .as[Double].head() === 101.5)
    // runtime group filtering: only 1995-01's composites rewrote
    val changed = after.partitions.keySet.filter(k =>
      after.partitions(k) != before.partitions.getOrElse(k, Nil))
    assert(changed.forall(_.startsWith("1995-01/")),
      s"non-1995-01 partitions rewrote: $changed")
    // MERGE: update one composite, insert a brand-new one
    Seq((5L, 50.0, "1995-03", "F"), (9L, 9.5, "1995-04", "O"))
      .toDF("id", "v", "ym", "status").createOrReplaceTempView("m4src")
    spark.sql("""MERGE INTO mcat.db.m4 t USING m4src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT v FROM mcat.db.m4 WHERE id = 5")
      .as[Double].head() === 50.0)
    assert(AtomicTable.manifest(root).get.partitions.contains("1995-04/O"))
    assert(spark.sql("SELECT count(*) FROM mcat.db.m4").as[Long].head() === 7L)
  }

  test("dynamic overwrite and the DSv2 path writer handle two levels") {
    warehouse
    val dir = Files.createTempDirectory("graft-mp-dsv2").resolve("t").toString
    val df = Seq((1L, "1995-01", "F"), (2L, "1995-01", "O"), (3L, "1995-02", "F"))
      .toDF("id", "ym", "status")
    df.write.format("graft").mode("append")
      .option("partition", "ym,status").save(dir)
    val m1 = AtomicTable.manifest(Paths.get(dir)).get
    assert(m1.partitions.keySet === Set("1995-01/F", "1995-01/O", "1995-02/F"))
    // a second append grows exactly the touched composite's dir list
    Seq((20L, "1995-01", "O")).toDF("id", "ym", "status")
      .write.format("graft").mode("append")
      .option("partition", "ym,status").save(dir)
    val back = spark.read.format("graft").load(dir)
    assert(back.select("id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 20L))
    // the read restores both partition columns
    assert(back.filter(col("status") === "F").select("id")
      .as[Long].collect().toSet === Set(1L, 3L))
    val m2 = AtomicTable.manifest(Paths.get(dir)).get
    assert(m2.partitions("1995-01/O").size === 2)
    assert(m2.partitions("1995-01/F") === m1.partitions("1995-01/F"))
    // dynamic partition replace through SQL: only the composite present
    // in the data replaces; every other composite is untouched
    seed("mcat.db.m6")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(
      "INSERT OVERWRITE mcat.db.m6 VALUES (30, 30.5, '1995-02', 'O')")
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(spark.sql("SELECT id FROM mcat.db.m6").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 5L, 6L, 30L), "only 1995-02/O replaced")
  }

  test("partition-spec evolution rewrites the layout and later writes follow") {
    warehouse
    spark.sql("CREATE TABLE mcat.db.ev (id BIGINT, ym STRING, status STRING) " +
      "PARTITIONED BY (ym)")
    spark.sql("INSERT INTO mcat.db.ev VALUES (1, 'a', 'F'), (2, 'a', 'O'), " +
      "(3, 'b', 'F')")
    val root = Paths.get(warehouse, "db", "ev")
    assert(AtomicTable.manifest(root).get.partitions.keySet === Set("a", "b"))
    val cat = spark.sessionState.catalogManager.catalog("mcat")
      .asInstanceOf[GraftCatalog]
    cat.repartitionDeclaredTable(spark,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "ev"), "ym,status")
    val m = AtomicTable.manifest(root).get
    assert(m.operation === "repartition")
    assert(m.partitions.keySet === Set("a/F", "a/O", "b/F"))
    assert(spark.sql("SELECT sum(id) FROM mcat.db.ev").as[Long].head() === 6L)
    // a later catalog INSERT stages under the evolved two-level spec
    spark.sql("INSERT INTO mcat.db.ev VALUES (4, 'b', 'O')")
    assert(AtomicTable.manifest(root).get.partitions.keySet ===
      Set("a/F", "a/O", "b/F", "b/O"))
    // and the new level is prunable + metadata-deletable
    assert(spark.sql("SELECT id FROM mcat.db.ev WHERE status = 'O'")
      .as[Long].collect().toSet === Set(2L, 4L))
    spark.sql("DELETE FROM mcat.db.ev WHERE status = 'O'")
    assert(AtomicTable.manifest(root).get.partitions.keySet ===
      Set("a/F", "b/F"))
  }

  test("DPP on level 2 intersects with a static filter on level 1") {
    // adversarial spec shape: the STATIC filter prunes level 1 (ym) at
    // planning, the DPP dim admits values of level 2 ONLY (status) at
    // runtime — the per-level keep-set intersection must prune to the
    // single surviving composite without over-pruning either level.
    // The dim must be a REAL file scan: a literal Seq folds to a
    // LocalRelation, which has no Filter node for DPP to measure.
    val dir = Files.createTempDirectory("graft-mdpp").toString
    val fact = (1L to 2400L).map { i =>
      (i, s"1995-0${i % 3 + 1}", if (i % 4 < 2) "F" else "O")
    }.toDF("id", "ym", "status").repartition(col("ym"), col("status"))
    AtomicTable.replacePartitions(spark, dir, fact, "ym,status")
    assert(AtomicTable.manifest(Paths.get(dir)).get.partitions.size === 6)
    val dimPath = Files.createTempDirectory("graft-mdpp-dim").toString
    Seq(("F", "keep"), ("O", "drop")).toDF("status", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.format("graft").load(dir)
      .filter(col("ym") === "1995-02")
      .join(broadcast(dim.filter(col("tag") === "keep")), Seq("status"))
    val expected = (1L to 2400L)
      .filter(i => i % 3 + 1 == 2 && i % 4 < 2)
    // collect() drives THIS Dataset's QueryExecution — the plan
    // inspected below is the one that actually ran (a derived Dataset
    // would plan a FRESH scan whose runtime filter never fires)
    assert(joined.collect().map(_.getAs[Long]("id")).toSet ===
      expected.toSet, "neither level may over-prune")
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(q.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b)
        case o => o.children.flatMap(scansOf)
      }
    val scans = scansOf(joined.queryExecution.executedPlan)
      .filter(_.scan.isInstanceOf[GraftScan])
    assert(scans.nonEmpty, "no graft BatchScanExec in the executed plan")
    info("runtimeFilters: " + scans.head.runtimeFilters.mkString(" | "))
    assert(scans.head.runtimeFilters.nonEmpty,
      "the join must attach a runtime filter to the fact scan")
    assert(scans.head.scan.asInstanceOf[GraftScan]
      .planInputPartitions().map(
        _.asInstanceOf[GraftInputPartition].partValue).distinct.length === 1,
      "static ym + runtime status must intersect to ONE composite")
  }

  test("spec evolution on an EMPTY committed table updates meta, no crash") {
    warehouse
    spark.sql("CREATE TABLE mcat.db.ev0 (id BIGINT, ym STRING, " +
      "status STRING) PARTITIONED BY (ym)")
    spark.sql("INSERT INTO mcat.db.ev0 VALUES (1, 'a', 'F')")
    spark.sql("TRUNCATE TABLE mcat.db.ev0") // committed, zero partitions
    val cat = spark.sessionState.catalogManager.catalog("mcat")
      .asInstanceOf[GraftCatalog]
    cat.repartitionDeclaredTable(spark,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "ev0"), "ym,status")
    // the declared meta evolved; the next write follows the new spec
    spark.sql("INSERT INTO mcat.db.ev0 VALUES (2, 'b', 'O')")
    assert(AtomicTable.manifest(Paths.get(warehouse, "db", "ev0"))
      .get.partitions.keySet === Set("b/O"))
  }

  test("ALTER TABLE SET TBLPROPERTIES changes retain/stats; rejects the rest") {
    warehouse
    spark.sql("CREATE TABLE mcat.db.pr (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO mcat.db.pr VALUES (1, 'a')")
    // stats_columns takes effect on the NEXT write
    spark.sql("ALTER TABLE mcat.db.pr SET TBLPROPERTIES " +
      "('stats_columns'='id', 'retain'='7')")
    spark.sql("INSERT INTO mcat.db.pr VALUES (100, 'b')")
    val root = Paths.get(warehouse, "db", "pr")
    assert(AtomicTable.manifest(root).get.stats.get("b").exists(
      _.mins.get("id").contains("100")))
    assert(spark.sql("SELECT retain FROM mcat.db.`pr$detail`")
      .as[Int].head() === 7)
    // an unknown property must error, never be silently swallowed
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE mcat.db.pr SET TBLPROPERTIES ('path'='/x')")
    }
    assert(e.getMessage.contains("cannot be altered"))
    // UNSET returns the knobs to their defaults
    spark.sql("ALTER TABLE mcat.db.pr UNSET TBLPROPERTIES " +
      "('stats_columns', 'retain')")
    assert(spark.sql("SELECT stats_columns FROM mcat.db.`pr$detail`")
      .as[String].head() === "")
  }

  test("zone maps, stats_columns and key-grouped reads hold on two levels") {
    warehouse
    spark.sql("CREATE TABLE mcat.db.m5 (id BIGINT, ym STRING, status STRING) " +
      "PARTITIONED BY (ym, status) TBLPROPERTIES ('stats_columns'='id')")
    spark.sql("INSERT INTO mcat.db.m5 VALUES (1, 'a', 'F'), (100, 'b', 'O')")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "m5")).get
    assert(m.stats.keySet === Set("a/F", "b/O"))
    // zone-map prune on the stats column: only b/O admits id >= 50
    val q = spark.sql("SELECT id FROM mcat.db.m5 WHERE id >= 50")
    assert(q.rdd.getNumPartitions === 1)
    assert(q.as[Long].head() === 100L)
    // grouping by both partition columns plans no shuffle exchange
    val agg = spark.sql(
      "SELECT ym, status, count(*) AS n FROM mcat.db.m5 GROUP BY ym, status")
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"two-level key-grouped agg should not shuffle:\n$plan")
  }
}
