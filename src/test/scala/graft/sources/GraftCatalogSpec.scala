package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.AtomicTable

/** The graft [[GraftCatalog]]: AtomicTables as a SQL-native V2 catalog —
  * DDL, INSERT, and Spark's own VERSION AS OF / TIMESTAMP AS OF syntax. */
class GraftCatalogSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
    w
  }

  test("CREATE TABLE + INSERT INTO + SELECT, all through the catalog") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.t1 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.t1 VALUES (1, 1.5, 'a'), (2, 2.5, 'b')")
    assert(spark.sql("SELECT id, v, p FROM gcat.db.t1 ORDER BY id")
      .as[(Long, Double, String)].collect().toSeq ===
      Seq((1L, 1.5, "a"), (2L, 2.5, "b")))
    // plain INSERT INTO appends (existing partitions keep their rows)
    spark.sql("INSERT INTO gcat.db.t1 VALUES (3, 3.5, 'c')")
    assert(spark.sql("SELECT count(*) FROM gcat.db.t1").as[Long].head() === 3L)
    // by-name insert resolves against the declared schema
    spark.sql("INSERT INTO gcat.db.t1 (p, id, v) VALUES ('d', 4, 4.5)")
    assert(spark.sql("SELECT v FROM gcat.db.t1 WHERE p = 'd'")
      .as[Double].head() === 4.5)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve snapshots") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.tt (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.tt VALUES (1, 'a'), (2, 'a')")  // v1
    spark.sql("INSERT INTO gcat.db.tt VALUES (3, 'b')")            // v2
    spark.sql("INSERT INTO gcat.db.tt VALUES (7, 'a')")            // v3 appends to a
    def ids(sql: String): Set[Long] =
      spark.sql(sql).as[Long].collect().toSet
    assert(ids("SELECT id FROM gcat.db.tt") === Set(1L, 2L, 3L, 7L))
    assert(ids("SELECT id FROM gcat.db.tt VERSION AS OF 1") === Set(1L, 2L))
    assert(ids("SELECT id FROM gcat.db.tt VERSION AS OF 2") === Set(1L, 2L, 3L))
    val t2 = AtomicTable.commitTimeMs(
      Paths.get(warehouse, "db", "tt"), 2L)
    assert(ids(s"SELECT id FROM gcat.db.tt TIMESTAMP AS OF timestamp_millis($t2)")
      === Set(1L, 2L, 3L))
    assert(ids(s"SELECT id FROM gcat.db.tt TIMESTAMP AS OF " +
      s"timestamp_millis(${t2 + 100000})") === Set(1L, 2L, 3L, 7L),
      "past v3, partition a holds its appended row too")
  }

  test("INSERT OVERWRITE truncates; CTAS creates and fills in one statement") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.t2 (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.t2 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE gcat.db.t2 VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM gcat.db.t2").as[Long].collect().toSeq
      === Seq(9L))

    spark.sql("CREATE TABLE gcat.db.t3 PARTITIONED BY (p) AS " +
      "SELECT id * 10 AS id, p FROM gcat.db.t2")
    assert(spark.sql("SELECT id, p FROM gcat.db.t3")
      .as[(Long, String)].collect().toSeq === Seq((90L, "z")))
  }

  test("catalog inventory: SHOW TABLES / DROP / RENAME, manifests stay the truth") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.a (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("CREATE TABLE gcat.db.b (id BIGINT, p STRING) PARTITIONED BY (p)")
    val listed = spark.sql("SHOW TABLES IN gcat.db")
      .select("tableName").as[String].collect().toSet
    assert(Set("a", "b").subsetOf(listed))
    spark.sql("INSERT INTO gcat.db.a VALUES (5, 'x')")
    spark.sql("ALTER TABLE gcat.db.a RENAME TO db.a2")
    assert(spark.sql("SELECT id FROM gcat.db.a2").as[Long].head() === 5L)
    // the moved table is still a plain AtomicTable on disk
    assert(AtomicTable.currentVersion(
      Paths.get(warehouse, "db", "a2")).contains(1L))
    spark.sql("DROP TABLE gcat.db.b")
    assert(!spark.sql("SHOW TABLES IN gcat.db")
      .select("tableName").as[String].collect().contains("b"))
    intercept[Exception] { spark.sql("SELECT * FROM gcat.db.b").collect() }
  }

  test("catalog tables interoperate with the Scala API and path reads") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.ix (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.ix VALUES (1, 'a'), (2, 'b')")
    val dir = Paths.get(warehouse, "db", "ix").toString
    // path-based format read sees the same table
    assert(spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    // a Scala-API commit (zone-mapped) lands as the catalog's next version
    AtomicTable.replacePartitions(spark, dir,
      Seq((9L, "c")).toDF("id", "p"), "p", statsColumns = Seq("id"),
      retain = 8)  // retention is per-commit: Scala writers must carry it too
    assert(spark.sql("SELECT id FROM gcat.db.ix").as[Long].collect().toSet
      === Set(1L, 2L, 9L))
    assert(spark.sql("SELECT id FROM gcat.db.ix VERSION AS OF 1")
      .as[Long].collect().toSet === Set(1L, 2L))
  }

  test("$history metadata table is DESCRIBE HISTORY from pure SQL") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.h (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.h VALUES (1, 'a')")
    spark.sql("INSERT INTO gcat.db.h VALUES (2, 'b')")
    val h = spark.sql("SELECT version, operation, num_partitions " +
      "FROM gcat.db.`h$history` ORDER BY version DESC")
      .as[(Long, String, Int)].collect().toSeq
    assert(h === Seq((2L, "append", 2), (1L, "append", 1)))
    val ts = spark.sql("SELECT unix_millis(timestamp) FROM gcat.db.`h$history`")
      .as[Long].collect().toSeq
    assert(ts === ts.sorted.reverse && ts.distinct.size === 2,
      "newest first, strictly monotonic commit clock")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only evolution, old partitions null-fill") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.ev (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.ev VALUES (1, 'a'), (2, 'b')")       // pre-evolution
    val vBefore = AtomicTable.currentVersion(
      Paths.get(warehouse, "db", "ev")).get
    spark.sql("ALTER TABLE gcat.db.ev ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(AtomicTable.currentVersion(Paths.get(warehouse, "db", "ev"))
      .contains(vBefore), "evolution is metadata-only: no table commit")
    spark.sql("INSERT INTO gcat.db.ev VALUES (3, 'c', 3.5, 'new')")     // post-evolution
    val got = spark.sql("SELECT id, p, score, tag FROM gcat.db.ev ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2).toString,
        r.getString(3))).toSeq
    assert(got === Seq((1L, "a", null, null), (2L, "b", null, null),
      (3L, "c", "3.5", "new")))
    // filters on the evolved column work across old and new partitions
    assert(spark.sql("SELECT id FROM gcat.db.ev WHERE score IS NULL ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // time travel to the pre-evolution version reads the OLD shape
    assert(spark.sql(s"SELECT * FROM gcat.db.ev VERSION AS OF $vBefore")
      .schema.fieldNames.toSeq === Seq("id", "p"))
    // guard rails: duplicate and non-appended adds are refused
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.ev ADD COLUMNS (id BIGINT)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gcat.db.ev ADD COLUMNS (x INT AFTER id)")
    }
  }

  test("streaming by table name: readStream.table + writeStream.toTable chain") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.src (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("CREATE TABLE gcat.db.dst (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.src VALUES (1, 'a'), (2, 'b')")
    val ckpt = Files.createTempDirectory("graft-cat-st").toString
    // one hop: changefeed of src -> exactly-once sink into dst, both by NAME
    val q = spark.readStream.table("gcat.db.src")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("gcat.db.dst")
    try q.awaitTermination() finally q.stop()
    assert(spark.sql("SELECT id FROM gcat.db.dst").as[Long].collect().toSet
      === Set(1L, 2L))
    // new commit on src; restart drains only the delta
    spark.sql("INSERT INTO gcat.db.src VALUES (3, 'c')")
    val q2 = spark.readStream.table("gcat.db.src")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("gcat.db.dst")
    try q2.awaitTermination() finally q2.stop()
    assert(spark.sql("SELECT id FROM gcat.db.dst").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
  }

  test("stats_columns: catalog INSERTs commit zone maps, reads prune on them") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.zm (id BIGINT, ts TIMESTAMP, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns' = 'id,ts')")
    spark.sql("INSERT INTO gcat.db.zm VALUES " +
      "(1, TIMESTAMP '2020-01-05 10:00:00', 'a'), " +
      "(9, TIMESTAMP '2020-01-07 10:00:00', 'a'), " +
      "(100, TIMESTAMP '2021-06-01 00:00:00', 'b'), " +
      "(200, TIMESTAMP '2022-06-01 00:00:00', 'c')")
    val dir = Paths.get(warehouse, "db", "zm")
    val m = AtomicTable.manifest(dir).get
    assert(m.stats.keySet === Set("a", "b", "c"),
      "every written partition carries a zone map")
    assert(m.stats("a").rows === 2L)
    assert(m.stats("a").mins("id") === "1" && m.stats("a").maxs("id") === "9")
    assert(m.stats("a").mins("ts") === "2020-01-05 10:00:00")
    // metadata skipping: id >= 150 keeps only partition c
    val pruned = spark.sql("SELECT id FROM gcat.db.zm WHERE id >= 150")
    assert(pruned.rdd.getNumPartitions === 1)
    assert(pruned.as[Long].collect().toSeq === Seq(200L))
    // timestamp bounds prune too
    val tsPruned = spark.sql(
      "SELECT id FROM gcat.db.zm WHERE ts >= TIMESTAMP '2022-01-01 00:00:00'")
    assert(tsPruned.rdd.getNumPartitions === 1)
    assert(tsPruned.as[Long].collect().toSeq === Seq(200L))
    // a row-level SQL UPDATE recomputes the rewritten partition's map
    spark.sql("UPDATE gcat.db.zm SET id = id + 1000 WHERE p = 'a'")
    val m2 = AtomicTable.manifest(dir).get
    assert(m2.stats("a").mins("id") === "1001" &&
      m2.stats("a").maxs("id") === "1009")
    assert(m2.stats("b").mins("id") === "100",
      "untouched partition's map carried by reference")
    // history row totals come from the maps
    assert(AtomicTable.history(dir).head.rows === Some(4L))
  }

  test("$partitions metadata table exposes the layout and zone maps to SQL") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.pm (id BIGINT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('stats_columns' = 'id')")
    spark.sql("INSERT INTO gcat.db.pm VALUES (1, 'a'), (2, 'a'), (50, 'b')")
    val got = spark.sql("SELECT partition, num_rows, mins['id'], maxs['id'], " +
      "delete_vectors FROM gcat.db.`pm$partitions` ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getInt(4))).toSeq
    assert(got === Seq(("a", 2L, "1", "2", 0), ("b", 1L, "50", "50", 0)))
  }

  test("INSERT OVERWRITE PARTITION replaces exactly the named partition") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.ow (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.ow VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    val dir = Paths.get(warehouse, "db", "ow")
    val before = AtomicTable.manifest(dir).get
    spark.sql("INSERT OVERWRITE gcat.db.ow PARTITION (p = 'a') SELECT 9 AS id")
    val got = spark.sql("SELECT id, p FROM gcat.db.ow ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((3L, "b"), (9L, "a")))
    assert(AtomicTable.manifest(dir).get.partitions("b")
      === before.partitions("b"), "unnamed partition carried by reference")
    // overwriting an emptied partition spec drops it even with no new rows
    spark.sql("INSERT OVERWRITE gcat.db.ow PARTITION (p = 'b') " +
      "SELECT id FROM gcat.db.ow WHERE false")
    assert(spark.sql("SELECT p FROM gcat.db.ow").as[String].collect().toSeq
      === Seq("a"))
  }

  test("dynamic partitionOverwriteMode: only partitions in the data replace") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.dyn (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.dyn VALUES (1, 'a'), (3, 'b')")
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      spark.sql("INSERT OVERWRITE gcat.db.dyn VALUES (8, 'a'), (9, 'c')")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(spark.sql("SELECT id, p FROM gcat.db.dyn ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((3L, "b"), (8L, "a"), (9L, "c")),
      "a replaced, b untouched, c added")
  }

  test("writes cluster by the partition column: one file per partition") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.files (id BIGINT, p STRING) PARTITIONED BY (p)")
    // rows deliberately spread over many input tasks (no pre-repartition)
    spark.range(0, 1000, 1, 8)
      .selectExpr("id", "CAST(id % 3 AS STRING) AS p")
      .createOrReplaceTempView("files_src")
    spark.sql("INSERT INTO gcat.db.files SELECT * FROM files_src")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "files")).get
    m.partitions.values.flatten.foreach { d =>
      val dir = Paths.get(warehouse, "db", "files").resolve(d)
      val s = Files.list(dir)
      val n = try s.filter(f => f.toString.endsWith(".parquet")).count()
        finally s.close()
      assert(n === 1L,
        s"required distribution must yield ONE file per partition, got $n in $d")
    }
    assert(spark.sql("SELECT count(*) FROM gcat.db.files").as[Long].head()
      === 1000L)
  }

  test("key-grouped scan report: co-partitioned join and agg skip the shuffle") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.spj1 (id BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("CREATE TABLE gcat.db.spj2 (v BIGINT, p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.spj1 VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("INSERT INTO gcat.db.spj2 VALUES (10,'a'),(20,'b'),(30,'c')")
    val prev = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // aggregation clustered on the partition column: no exchange
      val agg = spark.sql(
        "SELECT p, count(*) AS n FROM gcat.db.spj1 GROUP BY p")
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        s"agg on the partition column must not shuffle:\n${agg.queryExecution.executedPlan}")
      assert(agg.collect().length === 3)
      // storage-partitioned join: both sides key-grouped on p, no exchange
      val j = spark.sql("SELECT t1.id, t2.v FROM gcat.db.spj1 t1 " +
        "JOIN gcat.db.spj2 t2 ON t1.p = t2.p")
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        s"co-partitioned join must not shuffle:\n${j.queryExecution.executedPlan}")
      assert(j.collect().length === 3)
      // a scan that prunes the partition column OUT of its output must
      // still plan (the key-grouped report references p by name)
      assert(spark.sql("SELECT id FROM gcat.db.spj1").collect().length === 3)
      assert(spark.sql("SELECT sum(id) FROM gcat.db.spj1 WHERE id > 0")
        .as[Long].head() === 6L)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a BIGINT partition column reads typed and prunes numerically") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.np (id BIGINT, p BIGINT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.np VALUES (1, 9), (2, 10), (3, 100)")
    // typed read-back: p comes out as BIGINT values, not strings
    assert(spark.sql("SELECT id, p FROM gcat.db.np ORDER BY p")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 9L), (2L, 10L), (3L, 100L)))
    // numeric pruning: lexicographic "10" < "9" must NOT lose rows
    val gt = spark.sql("SELECT id FROM gcat.db.np WHERE p > 9")
    assert(gt.as[Long].collect().toSet === Set(2L, 3L))
    assert(gt.rdd.getNumPartitions === 2, "p=9 pruned from metadata")
    assert(spark.sql("SELECT id FROM gcat.db.np WHERE p = 10")
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("$detail metadata table and catalog batch change feed") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.dt (id BIGINT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('stats_columns' = 'id', 'retain' = '6')")
    spark.sql("INSERT INTO gcat.db.dt VALUES (1, 'a'), (2, 'b')")  // v1
    spark.sql("INSERT INTO gcat.db.dt VALUES (3, 'c')")            // v2
    val d = spark.sql("SELECT version, num_partitions, num_rows, " +
      "partition_column, retain, stats_columns FROM gcat.db.`dt$detail`")
      .collect().head
    assert((d.getLong(0), d.getInt(1), d.getLong(2), d.getString(3),
      d.getInt(4), d.getString(5)) === ((2L, 3, 3L, "p", 6, "id")))
    // batch CDF through the catalog name: read options reach the scan
    assert(spark.read.option("startingVersion", "2").table("gcat.db.dt")
      .select("id").as[Long].collect().toSeq === Seq(3L))
  }

  test("empty created table is loadable with its declared schema") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.empty (x INT, s STRING, p STRING) " +
      "PARTITIONED BY (p)")
    val df = spark.sql("SELECT * FROM gcat.db.empty")
    assert(df.schema.fieldNames.toSeq === Seq("x", "s", "p"))
    assert(df.count() === 0L)
  }

  test("CALL system.table_changes registers a full-fidelity changelog view") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.cf (id BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain' = '20')")
    spark.sql("INSERT INTO gcat.db.cf VALUES (1, 10, 'a'), (2, 20, 'a')") // v1
    spark.sql("UPDATE gcat.db.cf SET v = 21 WHERE id = 2")                // v2
    spark.sql("DELETE FROM gcat.db.cf WHERE id = 1")                      // v3
    val res = spark.sql("CALL gcat.system.table_changes(" +
      "'db.cf', 2, 3, 'id', 'cf_changes')").collect()
    assert(res.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq(("cf_changes", 2L, 3L)))
    // the view IS the ChangeFeed frame: update pre/post at v2, the
    // row-level delete at v3 — pure SQL end to end
    val ch = spark.sql("SELECT id, v, _change_type, _commit_version " +
      "FROM cf_changes").as[(Long, Long, String, Long)].collect().toSet
    assert(ch === Set(
      (2L, 20L, "update_preimage", 2L),
      (2L, 21L, "update_postimage", 2L),
      (1L, 10L, "delete", 3L)))
    // SHOW PROCEDURES-style discovery
    assert(spark.sessionState.catalogManager.catalog("gcat")
      .asInstanceOf[GraftCatalog]
      .listProcedures(Array("system")).map(_.name()).toSeq ===
      Seq("table_changes", "compact", "vacuum", "rollback", "clone",
        "analyze", "create_mv", "refresh_mv", "tag", "untag",
        "rebuild_blooms"))
  }

  test("CALL system.compact folds small-file debt in fragmented partitions only") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.mnt (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain' = '10', " +
      "'stats_columns' = 'id')")
    // three single-partition inserts fragment 'a'; 'b' stays healthy
    spark.sql("INSERT INTO gcat.db.mnt VALUES (1, 1.0, 'a')")
    spark.sql("INSERT INTO gcat.db.mnt VALUES (2, 2.0, 'a')")
    spark.sql("INSERT INTO gcat.db.mnt VALUES (3, 3.0, 'a'), (4, 4.0, 'b')")
    val dir = Paths.get(warehouse, "db", "mnt")
    val before = AtomicTable.dataFileCount(dir)
    assert(before >= 4L) // >=3 files under 'a', >=1 under 'b'
    val res = spark.sql("CALL gcat.system.compact('db.mnt', 3)")
      .as[(Long, Long, Long)].head()
    assert(res._2 === before)
    // 'a' folded to one file; 'b' untouched (targeted, not full-table)
    val mAfter = AtomicTable.manifest(dir).get
    assert(mAfter.partitions("a").size === 1)
    assert(mAfter.partitions("b") ===
      AtomicTable.manifestAt(dir, mAfter.version - 1).partitions("b"))
    assert(res._3 < before)
    // zone maps survive the rewrite (stats_columns carried through)
    assert(mAfter.stats("a").mins.contains("id"))
    // rows unchanged
    assert(spark.sql("SELECT count(*) FROM gcat.db.mnt").as[Long].head() === 4L)
    // a table below the threshold is a no-op (same version back)
    val noop = spark.sql("CALL gcat.system.compact('db.mnt', 3)")
      .as[(Long, Long, Long)].head()
    assert(noop._1 === mAfter.version && noop._2 === noop._3)
  }

  test("CALL system.rollback restores a retained version as a new commit") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.rb (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain' = '10')")
    spark.sql("INSERT INTO gcat.db.rb VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("DELETE FROM gcat.db.rb WHERE id = 1")              // v2 (bad)
    assert(spark.sql("SELECT count(*) FROM gcat.db.rb").as[Long].head() === 1L)
    val res = spark.sql("CALL gcat.system.rollback('db.rb', 1)")
      .as[(Long, Long)].head()
    assert(res === ((1L, 3L)))
    assert(spark.sql("SELECT id FROM gcat.db.rb ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L))
    // history preserved: the bad v2 stays readable inside retention
    assert(spark.sql("SELECT count(*) FROM gcat.db.rb VERSION AS OF 2")
      .as[Long].head() === 1L)
  }

  test("CALL system.vacuum reclaims orphaned staging dirs, none referenced") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.vac (id BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO gcat.db.vac VALUES (1, 'a')")
    // fake a crashed writer's never-committed staging dir
    val orphan = Paths.get(warehouse, "db", "vac", "data", "txn-deadbeef")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val res = spark.sql("CALL gcat.system.vacuum('db.vac', 0)")
      .as[Long].head()
    assert(res === 1L)
    assert(!Files.exists(orphan))
    assert(spark.sql("SELECT count(*) FROM gcat.db.vac").as[Long].head() === 1L)
  }

  test("CALL system.clone: independent zero-copy table with carried meta") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.clsrc (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain' = '10')")
    spark.sql("INSERT INTO gcat.db.clsrc VALUES (1, 'a'), (2, 'b')") // v1
    spark.sql("INSERT INTO gcat.db.clsrc VALUES (3, 'c')")           // v2
    // clone the CURRENT snapshot (version <= 0)
    val res = spark.sql("CALL gcat.system.clone('db.clsrc', 'db.cldst', 0)")
      .as[(Long, Long)].head()
    assert(res._2 === 3L)
    assert(spark.sql("SELECT id FROM gcat.db.cldst ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // declared meta carried: the clone keeps the partition contract
    spark.sql("INSERT INTO gcat.db.cldst VALUES (4, 'd')")
    assert(AtomicTable.manifest(Paths.get(warehouse, "db", "cldst"))
      .get.partitions.keySet.contains("d"))
    // independence: mutating the clone never leaks into the source
    assert(spark.sql("SELECT count(*) FROM gcat.db.clsrc").as[Long].head() === 3L)
    // a historical clone takes the retained snapshot, not the head
    spark.sql("CALL gcat.system.clone('db.clsrc', 'db.cldst1', 1)")
    assert(spark.sql("SELECT count(*) FROM gcat.db.cldst1").as[Long].head() === 2L)
    // refusing to clobber an existing table
    intercept[Exception] {
      spark.sql("CALL gcat.system.clone('db.clsrc', 'db.cldst', 0)").collect()
    }
  }

  test("CALL system.create_mv maintains avg: and approx: aggregates") {
    warehouse
    spark.sql("CREATE TABLE gcat.db.apxsrc (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO gcat.db.apxsrc VALUES " +
      "(1, 10.0, 'a'), (2, 30.0, 'a'), (3, 5.0, 'b')")
    spark.sql("CALL gcat.system.create_mv('db.apxmv', 'db.apxsrc', 'p', " +
      "'v_sum,v_avg,id_dist', 'CAST(v AS DECIMAL(18,2));avg:v_sum;approx:id', " +
      "'p', 'id')")
    // a keyed DELETE forces the sketch's bounded recompute; an INSERT
    // exercises the hll_union merge
    spark.sql("DELETE FROM gcat.db.apxsrc WHERE id = 2")
    spark.sql("INSERT INTO gcat.db.apxsrc VALUES (9, 20.0, 'b')")
    spark.sql("CALL gcat.system.refresh_mv('db.apxmv', 'apx_view')")
    val got = spark.sql("SELECT p, v_avg, id_dist FROM apx_view ORDER BY p")
      .as[(String, Double, Long)].collect().toSeq
    assert(got === Seq(("a", 10.0, 1L), ("b", 12.5, 2L)),
      s"avg must render sum/count and the sketch must survive " +
        s"delete-recompute + insert-merge, got " + got)
  }
}
