package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.etl.{AtomicTable, MergeInto}

/** The `graft` DataSource V2 format (sources/GraftSource): SQL-reachable
  * AtomicTable scans with manifest pruning pushed down and deletion
  * vectors applied in the reader. */
class GraftSourceSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("ts", TimestampType),
    StructField("d", DateType),
    StructField("p", StringType)))

  private def seed(): String = {
    val dir = Files.createTempDirectory("graft-dsv2").toString
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "one", 1.5, true, "2020-01-01 10:00:00", "2020-01-01", "a"),
      (2L, 20L, "two", 2.5, false, "2020-02-01 11:30:00", "2020-02-01", "a"),
      (3L, 30L, "three", 3.5, true, "2020-03-01 12:00:00", "2020-03-01", "b"),
      (4L, 40L, "four", 4.5, false, "2020-04-01 13:00:00", "2020-04-01", "c"))
      .toDF("id", "v", "name", "score", "flag", "ts_s", "d_s", "p")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("d", to_date(col("d_s")))
      .select("id", "v", "name", "score", "flag", "ts", "d", "p")
    AtomicTable.replacePartitions(spark, dir, df, "p", statsColumns = Seq("id"))
    dir
  }

  test("a graft scan reproduces the table, every primitive type faithful") {
    val dir = seed()
    val got = spark.read.format("graft").load(dir)
    assert(got.schema.fieldNames.toSet ===
      Set("id", "v", "name", "score", "flag", "ts", "d", "p"))
    val rows = got.select("id", "v", "name", "score", "flag", "ts", "d", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getBoolean(4), r.getTimestamp(5).toString,
        r.getDate(6).toString, r.getString(7))).toSet
    val want = AtomicTable.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getBoolean(4), r.getTimestamp(5).toString,
        r.getDate(6).toString, r.getString(7))).toSet
    assert(rows === want)
  }

  test("the reader applies deletion vectors — SQL sees the merged state") {
    val dir = seed()
    import spark.implicits._
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((2L, "a"), (4L, "c")).toDF("id", "p"), Seq("id"), "p")
    val got = spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L),
      "vector-deleted keys must not surface through the scan")
    // count(*) (fully pruned projection) also respects the vectors
    assert(spark.read.format("graft").load(dir).count() === 2L)
  }

  test("partition-key predicates prune input partitions from the manifest") {
    val dir = seed()
    val df = spark.read.format("graft").load(dir).filter(col("p") === "a")
    assert(df.rdd.getNumPartitions === 1,
      "one input partition per surviving table partition")
    assert(df.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("zone-map range predicates prune partitions before any file is listed") {
    val dir = seed()
    // ids: a=[1,2], b=[3], c=[4]; the range [3,4] must drop partition a
    val df = spark.read.format("graft").load(dir)
      .filter(col("id") >= 3L && col("id") <= 4L)
    assert(df.rdd.getNumPartitions === 2,
      s"zone maps must admit only b and c")
    assert(df.select("id").collect().map(_.getLong(0)).toSet === Set(3L, 4L))
    val none = spark.read.format("graft").load(dir).filter(col("id") > 100L)
    assert(none.rdd.getNumPartitions === 0, "no partition admits id > 100")
    assert(none.count() === 0L)
  }

  test("metadata statistics: pruned size/rows reported, small side broadcasts") {
    val dir = seed()
    // full scan: zone-map row count and on-disk byte size flow into the
    // optimized plan's statistics
    val full = spark.read.format("graft").load(dir)
    val st = full.queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(4)),
      s"zone-map row count must reach Catalyst, got ${st.rowCount}")
    assert(st.sizeInBytes > 0 && st.sizeInBytes < 1000000,
      s"committed file bytes must reach Catalyst, got ${st.sizeInBytes}")
    // post-pushdown: a pruned scan reports only the kept partitions
    val pruned = spark.read.format("graft").load(dir).filter(col("p") === "a")
    val stP = pruned.queryExecution.optimizedPlan.stats
    assert(stP.sizeInBytes < st.sizeInBytes,
      "pruning must shrink the reported size")
    // the payoff: a join against a big side plans a STATIC broadcast of
    // the small graft table — no hint, no AQE rescue needed
    import spark.implicits._
    val big = (1L to 50000L).toDF("id")
    val joined = big.join(full.select("id", "name"), "id")
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft side must broadcast statically:\n$plan")
  }

  test("commits record per-dir byte totals; statistics read the manifest") {
    val dir = seed()
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(m.allDirs.toSet.subsetOf(m.bytes.keySet),
      "every live data dir carries a byte total, recorded at its commit")
    assert(m.bytes.values.forall(_ > 0L))
    // the planning path sums those totals — no per-file filesystem
    // stats on any query planning pass
    val st = spark.read.format("graft").load(dir)
      .queryExecution.optimizedPlan.stats
    assert(st.sizeInBytes === BigInt(m.allDirs.map(m.bytes).sum))
  }

  test("dynamic partition pruning: a selective join runtime-prunes the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    // a fact table too big to broadcast-threshold away, 4 partitions
    val fact = (1L to 2000L).map(i => (i, s"p${i % 4}"))
      .toDF("id", "p").repartition(col("p"))
    AtomicTable.replacePartitions(spark, dir, fact, "p")
    // a selective dim: only partition p2 survives its filter. It must
    // be a REAL scan — a literal Seq folds to a LocalRelation at
    // optimize time, which has no Filter node for DPP to measure
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("p2", "keep"), ("p0", "drop"), ("p1", "drop"), ("p3", "drop"))
      .toDF("p", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.read.format("graft").load(dir)
      .join(broadcast(dim.filter(col("tag") === "keep")), Seq("p"))
    // collect() drives THIS Dataset's QueryExecution, so the plan we
    // inspect afterwards is the one that actually ran
    assert(joined.collect().length === 500)
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
    assert(scans.nonEmpty, "no BatchScanExec found in the executed plan")
    val b = scans.head
    assert(b.runtimeFilters.nonEmpty,
      s"the join must attach a runtime filter to the scan:\n$b")
    // the filter was delivered and the scan's plan shrank to the one
    // partition the dim admits — three partitions never produced a task
    assert(b.scan.asInstanceOf[GraftScan].planInputPartitions().map(
      _.asInstanceOf[GraftInputPartition].partValue).distinct.length === 1,
      "runtime filter must keep exactly one partition")
  }

  test("plain SQL reaches the table through CREATE TEMPORARY VIEW ... USING graft") {
    val dir = seed()
    import spark.implicits._
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((1L, "a")).toDF("id", "p"), Seq("id"), "p")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_t USING graft OPTIONS (path '$dir')")
    val got = spark.sql(
      "SELECT p, count(*) AS n, sum(v) AS sv FROM graft_t GROUP BY p ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("a", 1L, 20L), ("b", 1L, 30L), ("c", 1L, 40L)))
  }

  test("changefeed: the table is a streaming source, offsets are versions") {
    val dir = Files.createTempDirectory("graft-cdf").toString
    import spark.implicits._
    def commit(part: String, ids: Long*): Unit = {
      AtomicTable.replacePartitions(spark, dir,
        ids.map(i => (i, i * 10L, part)).toDF("id", "v", "p"), "p", retain = 10)
      ()
    }
    commit("b0", 1L, 2L)
    commit("b1", 3L)
    val checkpoint = Files.createTempDirectory("graft-cdf-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Set[Long] = {
      val q = spark.readStream.format("graft").load(dir)
        .writeStream
        .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => { seen.add(r.getLong(0)); () }))
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      val out = seen.asScala.toSet
      seen.clear()
      out
    }
    assert(drain() === Set(1L, 2L, 3L),
      "the first batch carries the whole current table (diff from v0)")
    // two more commits while the stream is down: one append, one rewrite
    commit("b2", 4L)
    commit("b0", 1L, 2L, 9L)
    assert(drain() === Set(1L, 2L, 4L, 9L),
      "resume emits the appended partition plus the rewritten partition's " +
        "new full contents — and nothing it already delivered")
    assert(drain() === Set(), "no new commits, no re-emission")
    // vector deletes stage no data: the feed stays silent
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType), StructField("p", StringType)))
    // retention is per-commit (the latest commit's retain wins), so a
    // changefeed source needs EVERY writer to retain — the default
    // retain=1 here would GC the checkpointed version's manifest
    MergeInto.deleteKeysMor(spark, dir, sch,
      Seq((3L, "b1")).toDF("id", "p"), Seq("id"), "p", retain = 10)
    assert(drain() === Set(), "a vector delete references no new data dir")
  }

  test("writes: a new table via df.write.format(graft), every type faithful") {
    val dir = Files.createTempDirectory("graft-w").resolve("t").toString
    import spark.implicits._
    val df = Seq(
      (1L, 7, "x", 1.5, true, "2021-06-01 08:00:00", "2021-06-01", "a"),
      (2L, 8, "y", 2.5, false, "2021-07-01 09:00:00", "2021-07-01", "b"))
      .toDF("id", "n", "name", "score", "flag", "ts_s", "d_s", "p")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("d", to_date(col("d_s")))
      .select("id", "n", "name", "score", "flag", "ts", "d", "p")
    df.repartition(col("p")).write.format("graft")
      .option("partition", "p").mode("append").save(dir)
    assert(AtomicTable.manifest(java.nio.file.Paths.get(dir)).get.partitions
      .keySet === Set("a", "b"))
    val back = spark.read.format("graft").load(dir)
      .select("id", "n", "name", "score", "flag", "ts", "d", "p")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3), r.getBoolean(4), r.getTimestamp(5).toString,
        r.getDate(6).toString, r.getString(7))).toSet
    assert(back === Set(
      (1L, 7, "x", 1.5, true, "2021-06-01 08:00:00.0", "2021-06-01", "a"),
      (2L, 8, "y", 2.5, false, "2021-07-01 09:00:00.0", "2021-07-01", "b")))
  }

  test("writes: append keeps existing partition contents, overwrite truncates") {
    val dir = Files.createTempDirectory("graft-w2").resolve("t").toString
    import spark.implicits._
    def frame(rows: (Long, String)*) =
      rows.toDF("id", "p").repartition(col("p"))
    frame((1L, "a"), (2L, "b"), (3L, "c")).write.format("graft")
      .option("partition", "p").mode("append").save(dir)
    // append with partition b present: b KEEPS its rows and gains a dir
    // (the standard SQL INSERT INTO contract); a and c carried untouched
    val before = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get.partitions
    frame((20L, "b")).write.format("graft").mode("append").save(dir)
    val after = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get.partitions
    assert(after("a") === before("a") && after("c") === before("c"))
    assert(after("b").size === 2 && after("b").head === before("b").head,
      "append extends the partition's dir list, never replaces it")
    assert(spark.read.format("graft").load(dir).select("id")
      .as[Long].collect().toSet === Set(1L, 2L, 20L, 3L))
    // overwrite: pre-existing partitions not rewritten must drop
    frame((9L, "z")).write.format("graft").mode("overwrite").save(dir)
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(m.partitions.keySet === Set("z"))
    assert(spark.read.format("graft").load(dir).select("id")
      .as[Long].collect().toSet === Set(9L))
  }

  test("writes: the format round-trips with the Scala-API read and the changefeed") {
    val dir = Files.createTempDirectory("graft-w3").resolve("t").toString
    import spark.implicits._
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "v", "p")
      .repartition(col("p")).write.format("graft")
      .option("partition", "p").mode("append").save(dir)
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType), StructField("p", StringType)))
    assert(AtomicTable.read(spark, dir, sch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet ===
      Set((1L, 10L, "a"), (2L, 20L, "b")),
      "a format-written table reads through the Scala API unchanged")
  }

  test("streaming writes: writeStream.format(graft) is an exactly-once epoch sink") {
    val src = Files.createTempDirectory("graft-sw-src")
    val dir = Files.createTempDirectory("graft-sw").resolve("t").toString
    import spark.implicits._
    // three files -> three micro-batches (distinct mtimes pin the order)
    Seq((1L, "e0"), (2L, "e0")).toDF("id", "p").coalesce(1)
      .write.parquet(src.resolve("b0").toString)
    Thread.sleep(50)
    Seq((3L, "e1")).toDF("id", "p").coalesce(1)
      .write.parquet(src.resolve("b1").toString)
    Thread.sleep(50)
    Seq((4L, "e2")).toDF("id", "p").coalesce(1)
      .write.parquet(src.resolve("b2").toString)
    val keySchema = StructType(Seq(
      StructField("id", LongType), StructField("p", StringType)))
    val checkpoint = Files.createTempDirectory("graft-sw-ckpt").toString
    def run(): Unit = {
      val q = spark.readStream.schema(keySchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString + "/*")
        .writeStream.format("graft")
        .option("partition", "p")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(dir)
      try q.awaitTermination() finally q.stop()
    }
    run()
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(m.partitions.keySet === Set("e0", "e1", "e2"),
      "each epoch commits its partitions")
    assert(spark.read.format("graft").load(dir).select("id")
      .as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    // restart with nothing new: no version bump, no duplicate rows
    val v = m.version
    run()
    assert(AtomicTable.currentVersion(java.nio.file.Paths.get(dir)).get === v)
    assert(spark.read.format("graft").load(dir).count() === 4L)
    // a late fourth batch continues the epoch chain
    Seq((5L, "e3")).toDF("id", "p").coalesce(1)
      .write.parquet(src.resolve("b3").toString)
    run()
    assert(spark.read.format("graft").load(dir).select("id")
      .as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("column pruning survives outstanding vectors (keys read, not emitted)") {
    val dir = seed()
    import spark.implicits._
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((3L, "b")).toDF("id", "p"), Seq("id"), "p")
    val got = spark.read.format("graft").load(dir)
      .select("name").as[String].collect().toSet
    assert(got === Set("one", "two", "four"))
  }

  test("time travel: versionAsOf and timestampAsOf pin the scanned snapshot") {
    val dir = Files.createTempDirectory("graft-tt-dsv2").toString
    import spark.implicits._
    def commit(part: String, ids: Long*): Unit = {
      AtomicTable.replacePartitions(spark, dir,
        ids.map(i => (i, i * 10L, part)).toDF("id", "v", "p"), "p", retain = 10)
      ()
    }
    commit("a", 1L, 2L)       // v1
    commit("b", 3L)           // v2
    commit("a", 7L)           // v3 rewrites a
    def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").as[Long].collect().toSet

    assert(idsOf(spark.read.format("graft")
      .option("versionAsOf", "1").load(dir)) === Set(1L, 2L))
    assert(idsOf(spark.read.format("graft")
      .option("versionAsOf", "2").load(dir)) === Set(1L, 2L, 3L))
    assert(idsOf(spark.read.format("graft").load(dir)) === Set(3L, 7L))

    // timestampAsOf at v2's exact commit instant (epoch millis form)
    val root = java.nio.file.Paths.get(dir)
    val t2 = AtomicTable.commitTimeMs(root, 2L)
    assert(idsOf(spark.read.format("graft")
      .option("timestampAsOf", t2.toString).load(dir)) === Set(1L, 2L, 3L))
    // ISO instant form, between v1 and v2 -> resolves to v1
    val isoBefore2 = java.time.Instant
      .ofEpochMilli(AtomicTable.commitTimeMs(root, 2L) - 1).toString
    assert(idsOf(spark.read.format("graft")
      .option("timestampAsOf", isoBefore2).load(dir)) === Set(1L, 2L))

    // SQL surface: the pin rides the view options
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW tt_v2 USING graft " +
      s"OPTIONS (path '$dir', versionAsOf '2')")
    assert(spark.sql("SELECT count(*) AS n FROM tt_v2").as[Long].head() === 3L)

    // errors: both pins, write-through, pre-history timestamp
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "1")
        .option("timestampAsOf", t2.toString).load(dir).collect()
    }
    intercept[Exception] {
      Seq((9L, 90L, "z")).toDF("id", "v", "p").write.format("graft")
        .option("versionAsOf", "1").mode("append").save(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("timestampAsOf", (AtomicTable.commitTimeMs(root, 1L) - 1).toString)
        .load(dir).collect()
    }
  }

  test("time travel: manifest pruning and vectors come from the pinned snapshot") {
    val dir = seed()
    import spark.implicits._
    MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((3L, "b")).toDF("id", "p"), Seq("id"), "p", retain = 10)  // v2
    AtomicTable.replacePartitions(spark, dir,
      Seq((8L, 80L, "eight", 8.5, true,
        new java.sql.Timestamp(0L), new java.sql.Date(0L), "b"))
        .toDF("id", "v", "name", "score", "flag", "ts", "d", "p"),
      "p", retain = 10, statsColumns = Seq("id"))                    // v3
    // v1 predates the vector: id=3 visible; v2 applies it; head has the rewrite
    def names(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("name").as[String].collect().toSet
    assert(names(spark.read.format("graft").option("versionAsOf", "1").load(dir))
      === Set("one", "two", "three", "four"))
    assert(names(spark.read.format("graft").option("versionAsOf", "2").load(dir))
      === Set("one", "two", "four"))
    // zone-map pruning against the PINNED stats: id >= 3 at v1 keeps
    // partitions b and c only (a's committed max is 2)
    val pruned = spark.read.format("graft").option("versionAsOf", "1").load(dir)
      .filter(col("id") >= 3L)
    assert(pruned.rdd.getNumPartitions === 2)
    assert(names(pruned) === Set("three", "four"))
  }

  test("batch change feed: startingVersion/endingVersion read the manifest diff") {
    val dir = Files.createTempDirectory("graft-cdf-batch").toString
    import spark.implicits._
    def commit(part: String, ids: Long*): Unit = {
      AtomicTable.replacePartitions(spark, dir,
        ids.map(i => (i, i * 10L, part)).toDF("id", "v", "p"), "p", retain = 10)
      ()
    }
    commit("b0", 1L, 2L)       // v1
    commit("b1", 3L)           // v2
    commit("b0", 1L, 2L, 9L)   // v3 rewrites b0
    def ids(opts: (String, String)*): Set[Long] = {
      val r = opts.foldLeft(spark.read.format("graft")) {
        case (rd, (k, v)) => rd.option(k, v)
      }
      r.load(dir).select("id").as[Long].collect().toSet
    }
    assert(ids("startingVersion" -> "1") === Set(1L, 2L, 3L, 9L),
      "from v1: every current partition (b0 at its REWRITTEN contents)")
    assert(ids("startingVersion" -> "2") === Set(1L, 2L, 3L, 9L),
      "v2 added b1, v3 rewrote b0")
    assert(ids("startingVersion" -> "3") === Set(1L, 2L, 9L),
      "only b0 changed in v3")
    assert(ids("startingVersion" -> "2", "endingVersion" -> "2") === Set(3L),
      "bounded: v2 touched only b1 (b0 still at its v1 dir then)")
    intercept[Exception] {
      ids("startingVersion" -> "2", "endingVersion" -> "99")
    }
    intercept[Exception] {
      spark.read.format("graft").option("startingVersion", "2")
        .option("versionAsOf", "1").load(dir).collect()
    }
  }

  test("per-file splits: a partition reads with one task per file") {
    // without splits, read parallelism is capped at the PARTITION count
    // — a 1 TB day would read as ONE task at 100 TB. Each data file
    // plans its own input partition; key-grouped planning regroups them
    // per key when the storage-partitioned-join path asks.
    val w = Files.createTempDirectory("graft-splits").toString
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gsp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsp.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsp.db")
    spark.sql("CREATE TABLE gsp.db.splits (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    // three INSERT INTO appends into ONE partition value = three files
    for (i <- 0 until 3) {
      (i * 10 until i * 10 + 10).map(j => (j.toLong, "a")).toDF("id", "p")
        .coalesce(1).createOrReplaceTempView(s"src_splits_$i")
      spark.sql(s"INSERT INTO gsp.db.splits SELECT * FROM src_splits_$i")
    }
    val df = spark.sql("SELECT id, p FROM gsp.db.splits")
    assert(df.collect().length === 30)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val splits = scans.head.scan.asInstanceOf[GraftScan].planInputPartitions()
    assert(splits.length === 3, "three files must plan three splits")
    assert(splits.map(_.asInstanceOf[GraftInputPartition].partValue)
      .distinct.toSeq === Seq("a"))
    assert(splits.forall(
      _.asInstanceOf[GraftInputPartition].dataFiles.length == 1))
  }

  test("changefeed: startingVersion skips the snapshot and feeds from a commit") {
    val dir = Files.createTempDirectory("graft-cdf-sv").toString
    import spark.implicits._
    def commit(part: String, ids: Long*): Unit = {
      AtomicTable.replacePartitions(spark, dir,
        ids.map(i => (i, i * 10L, part)).toDF("id", "v", "p"), "p", retain = 10)
      ()
    }
    commit("b0", 1L, 2L)   // v1
    commit("b1", 3L)       // v2
    commit("b2", 4L)       // v3
    val checkpoint = Files.createTempDirectory("graft-cdf-sv-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft")
      .option("startingVersion", "3").load(dir)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => { seen.add(r.getLong(0)); () }))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    assert(seen.asScala.toSet === Set(4L),
      "the feed starts at v3's commit — v1/v2 partitions unchanged since " +
        "v2 are not re-emitted")
  }
}
