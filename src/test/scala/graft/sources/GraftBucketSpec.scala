package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types.LongType

import graft.SparkSuite
import graft.etl.AtomicTable

/** `PARTITIONED BY (bucket(N, col))` — hash-bucket layout for
  * high-cardinality join keys (the Iceberg bucket transform). Pins the
  * three scale claims: (1) the writer's clustered distribution lands
  * ONE file per bucket per commit, (2) an equality lookup on the bucket
  * source plans ONE of N buckets, (3) two same-bucketed tables join
  * with ZERO exchanges through the catalog's FunctionCatalog (the
  * storage-partitioned join) — plus correctness guards: range filters
  * never bucket-prune (hashing destroys order), nulls fold to bucket 0
  * and IS NULL reads only it, row-level DML stays exact. */
class GraftBucketSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-bucket").toString
    spark.conf.set("spark.sql.catalog.gbk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbk.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbk.db")
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

  private def plannedParts(df: DataFrame): Seq[String] = {
    df.collect()
    scansOf(df.queryExecution.executedPlan).head.scan
      .asInstanceOf[GraftScan].planInputPartitions()
      .map(_.asInstanceOf[GraftInputPartition].partValue).toSeq
  }

  test("roundtrip: values survive, dirs are bucket ids, one file each") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t1 (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('retain'='5')")
    (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("src_t1")
    spark.sql("INSERT INTO gbk.db.t1 SELECT * FROM src_t1")
    // every row returns with its key INTACT (the source column lives in
    // the data files; only the bucket id is in the dir)
    val back = spark.sql("SELECT k, v FROM gbk.db.t1").collect()
    assert(back.length === 100)
    assert(back.map(r => r.getLong(0) -> r.getString(1)).toMap ===
      (0L until 100L).map(i => i -> s"v$i").toMap)
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t1")).get
    assert(m.partitions.keySet.subsetOf(Set("0", "1", "2", "3")))
    assert(m.partitions.keySet.size > 1, "100 keys hash to several buckets")
    // writer distribution: one task per bucket -> one file per bucket
    m.partitions.foreach { case (b, dirs) =>
      dirs.foreach { d =>
        val s = Files.list(Paths.get(warehouse, "db", "t1").resolve(d))
        val n = try s.filter(_.toString.endsWith(".parquet")).count()
          finally s.close()
        assert(n === 1L, s"bucket $b dir $d must hold ONE file, got $n")
      }
    }
    // the ids on disk match the shared bucketId definition
    val got = spark.sql("SELECT k FROM gbk.db.t1").as[Long].collect().toSet
    assert(got === (0L until 100L).toSet)
  }

  test("equality on the bucket source plans ONE of N buckets") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t2 (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    (0L until 200L).map(i => (i, i * 0.5)).toDF("k", "v")
      .createOrReplaceTempView("src_t2")
    spark.sql("INSERT INTO gbk.db.t2 SELECT * FROM src_t2")
    val q = spark.sql("SELECT v FROM gbk.db.t2 WHERE k = 42")
    assert(q.as[Double].collect().toSeq === Seq(21.0))
    val parts = plannedParts(q)
    assert(parts.size === 1, s"point lookup must plan one bucket, got $parts")
    assert(parts.head ===
      GraftBuckets.bucketId(42L, LongType, 8).toString)
    // IN prunes to the union of the members' buckets
    val qin = spark.sql("SELECT v FROM gbk.db.t2 WHERE k IN (1, 2, 3)")
    assert(qin.collect().length === 3)
    assert(plannedParts(qin).size <= 3)
    // a RANGE predicate must NOT bucket-prune: hashing destroys order
    val qr = spark.sql("SELECT count(*) AS n FROM gbk.db.t2 WHERE k < 100")
    assert(qr.as[Long].head() === 100L)
    assert(plannedParts(qr).size ===
      AtomicTable.manifest(Paths.get(warehouse, "db", "t2"))
        .get.partitions.size, "range predicates read every bucket")
  }

  test("null keys fold to bucket 0; IS NULL reads only it") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t3 (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO gbk.db.t3 VALUES (1, 'a'), (2, 'b'), " +
      "(CAST(NULL AS BIGINT), 'n1'), (CAST(NULL AS BIGINT), 'n2')")
    assert(spark.sql("SELECT count(*) FROM gbk.db.t3").as[Long].head() === 4L)
    val q = spark.sql("SELECT v FROM gbk.db.t3 WHERE k IS NULL")
    assert(q.as[String].collect().toSet === Set("n1", "n2"))
    assert(plannedParts(q) === Seq("0"), "nulls live in bucket 0 only")
    // equality never matches the null rows and plans its value's bucket
    val qe = spark.sql("SELECT v FROM gbk.db.t3 WHERE k = 1")
    assert(qe.as[String].collect().toSeq === Seq("a"))
  }

  test("storage-partitioned join: same-bucketed tables join with no exchange") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.fact1 (k BIGINT, a DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gbk.db.fact2 (k BIGINT, b DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 50L).map(i => (i, i * 1.0)).toDF("k", "a")
      .createOrReplaceTempView("src_f1")
    (0L until 50L).map(i => (i, i * 2.0)).toDF("k", "b")
      .createOrReplaceTempView("src_f2")
    spark.sql("INSERT INTO gbk.db.fact1 SELECT * FROM src_f1")
    spark.sql("INSERT INTO gbk.db.fact2 SELECT * FROM src_f2")
    val prev = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.sql("SELECT t1.k, t1.a, t2.b FROM gbk.db.fact1 t1 " +
        "JOIN gbk.db.fact2 t2 ON t1.k = t2.k")
      val rows = j.collect()
      assert(rows.length === 50)
      assert(rows.forall(r => r.getDouble(2) === r.getDouble(1) * 2.0))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "same-bucketed join must run with zero exchanges:\n" +
          j.queryExecution.executedPlan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("mixed spec: identity level consumed, bucket level point-pruned") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t5 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p, bucket(4, k))")
    Seq("x", "y").flatMap(p => (0L until 40L).map(i => (i, i * 1.0, p)))
      .toDF("k", "v", "p").createOrReplaceTempView("src_t5")
    spark.sql("INSERT INTO gbk.db.t5 SELECT * FROM src_t5")
    val q = spark.sql(
      "SELECT v FROM gbk.db.t5 WHERE p = 'y' AND k = 7")
    assert(q.as[Double].collect().toSeq === Seq(7.0))
    val parts = plannedParts(q)
    assert(parts.size === 1, s"one (p, bucket) composite, got $parts")
    assert(parts.head ===
      "y/" + GraftBuckets.bucketId(7L, LongType, 4))
  }

  test("row-level DML on a bucketed table stays exact") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t6 (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('retain'='5')")
    (0L until 30L).map(i => (i, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("src_t6")
    spark.sql("INSERT INTO gbk.db.t6 SELECT * FROM src_t6")
    spark.sql("UPDATE gbk.db.t6 SET v = -1.0 WHERE k = 5")
    spark.sql("DELETE FROM gbk.db.t6 WHERE k = 6")
    assert(spark.sql("SELECT v FROM gbk.db.t6 WHERE k = 5")
      .as[Double].head() === -1.0)
    assert(spark.sql("SELECT count(*) FROM gbk.db.t6").as[Long].head() === 29L)
    assert(spark.sql("SELECT count(*) FROM gbk.db.t6 WHERE k = 6")
      .as[Long].head() === 0L)
    // the rewritten rows landed back in their original buckets: a
    // lookup after DML still plans one bucket
    val q = spark.sql("SELECT v FROM gbk.db.t6 WHERE k = 5")
    q.collect()
    assert(plannedParts(q).size === 1)
  }

  test("keyed DML rewrites ONE bucket: untouched buckets carry by reference") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t7 (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('retain'='5')")
    (0L until 40L).map(i => (i, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("src_t7")
    spark.sql("INSERT INTO gbk.db.t7 SELECT * FROM src_t7")
    val root = Paths.get(warehouse, "db", "t7")
    val before = AtomicTable.manifest(root).get.partitions
    spark.sql("UPDATE gbk.db.t7 SET v = -9.0 WHERE k = 11")
    val after = AtomicTable.manifest(root).get.partitions
    val hit = GraftBuckets.bucketId(11L, LongType, 4).toString
    after.foreach { case (b, dirs) =>
      if (b == hit) assert(dirs !== before(b), s"bucket $b must rewrite")
      else assert(dirs === before(b),
        s"bucket $b was not touched by k=11 — its dirs must carry by " +
          "reference (the runtime group filter must fire on the source key)")
    }
    assert(spark.sql("SELECT count(*) FROM gbk.db.t7").as[Long].head() === 40L)
    assert(spark.sql("SELECT v FROM gbk.db.t7 WHERE k = 11")
      .as[Double].head() === -9.0)
  }

  test("DATE-partitioned DML: the group filter compares ISO, not epoch days") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t8 (id BIGINT, d DATE) " +
      "PARTITIONED BY (d) TBLPROPERTIES ('retain'='5')")
    spark.sql("INSERT INTO gbk.db.t8 VALUES " +
      "(1, DATE'2020-01-01'), (2, DATE'2020-01-02'), (3, DATE'2020-01-03')")
    // before the litOf ISO fix, the runtime group filter rendered the
    // DATE literal as its epoch-day int, matched NO partition segment,
    // and the DELETE silently no-opped
    spark.sql("DELETE FROM gbk.db.t8 WHERE d = DATE'2020-01-02' AND id > 0")
    assert(spark.sql("SELECT id FROM gbk.db.t8 ORDER BY id")
      .as[Long].collect().toSeq === Seq(1L, 3L),
      "the DATE-keyed DELETE must actually delete")
  }

  test("DPP: a dim filter on the bucket key prunes the fact to its buckets") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t9 (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    (0L until 400L).map(i => (i, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("src_t9")
    spark.sql("INSERT INTO gbk.db.t9 SELECT * FROM src_t9")
    // the dim must be a REAL file scan: a literal Seq folds to a
    // LocalRelation, which has no Filter node for DPP to measure
    val dimPath = Files.createTempDirectory("graft-bkdpp").toString
    Seq((3L, "keep"), (7L, "keep"), (11L, "drop")).toDF("k", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.table("gbk.db.t9")
      .join(org.apache.spark.sql.functions.broadcast(
        dim.filter($"tag" === "keep")), Seq("k"))
    assert(joined.collect().map(_.getAs[Double]("v")).toSet ===
      Set(3.0, 7.0))
    val scans = scansOf(joined.queryExecution.executedPlan)
      .filter(_.scan.isInstanceOf[GraftScan])
    assert(scans.nonEmpty)
    assert(scans.head.runtimeFilters.nonEmpty,
      "the join must attach a runtime filter on the bucket SOURCE key")
    val planned = scans.head.scan.asInstanceOf[GraftScan]
      .planInputPartitions().map(
        _.asInstanceOf[GraftInputPartition].partValue).toSet
    val want = Set(3L, 7L).map(k =>
      GraftBuckets.bucketId(k, LongType, 8).toString)
    assert(planned === want,
      s"runtime keys {3, 7} must map to buckets $want, planned $planned")
  }

  test("streaming: a key filter over a bucketed table stays row-accurate") {
    warehouse
    spark.sql("CREATE TABLE gbk.db.t10 (k BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO gbk.db.t10 VALUES (1,'a'),(2,'b'),(42,'x')")
    spark.sql("INSERT INTO gbk.db.t10 VALUES (3,'c'),(42,'y')")
    val dir = Paths.get(warehouse, "db", "t10").toString
    // bucket admission on the stream is SKIP-ONLY (the filter stays
    // residual): dirs whose bucket cannot hold k=42 skip, the rest
    // re-check rows — either way exactly the k=42 rows must emit
    val q = spark.readStream.format("graft").load(dir)
      .filter($"k" === 42L).select("v")
      .writeStream.format("memory").queryName("gbk_t10")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT v FROM gbk_t10").collect()
      .map(_.getString(0)).toSet === Set("x", "y"))
  }

  test("unsupported bucket source types are refused at CREATE") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gbk.db.bad (k DOUBLE, v STRING) " +
        "PARTITIONED BY (bucket(4, k))")
    }
    assert(e.getMessage.contains("not defined over"))
  }
}
