package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite
import graft.etl.AtomicTable

/** Monotone partition transforms: `PARTITIONED BY (days(ts))` /
  * `months(d)` / `years(d)` / `truncate(w, col)` — the canonical
  * time-series layout. Pins the property hashing lacks: RANGE
  * predicates on the SOURCE column prune partitions, and
  * `ORDER BY ts DESC LIMIT n` keeps only the newest segments
  * (segment-granular cuts — a finer cut could drop a true top-n row).
  * Plus the correctness guards: equality prunes to one segment, keyed
  * DML rewrites one segment, boundary partitions are never over-pruned,
  * and refusal paths plan everything. */
class GraftTimePartSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-timepart").toString
    spark.conf.set("spark.sql.catalog.gtp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtp.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtp.db")
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

  /** 4 UTC days x 6 hourly events on a TIMESTAMP column. */
  private def seedTs(table: String): Unit = {
    warehouse
    spark.sql(s"CREATE TABLE gtp.db.$table (id BIGINT, ts TIMESTAMP, " +
      s"v DOUBLE) PARTITIONED BY (days(ts)) TBLPROPERTIES ('retain'='5')")
    val rows = for {
      day <- 0 until 4
      h <- 0 until 6
    } yield ((day * 6 + h).toLong,
      java.sql.Timestamp.from(java.time.Instant.parse(
        f"2021-03-0${day + 1}%dT0$h%d:30:00Z")), day * 10.0 + h)
    rows.toDF("id", "ts", "v").createOrReplaceTempView(s"src_$table")
    spark.sql(s"INSERT INTO gtp.db.$table SELECT * FROM src_$table")
  }

  test("days(ts): dirs are UTC days, values roundtrip, count is exact") {
    seedTs("t1")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t1")).get
    assert(m.partitions.keySet ===
      Set("2021-03-01", "2021-03-02", "2021-03-03", "2021-03-04"))
    // one file per day per commit (clustered write distribution)
    m.partitions.values.flatten.foreach { d =>
      val s = Files.list(Paths.get(warehouse, "db", "t1").resolve(d))
      val nf = try s.filter(_.toString.endsWith(".parquet")).count()
        finally s.close()
      assert(nf === 1L, s"dir $d must hold one file")
    }
    val back = spark.sql("SELECT id, ts, v FROM gtp.db.t1").collect()
    assert(back.length === 24)
    assert(back.map(_.getLong(0)).toSet === (0L until 24L).toSet)
  }

  test("range predicates on ts prune to the qualifying days") {
    seedTs("t2")
    val q = spark.sql("SELECT id FROM gtp.db.t2 " +
      "WHERE ts >= TIMESTAMP'2021-03-03 00:00:00'")
    assert(q.as[Long].collect().toSet === (12L until 24L).toSet)
    assert(plannedParts(q).toSet === Set("2021-03-03", "2021-03-04"),
      "ts >= March 3 must skip March 1-2")
    // the BOUNDARY day stays admitted under a strict predicate
    val qb = spark.sql("SELECT id FROM gtp.db.t2 " +
      "WHERE ts > TIMESTAMP'2021-03-03 05:30:00'")
    assert(qb.as[Long].collect().toSet === (18L until 24L).toSet)
    assert(plannedParts(qb).toSet === Set("2021-03-03", "2021-03-04"),
      "a strict > at the last event of day 3 must still read day 3")
    // equality prunes to ONE day
    val qe = spark.sql("SELECT id FROM gtp.db.t2 " +
      "WHERE ts = TIMESTAMP'2021-03-02 01:30:00'")
    assert(qe.as[Long].collect().toSeq === Seq(7L))
    assert(plannedParts(qe) === Seq("2021-03-02"))
    // a BETWEEN window reads exactly its days
    val qw = spark.sql("SELECT count(*) AS n FROM gtp.db.t2 WHERE ts " +
      "BETWEEN TIMESTAMP'2021-03-02 00:00:00' AND " +
      "TIMESTAMP'2021-03-03 23:59:59'")
    assert(qw.as[Long].head() === 12L)
    assert(plannedParts(qw).toSet === Set("2021-03-02", "2021-03-03"))
  }

  test("ORDER BY ts DESC LIMIT keeps only the newest days") {
    seedTs("t3")
    val q = spark.sql("SELECT id, ts FROM gtp.db.t3 ORDER BY ts DESC LIMIT 5")
    val ids = q.collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(23L, 22L, 21L, 20L, 19L), "true newest five")
    assert(plannedParts(q) === Seq("2021-03-04"),
      "five rows fit in the newest day's 6 — older days must not plan")
    // a limit straddling two days keeps both, never a partial day
    val q2 = spark.sql("SELECT id FROM gtp.db.t3 ORDER BY ts DESC LIMIT 8")
    assert(q2.as[Long].collect().toSeq ===
      (16L until 24L).reverse.toSeq)
    assert(plannedParts(q2).toSet === Set("2021-03-03", "2021-03-04"))
    // ascending keeps the oldest
    val q3 = spark.sql("SELECT id FROM gtp.db.t3 ORDER BY ts ASC LIMIT 3")
    assert(q3.as[Long].collect().toSeq === Seq(0L, 1L, 2L))
    assert(plannedParts(q3) === Seq("2021-03-01"))
  }

  test("months(d) on a DATE column: layout + range pruning") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.t4 (id BIGINT, d DATE) " +
      "PARTITIONED BY (months(d))")
    spark.sql("INSERT INTO gtp.db.t4 VALUES (1, DATE'2020-01-15'), " +
      "(2, DATE'2020-02-10'), (3, DATE'2020-11-30'), (4, DATE'2021-01-01')")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t4")).get
    assert(m.partitions.keySet ===
      Set("2020-01", "2020-02", "2020-11", "2021-01"))
    val q = spark.sql(
      "SELECT id FROM gtp.db.t4 WHERE d >= DATE'2020-11-01'")
    assert(q.as[Long].collect().toSet === Set(3L, 4L))
    assert(plannedParts(q).toSet === Set("2020-11", "2021-01"),
      "lexicographic '2020-02' < '2020-11' must not confuse the order")
  }

  test("truncate(w, col): numeric ranges and string prefixes prune") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.t5 (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (truncate(100, k))")
    (0L until 1000L by 7L).map(i => (i, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("src_t5")
    spark.sql("INSERT INTO gtp.db.t5 SELECT * FROM src_t5")
    val q = spark.sql("SELECT k FROM gtp.db.t5 WHERE k >= 850")
    assert(q.as[Long].collect().toSet ===
      (0L until 1000L by 7L).filter(_ >= 850).toSet)
    assert(plannedParts(q).toSet === Set("800", "900"),
      "k >= 850 reads the 800 (boundary) and 900 ranges only")
    val qe = spark.sql("SELECT count(*) AS n FROM gtp.db.t5 WHERE k = 707")
    assert(qe.as[Long].head() === 1L)
    assert(plannedParts(qe) === Seq("700"))
    // string prefixes
    spark.sql("CREATE TABLE gtp.db.t6 (s STRING, v BIGINT) " +
      "PARTITIONED BY (truncate(2, s))")
    spark.sql("INSERT INTO gtp.db.t6 VALUES ('aardvark', 1), ('abacus', 2), " +
      "('banana', 3), ('bbq', 4)")
    val qs = spark.sql("SELECT v FROM gtp.db.t6 WHERE s = 'banana'")
    assert(qs.as[Long].collect().toSeq === Seq(3L))
    assert(plannedParts(qs) === Seq("ba"))
    val qr = spark.sql("SELECT v FROM gtp.db.t6 WHERE s >= 'ab'")
    assert(qr.as[Long].collect().toSet === Set(2L, 3L, 4L))
    assert(plannedParts(qr).toSet === Set("ab", "ba", "bb"))
  }

  test("hours(ts): fixed-width dirs, range pruning at hour granularity") {
    warehouse
    spark.sql("CREATE TABLE gtp.db.th (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (hours(ts))")
    spark.sql("INSERT INTO gtp.db.th VALUES " +
      "(1, TIMESTAMP'2021-03-01 04:10:00'), " +
      "(2, TIMESTAMP'2021-03-01 04:50:00'), " +
      "(3, TIMESTAMP'2021-03-01 05:20:00'), " +
      "(4, TIMESTAMP'2021-03-02 01:00:00')")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "th")).get
    assert(m.partitions.keySet ===
      Set("2021-03-01-04", "2021-03-01-05", "2021-03-02-01"))
    val q = spark.sql("SELECT id FROM gtp.db.th " +
      "WHERE ts >= TIMESTAMP'2021-03-01 05:00:00'")
    assert(q.as[Long].collect().toSet === Set(3L, 4L))
    assert(plannedParts(q).toSet === Set("2021-03-01-05", "2021-03-02-01"),
      "hour 04 must prune away")
    val qe = spark.sql("SELECT id FROM gtp.db.th " +
      "WHERE ts = TIMESTAMP'2021-03-01 04:50:00'")
    assert(qe.as[Long].collect().toSeq === Seq(2L))
    assert(plannedParts(qe) === Seq("2021-03-01-04"))
  }

  test("keyed DML narrows to the segment; the rewrite stays exact") {
    seedTs("t7")
    val root = Paths.get(warehouse, "db", "t7")
    val before = AtomicTable.manifest(root).get.partitions
    spark.sql("UPDATE gtp.db.t7 SET v = -1.0 " +
      "WHERE ts = TIMESTAMP'2021-03-02 03:30:00'")
    val after = AtomicTable.manifest(root).get.partitions
    after.foreach { case (day, dirs) =>
      if (day == "2021-03-02") assert(dirs !== before(day))
      else assert(dirs === before(day),
        s"day $day untouched by the keyed UPDATE must carry by reference")
    }
    assert(spark.sql("SELECT count(*) FROM gtp.db.t7").as[Long].head() === 24L)
    assert(spark.sql("SELECT v FROM gtp.db.t7 " +
      "WHERE ts = TIMESTAMP'2021-03-02 03:30:00'").as[Double].head() === -1.0)
  }

  test("a non-monotone sort key refuses truncation, stays correct") {
    seedTs("t8")
    // ORDER BY a data column that is no level's source: full plan
    val q = spark.sql("SELECT id FROM gtp.db.t8 ORDER BY v DESC LIMIT 2")
    assert(q.as[Long].collect().toSeq === Seq(23L, 22L))
    assert(plannedParts(q).size === 4, "no truncation on a data column")
  }

  test("unsupported transform source types are refused at CREATE") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gtp.db.bad (k BIGINT, v STRING) " +
        "PARTITIONED BY (days(k))")
    }
    assert(e.getMessage.contains("not defined over"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gtp.db.bad2 (d DATE, v STRING) " +
        "PARTITIONED BY (truncate(3, d))")
    }
    assert(e2.getMessage.contains("not defined over"))
  }
}
