package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.SparkSuite
import graft.etl.AtomicTable

/** DSv2 COLUMN statistics (r12 missing #1): `estimateStatistics` now
  * reports per-column min/max (folded from the planned partitions'
  * zone maps through the rename alias chain) plus NDV/null counts from
  * `CALL system.analyze`'s table-level properties — so with AQE OFF,
  * Spark's cost-based optimizer sees graft tables like catalog tables:
  * a selective equality filter on an analyzed column shrinks the join
  * estimate below the broadcast threshold STATICALLY. */
class GraftColStatsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-colstats").toString
    spark.conf.set("spark.sql.catalog.gcs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcs.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.db")
    w
  }

  private def withSQLConf[A](kvs: (String, String)*)(f: => A): A = {
    val prev = kvs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def bhjOf(p: SparkPlan): Seq[BroadcastHashJoinExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      bhjOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      bhjOf(q.plan)
    case b: BroadcastHashJoinExec => Seq(b)
    case o => o.children.flatMap(bhjOf)
  }

  test("analyze records NDV/null column stats and the scan reports them to CBO") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.t1 (k BIGINT, v DOUBLE, s STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k,s', 'retain'='5')")
    // 40k rows, k has exactly 40000 distinct values, s has 100, and
    // every 10th s is NULL
    (0L until 40000L)
      .map(i => (i, i * 1.0, if (i % 10 == 0) null else s"s${i % 100}", "a"))
      .toDF("k", "v", "s", "p").createOrReplaceTempView("cs_src")
    spark.sql("INSERT INTO gcs.db.t1 SELECT * FROM cs_src")
    spark.sql("CALL gcs.system.analyze('db.t1', 'k,s')")

    val dir = java.nio.file.Paths.get(warehouse, "db", "t1")
    val props = AtomicTable.rootOpt(dir).get.properties
    val stats = AtomicTable.colStats(props)
    assert(stats.contains("k") && stats.contains("s"), s"got $stats")
    val kNdv = stats("k").ndv.get
    assert(kNdv > 35000L && kNdv < 45000L,
      s"approx NDV of 40000-distinct k must land near 40000, got $kNdv")
    assert(stats("s").nulls.get === 4000L)
    assert(stats("s").maxLen.exists(_ >= 3L))

    // the optimized plan must carry attribute-level stats (V2 column
    // stats -> transformV2Stats -> attributeStats), CBO on, AQE off
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      // RAW scan: the reported NDV and zone-map bounds surface verbatim
      val raw = spark.sql("SELECT k, v FROM gcs.db.t1")
      val rawStats = raw.queryExecution.optimizedPlan.stats.attributeStats
      assert(rawStats.nonEmpty, "V2 column stats must reach the plan")
      val kRaw = rawStats.find(_._1.name == "k").map(_._2)
      assert(kRaw.exists(_.distinctCount.exists(_.toLong > 35000L)),
        s"k's NDV must surface on the attribute, got $kRaw")
      assert(kRaw.exists(_.min.contains(0L)) &&
        kRaw.exists(_.max.contains(39999L)),
        s"zone-map bounds must surface as min/max, got $kRaw")
      // FILTERED scan: CBO's FilterEstimation CONSUMES them — `k = 123`
      // against NDV 40k collapses the estimate to one distinct value
      // pinned at the literal (the selectivity math the stats exist for)
      val df = spark.sql("SELECT k, v FROM gcs.db.t1 WHERE k = 123")
      val kStat = df.queryExecution.optimizedPlan.stats.attributeStats
        .find(_._1.name == "k").map(_._2)
      assert(kStat.exists(_.distinctCount.exists(_.toLong === 1L)),
        s"FilterEstimation must collapse NDV to 1, got $kStat")
      assert(kStat.exists(_.min.contains(123L)) &&
        kStat.exists(_.max.contains(123L)),
        s"FilterEstimation must pin bounds at the literal, got $kStat")
      assert(df.queryExecution.optimizedPlan.stats.rowCount.exists(_.toLong <= 2L),
        "the row estimate must collapse to ~1 row")
    }
  }

  test("column stats survive RENAME COLUMN: alias-resolved bounds and NDV still reach CBO") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.t2 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k', 'retain'='5')")
    (0L until 10000L).map(i => (i, i * 1.0, "a"))
      .toDF("k", "v", "p").createOrReplaceTempView("cs_rn")
    spark.sql("INSERT INTO gcs.db.t2 SELECT * FROM cs_rn")
    spark.sql("CALL gcs.system.analyze('db.t2', 'k')")
    // ANALYZE recorded everything under 'k'; the rename is metadata-only
    spark.sql("ALTER TABLE gcs.db.t2 RENAME COLUMN k TO key")
    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = spark.sql("SELECT key, v FROM gcs.db.t2")
      val kStat = df.queryExecution.optimizedPlan.stats.attributeStats
        .find(_._1.name == "key").map(_._2)
      assert(kStat.exists(_.distinctCount.exists(_.toLong > 8000L)),
        s"old-name NDV must resolve through the alias chain, got $kStat")
      assert(kStat.exists(_.min.contains(0L)) &&
        kStat.exists(_.max.contains(9999L)),
        s"old-name zone-map bounds must resolve, got $kStat")
    }
  }

  test("ANALYZE after RENAME COLUMN folds old-generation files through the alias chain") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.t3 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k', 'retain'='5')")
    // generation 1 under the ORIGINAL name: k in [0, 5000)
    (0L until 5000L).map(i => (i, i * 1.0, "a"))
      .toDF("k", "v", "p").createOrReplaceTempView("cs_g1")
    spark.sql("INSERT INTO gcs.db.t3 SELECT * FROM cs_g1")
    spark.sql("ALTER TABLE gcs.db.t3 RENAME COLUMN k TO key")
    // generation 2 under the NEW name: key in [10000, 15000)
    (10000L until 15000L).map(i => (i, i * 1.0, "a"))
      .toDF("key", "v", "p").createOrReplaceTempView("cs_g2")
    spark.sql("INSERT INTO gcs.db.t3 SELECT * FROM cs_g2")
    spark.sql("CALL gcs.system.analyze('db.t3', 'key')")

    val dir = java.nio.file.Paths.get(warehouse, "db", "t3")
    val root = AtomicTable.rootOpt(dir).get
    // pre-fix, gen-1 files read all-null under the current name: NDV
    // halved (~5000), null count inflated to 5000, and — the row-losing
    // shape — the partition zone map claimed min=10000, so `key = 42`
    // would PRUNE the partition holding it
    val stats = AtomicTable.colStats(root.properties)("key")
    assert(stats.ndv.exists(n => n > 9000L && n < 11000L),
      s"NDV must cover both generations (~10000), got ${stats.ndv}")
    assert(stats.nulls.contains(0L),
      s"no value is null in either generation, got ${stats.nulls}")
    val pstats = root.stats("a")
    assert(pstats.mins.get("key").exists(_.toLong === 0L),
      s"partition min must see gen-1 values under the old field name, " +
        s"got ${pstats.mins}")
    assert(pstats.maxs.get("key").exists(_.toLong === 14999L))
    // and the old value stays REACHABLE through a pruned point read
    assert(spark.sql("SELECT v FROM gcs.db.t3 WHERE key = 42")
      .as[Double].head() === 42.0)
  }

  test("a selective filter on an analyzed column plans a STATIC broadcast join (AQE off)") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.big (k BIGINT, pay STRING, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k', 'retain'='5')")
    // wide payload so the UNFILTERED size is far above the broadcast
    // threshold; k is unique, so `k = const` estimates to ~1 row
    (0L until 50000L).map(i => (i, "x" * 200, "a"))
      .toDF("k", "pay", "p").createOrReplaceTempView("cs_big")
    spark.sql("INSERT INTO gcs.db.big SELECT * FROM cs_big")
    spark.sql("CALL gcs.system.analyze('db.big', 'k')")
    (0L until 50000L).map(i => (i, i % 7)).toDF("k", "grp")
      .createOrReplaceTempView("cs_other")

    withSQLConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (1024 * 1024).toString) {
      // UNFILTERED: ~10 MB estimate, no static broadcast of the big side
      val plain = spark.sql(
        "SELECT count(*) " +
          "FROM gcs.db.big b JOIN cs_other o ON b.k = o.k")
      // the big side must NOT broadcast unfiltered (the other side may)
      val plainBhj = bhjOf(plain.queryExecution.executedPlan)
      assert(!plainBhj.exists(_.buildSide.toString.contains("BuildLeft")),
        s"unfiltered big side must not build a broadcast, got\n$plainBhj")

      // FILTERED on the analyzed unique key: NDV-driven selectivity
      // shrinks the estimate to ~1 row -> the FILTERED BIG SIDE builds
      // the broadcast, statically (AQE is off)
      val filtered = spark.sql(
        "SELECT o.grp " +
          "FROM gcs.db.big b JOIN cs_other o ON b.k = o.k " +
          "WHERE b.k = 123")
      assert(filtered.collect().toSeq.map(_.getLong(0)) === Seq(123L % 7),
        "the join must still answer correctly")
      val bhj = bhjOf(filtered.queryExecution.executedPlan)
      assert(bhj.nonEmpty,
        "the filtered graft side must plan a static broadcast join " +
          s"from reported column stats; got\n" +
          filtered.queryExecution.executedPlan)
    }
  }
}
