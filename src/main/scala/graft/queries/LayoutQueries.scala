package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Stable.sqlDsum

/** Layout-driven plan-shape queries: the manifest's per-dir sort
  * markers (write_order / clustered compaction) let the DSv2 scan
  * report output ordering, so a storage-partitioned join over two
  * clustered tables plans with neither exchanges nor sorts. The staged
  * setup RUNS that join once under the SPJ confs and hard-fails unless
  * the merge join's subtree is exchange-free AND sort-free — the plan
  * pin executes inside the oracled query, not just in a spec — while
  * the returned frame is the ordinary lazy aggregate the DuckDB oracle
  * value-checks. */
object LayoutQueries {

  private val staged = new ConcurrentHashMap[String, String]()

  /** Two month-partitioned, o_orderkey-clustered order tables (distinct
    * key subsets), compacted to one sorted file per partition; the
    * equi-join on (month, key) is pinned zero-exchange + zero-sort,
    * then value-oracled per month. */
  private[queries] def graftSortedJoin(s: SparkSession, dir: String): DataFrame = {
    val cat = staged.computeIfAbsent(dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-sj").toString
      val cat = "gj" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView(s"orders_sjsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.sj1 " +
        "(o_ym STRING, o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "PARTITIONED BY (o_ym) " +
        "TBLPROPERTIES ('cluster_by'='o_orderkey', 'retain'='5')")
      s.sql(s"CREATE TABLE $cat.wh.sj2 " +
        "(o_ym STRING, o_orderkey BIGINT, o_custkey BIGINT) " +
        "PARTITIONED BY (o_ym) " +
        "TBLPROPERTIES ('cluster_by'='o_orderkey', 'retain'='5')")
      // two interleaved INSERTs each -> fragmented, unmarked dirs
      s.sql(s"INSERT INTO $cat.wh.sj1 SELECT o_ym, o_orderkey, " +
        s"o_totalprice FROM orders_sjsrc_$cat WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO $cat.wh.sj1 SELECT o_ym, o_orderkey, " +
        s"o_totalprice FROM orders_sjsrc_$cat WHERE o_orderkey % 2 = 1")
      s.sql(s"INSERT INTO $cat.wh.sj2 SELECT o_ym, o_orderkey, o_custkey " +
        s"FROM orders_sjsrc_$cat WHERE o_orderkey % 3 = 0 AND " +
        "o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO $cat.wh.sj2 SELECT o_ym, o_orderkey, o_custkey " +
        s"FROM orders_sjsrc_$cat WHERE o_orderkey % 3 = 0 AND " +
        "o_orderkey % 2 = 1")
      // clustered compaction of the WHOLE table (min_files=1 — the
      // OPTIMIZE analog): one o_orderkey-sorted file per month, every
      // dir marked sorted-by in the manifest. A sparse month whose
      // second INSERT matched nothing would otherwise stay unmarked,
      // and one unmarked dir honestly collapses the whole claim.
      s.sql(s"CALL $cat.system.compact('wh.sj1', 1)")
      s.sql(s"CALL $cat.system.compact('wh.sj2', 1)")
      // THE PIN: under the SPJ confs the join must plan a merge join
      // whose subtree has no exchange and no sort — scans straight in
      val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
        "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled",
        "spark.sql.requireAllClusterKeysForCoPartition")
      val prev = keys.map(k => k -> s.conf.getOption(k))
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      try {
        val j = s.sql(s"SELECT t1.o_ym, t1.o_orderkey FROM $cat.wh.sj1 t1 " +
          s"JOIN $cat.wh.sj2 t2 ON t1.o_ym = t2.o_ym AND " +
          "t1.o_orderkey = t2.o_orderkey")
        j.collect()
        val smj = j.queryExecution.executedPlan.collect {
          case m: org.apache.spark.sql.execution.joins.SortMergeJoinExec => m
        }
        require(smj.nonEmpty,
          "the clustered SPJ must plan a sort-merge join:\n" +
            j.queryExecution.executedPlan)
        require(!smj.head.toString.contains("Exchange") &&
          smj.head.collect {
            case so: org.apache.spark.sql.execution.SortExec => so
          }.isEmpty,
          "sorted single-file groups must join with zero exchanges and " +
            "zero sorts:\n" + j.queryExecution.executedPlan)
      } finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
      cat
    })
    s.sql(s"""SELECT t1.o_ym, count(*) AS n_rows,
      CAST(SUM(t2.o_custkey) AS BIGINT) AS sum_ckey,
      CAST(SUM(CAST(t1.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM $cat.wh.sj1 t1 JOIN $cat.wh.sj2 t2
        ON t1.o_ym = t2.o_ym AND t1.o_orderkey = t2.o_orderkey
      GROUP BY t1.o_ym ORDER BY t1.o_ym""")
  }

  /** Runtime zone-map FILE skipping on a data column: orders land
    * month-partitioned with three o_orderkey-range-disjoint files per
    * month (clustered compaction), and a selective join against a
    * narrow key band must runtime-prune FILES — the key is not a
    * partition column, so partition pruning cannot help; only the
    * runtime values tested against per-file bounds can. The staged
    * setup pins (a) the runtime filter was delivered and (b) the
    * planned file count dropped below 60% of the committed files; the
    * returned aggregate is value-oracled, so over-skipping loses rows
    * and fails the compare. */
  private[queries] def graftRuntimeSkip(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.AtomicTable
    val state = staged.computeIfAbsent("rts:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-rtsq")
        .resolve("orders").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      AtomicTable.replacePartitions(s, t, base.repartition(col("o_ym")),
        "o_ym", statsColumns = Seq("o_orderkey"), retain = 5)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("o_ym",
          org.apache.spark.sql.types.StringType)))
      // three key-range-disjoint files per month, each with file bounds
      AtomicTable.compactFragmented(s, t, schema, "o_ym", minFiles = 1,
        statsColumns = Seq("o_orderkey"), retain = 5,
        clusterBy = Seq("o_orderkey"), filesPerPartition = 3)
      // the band: [mk/3, mk/3 + mk/50] — same integer arithmetic the
      // oracle derives, so both engines join the same keys
      val mk = base.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val lo = mk / 3L
      val hi = lo + mk / 50L
      // THE PIN, executed once: runtime values must skip files
      val fact = s.read.format("graft").load(t)
      val dim = fact.filter(col("o_orderkey").between(lo, hi))
        .select("o_orderkey").distinct()
      val j = fact.join(broadcast(dim), Seq("o_orderkey"))
      j.collect()
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
      // the fact side is the scan WITH a delivered runtime filter
      val scans = scansOf(j.queryExecution.executedPlan)
        .filter(_.runtimeFilters.nonEmpty)
      require(scans.nonEmpty,
        "the selective join must deliver a runtime filter to the fact scan")
      val planned = graft.sources.GraftSource
        .plannedFileCount(scans.head.scan).get
      val m = AtomicTable.manifest(java.nio.file.Paths.get(t)).get
      val total = m.fileStats.valuesIterator.map(_.size).sum
      require(total > 0 && planned * 10 < total * 6,
        s"runtime key values must skip files by bounds: planned $planned " +
          s"of $total")
      s"$t|$lo|$hi"
    })
    val Array(t, lo, hi) = state.split('|')
    val fact = s.read.format("graft").load(t)
    val dim = fact
      .filter(col("o_orderkey").between(lo.toLong, hi.toLong))
      .select("o_orderkey").distinct()
    fact.join(broadcast(dim), Seq("o_orderkey"))
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("revenue"))
      .orderBy("o_ym")
  }

  private[queries] val graftRuntimeSkipSql =
    s"""WITH mk AS (SELECT max(o_orderkey) AS m FROM orders),
       |dim AS (
       |  SELECT DISTINCT o_orderkey FROM orders, mk
       |  WHERE o_orderkey BETWEEN m // 3 AND m // 3 + m // 50)
       |SELECT strftime(o.o_orderdate, '%Y-%m') AS o_ym,
       |  count(*) AS n_rows,
       |  ${sqlDsum("o.o_totalprice", 2)} AS revenue
       |FROM orders o JOIN dim d ON o.o_orderkey = d.o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-file BLOOM sidecars on an UNCLUSTERED key: orders land
    * month-partitioned in three interleaved key-thirds (every file's
    * key range spans the whole table — zone maps can never skip), then
    * a 5-key point lookup must plan under a fifth of the committed
    * files purely from the sidecars. The pin executes in the staged
    * setup; the returned aggregate is value-oracled, so a wrong bit, a
    * stale sidecar, or an over-skip loses a row and fails the compare. */
  private[queries] def graftBloomPoint(s: SparkSession, dir: String): DataFrame = {
    val state = staged.computeIfAbsent("bloom:" + dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-blq").toString
      val cat = "gp" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
        .createOrReplaceTempView(s"orders_blsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.borders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_ym STRING) " +
        "PARTITIONED BY (o_ym) " +
        "TBLPROPERTIES ('bloom_columns'='o_orderkey', 'retain'='5')")
      for (k <- 0 to 2)
        s.sql(s"INSERT INTO $cat.wh.borders SELECT * FROM " +
          s"orders_blsrc_$cat WHERE o_orderkey % 3 = $k")
      // the probe keys, by arithmetic both engines share
      val keys = s.sql(s"SELECT o_orderkey FROM orders_blsrc_$cat " +
        "WHERE o_orderkey % 97 = 0 ORDER BY 1 LIMIT 5")
        .collect().map(_.getLong(0)).toSeq
      val q = s.sql(s"SELECT o_orderkey, o_totalprice, o_ym FROM " +
        s"$cat.wh.borders WHERE o_orderkey IN (${keys.mkString(",")})")
      q.collect()
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scansOf(a.executedPlan)
          case qq: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scansOf(qq.plan)
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            Seq(b)
          case o => o.children.flatMap(scansOf)
        }
      val planned = graft.sources.GraftSource
        .plannedFileCount(scansOf(q.queryExecution.executedPlan).head.scan).get
      val m = graft.etl.AtomicTable.manifest(
        java.nio.file.Paths.get(w, "wh", "borders")).get
      val total = m.fileStats.valuesIterator.map(_.size).sum
      require(total > 0 && planned * 5 < total,
        s"5 point keys must bloom-skip an unclustered table: planned " +
          s"$planned of $total files")
      s"$cat|${keys.mkString(",")}"
    })
    val Array(cat, keyCsv) = state.split('|')
    s.sql(s"""SELECT o_ym, count(*) AS n_rows,
      CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM $cat.wh.borders WHERE o_orderkey IN ($keyCsv)
      GROUP BY o_ym ORDER BY o_ym""")
  }

  private[queries] val graftBloomPointSql =
    s"""WITH keys AS (
       |  SELECT o_orderkey FROM orders
       |  WHERE o_orderkey % 97 = 0 ORDER BY 1 LIMIT 5)
       |SELECT strftime(o.o_orderdate, '%Y-%m') AS o_ym, count(*) AS n_rows,
       |  CAST(sum(o.o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o.o_totalprice", 2)} AS revenue
       |FROM orders o JOIN keys k ON o.o_orderkey = k.o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Snapshot TAGS under churn: seed a retain=1 table (v1), tag it
    * 'baseline', then overwrite the whole table twice — without the tag
    * v1's manifest and data would be GC'd by the aggressive retention;
    * with it, `VERSION AS OF 'baseline'` must still read EXACTLY the
    * seed. The oracle aggregates the raw seed data, so a reclaimed dir,
    * a tag resolving to the wrong version, or churn leaking into the
    * pinned snapshot all shift a month's sum and fail the compare. */
  private[queries] def graftTagTravel(s: SparkSession, dir: String): DataFrame = {
    val cat = staged.computeIfAbsent("tag:" + dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-tagq").toString
      val cat = "gw" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
        .createOrReplaceTempView(s"orders_tagsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.torders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_ym STRING) " +
        "PARTITIONED BY (o_ym) TBLPROPERTIES ('retain'='1')")
      s.sql(s"INSERT INTO $cat.wh.torders " +
        s"SELECT * FROM orders_tagsrc_$cat")                          // v1
      s.sql(s"CALL $cat.system.tag('wh.torders', 'baseline', 1)")     // v2
      // churn that rewrites every partition, twice, at retain=1
      s.sql(s"INSERT OVERWRITE $cat.wh.torders SELECT o_orderkey, " +
        s"o_totalprice + 5.0, o_ym FROM orders_tagsrc_$cat " +
        "WHERE o_orderkey % 2 = 0")                                   // v3
      s.sql(s"INSERT OVERWRITE $cat.wh.torders SELECT o_orderkey, " +
        s"o_totalprice + 9.0, o_ym FROM orders_tagsrc_$cat " +
        "WHERE o_orderkey % 5 = 0")                                   // v4
      cat
    })
    s.sql(s"""SELECT o_ym, count(*) AS n_rows,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM $cat.wh.torders VERSION AS OF 'baseline'
      GROUP BY o_ym ORDER BY o_ym""")
  }

  private[queries] val graftTagTravelSql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS o_ym, count(*) AS n_rows,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  private[queries] val graftSortedJoinSql =
    s"""WITH src AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS o_ym, o_orderkey,
       |         o_custkey, o_totalprice
       |  FROM orders),
       |t2 AS (SELECT * FROM src WHERE o_orderkey % 3 = 0)
       |SELECT t1.o_ym, count(*) AS n_rows,
       |  CAST(sum(t2.o_custkey) AS BIGINT) AS sum_ckey,
       |  ${sqlDsum("t1.o_totalprice", 2)} AS revenue
       |FROM src t1 JOIN t2
       |  ON t1.o_ym = t2.o_ym AND t1.o_orderkey = t2.o_orderkey
       |GROUP BY t1.o_ym ORDER BY t1.o_ym""".stripMargin

  /** METADATA-ONLY column rename end-to-end through SQL: the pre-1996
    * orders land under the ORIGINAL column names, `ALTER TABLE ...
    * RENAME COLUMN` flips o_orderkey→o_key and o_totalprice→o_price
    * without touching a data file (pinned: the partition dir lists are
    * IDENTICAL across the rename commit), the remaining orders land
    * under the NEW names, and the aggregate reads both generations
    * through the alias chain — with a range predicate on the renamed
    * key column, so alias-aware zone-map pruning is on the oracled
    * path (old files' bounds live under o_orderkey, new files' under
    * o_key; a lost alias loses rows and fails the value compare). */
  private[queries] def graftRenameEvolve(s: SparkSession, dir: String): DataFrame = {
    val cat = staged.computeIfAbsent("rn:" + dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-rnq").toString
      val cat = "grn" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
        col("o_orderkey"), col("o_totalprice"))
        .createOrReplaceTempView(s"orders_rnsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.rn " +
        "(o_ym STRING, o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "PARTITIONED BY (o_ym) " +
        "TBLPROPERTIES ('stats_columns'='o_orderkey', 'retain'='5')")
      s.sql(s"INSERT INTO $cat.wh.rn SELECT o_ym, o_orderkey, " +
        s"o_totalprice FROM orders_rnsrc_$cat WHERE o_ym < '1996-01'")
      val root = java.nio.file.Paths.get(w, "wh", "rn")
      val before = graft.etl.AtomicTable.rootOpt(root).get.partitions
      s.sql(s"ALTER TABLE $cat.wh.rn RENAME COLUMN o_orderkey TO o_key")
      s.sql(s"ALTER TABLE $cat.wh.rn RENAME COLUMN o_totalprice TO o_price")
      // THE PIN: the rename moved zero data — same dirs, byte for byte
      require(graft.etl.AtomicTable.rootOpt(root).get.partitions == before,
        "RENAME COLUMN must be metadata-only (identical data dirs)")
      s.sql(s"INSERT INTO $cat.wh.rn SELECT o_ym, o_orderkey AS o_key, " +
        s"o_totalprice AS o_price FROM orders_rnsrc_$cat " +
        "WHERE o_ym >= '1996-01'")
      cat
    })
    s.sql(s"""SELECT o_ym, count(*) AS n_rows,
      CAST(SUM(CAST(o_price AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM $cat.wh.rn WHERE o_key <= 15000
      GROUP BY o_ym ORDER BY o_ym""")
  }

  private[queries] val graftRenameEvolveSql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS o_ym, count(*) AS n_rows,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM orders WHERE o_orderkey <= 15000
       |GROUP BY 1 ORDER BY 1""".stripMargin
}
