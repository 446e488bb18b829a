package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite
import graft.etl.AtomicTable

/** FILE-level zone maps: per-data-file column bounds recorded by the
  * DSv2 writer (one file per task per partition value — the task's
  * stats fragment IS the file's stats) and used by plain reads to skip
  * files INSIDE an admitted partition. The second granularity of data
  * skipping after partition zone maps — at 100 TB the difference
  * between "read the whole day" and "read the two files whose id range
  * matches". The row-level GROUP-replace scan must never skip files
  * (a scanned group rewrites from scan output), pinned here with a
  * would-lose-rows UPDATE. */
class GraftFileSkipSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-fskip").toString
    spark.conf.set("spark.sql.catalog.gfs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs.db")
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

  /** Three appends with DISJOINT id ranges into one partition: three
    * dirs, one file each, each carrying its own [min, max]. */
  private def seedRanged(table: String): Unit = {
    warehouse
    spark.sql(s"CREATE TABLE gfs.db.$table (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10', " +
      "'stats_columns'='id')")
    Seq(0L until 10L, 100L until 110L, 200L until 210L).foreach { r =>
      r.map(i => (i, i * 1.5, "a")).toDF("id", "v", "p")
        .coalesce(1).createOrReplaceTempView(s"src_$table")
      spark.sql(s"INSERT INTO gfs.db.$table SELECT * FROM src_$table")
    }
  }

  test("writer records per-file zone maps; manifest roundtrips them") {
    seedRanged("t1")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t1")).get
    assert(m.partitions("a").size === 3, "three appended dirs")
    // every dir has exactly one file with bounds matching its insert
    val allBounds = m.partitions("a").flatMap { d =>
      m.fileStats(d).values.map(st => (st.rows, st.mins("id"), st.maxs("id")))
    }.toSet
    assert(allBounds === Set((10L, "0", "9"), (10L, "100", "109"),
      (10L, "200", "209")))
    // JSON roundtrip: re-read the manifest file from disk
    val again = AtomicTable.manifestAt(
      Paths.get(warehouse, "db", "t1"), m.version)
    assert(again.fileStats === m.fileStats)
  }

  test("point and range reads plan only the files whose bounds admit") {
    seedRanged("t2")
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect() // drive THIS QueryExecution
      val scans = scansOf(df.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      scans.head.scan.asInstanceOf[GraftScan].planInputPartitions()
        .flatMap(_.asInstanceOf[GraftInputPartition].dataFiles).toSeq
    }
    // point lookup: one of three files
    val q1 = spark.sql("SELECT id, v FROM gfs.db.t2 WHERE id = 105")
    assert(q1.collect().map(_.getLong(0)).toSeq === Seq(105L))
    assert(plannedFiles(q1).size === 1, "id=105 lives in one file's range")
    // range straddling two files
    val q2 = spark.sql("SELECT count(*) FROM gfs.db.t2 WHERE id >= 100")
    assert(q2.as[Long].head() === 20L)
    assert(plannedFiles(q2).size === 2, "id >= 100 refutes the 0-9 file")
    // no filter, non-aggregate: all three files
    val q3 = spark.sql("SELECT id FROM gfs.db.t2")
    assert(q3.collect().length === 30)
    assert(plannedFiles(q3).size === 3)
    // no filter, bare count(*): answered from METADATA — zero files
    val q3agg = spark.sql("SELECT count(*) FROM gfs.db.t2")
    assert(q3agg.as[Long].head() === 30L)
    q3agg.collect()
    assert(scansOf(q3agg.queryExecution.executedPlan)
      .head.scan.isInstanceOf[GraftAggScan],
      "unfiltered count(*) should plan the metadata-only aggregate scan")
    // filter on an untracked column: never prunes
    val q4 = spark.sql("SELECT count(*) FROM gfs.db.t2 WHERE v < 15.0")
    assert(q4.as[Long].head() === 10L)
    assert(plannedFiles(q4).size === 3, "v is untracked — no file pruning")
  }

  test("row-level UPDATE never file-skips: all rows of the group survive") {
    seedRanged("t3")
    // the condition refutes two of the three files; if the group scan
    // file-skipped, the rewrite would drop their 20 rows
    spark.sql("UPDATE gfs.db.t3 SET v = -1.0 WHERE id = 105")
    assert(spark.sql("SELECT count(*) FROM gfs.db.t3").as[Long].head() === 30L,
      "rows outside the updated file's range must survive the rewrite")
    assert(spark.sql("SELECT v FROM gfs.db.t3 WHERE id = 105")
      .as[Double].head() === -1.0)
    assert(spark.sql("SELECT count(*) FROM gfs.db.t3 WHERE v = -1.0")
      .as[Long].head() === 1L)
    // the rewrite's own files carry fresh file stats
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t3")).get
    val liveDirs = m.partitions.values.flatten.toSet
    assert(m.fileStats.keySet.subsetOf(liveDirs),
      "file stats must follow live dirs only")
    assert(m.fileStats.nonEmpty)
  }

  test("CALL system.analyze backfills both stat levels; reads then prune") {
    warehouse
    // NO declared stats: the writer records nothing
    spark.sql("CREATE TABLE gfs.db.t5 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    Seq(0L until 10L, 100L until 110L).foreach { r =>
      r.map(i => (i, i * 1.5, "a")).toDF("id", "v", "p")
        .coalesce(1).createOrReplaceTempView("src_t5")
      spark.sql("INSERT INTO gfs.db.t5 SELECT * FROM src_t5")
    }
    val dir = Paths.get(warehouse, "db", "t5")
    // rows-only stats exist on every write (LIMIT/count(*) pushdown);
    // no COLUMN BOUNDS until ANALYZE installs them
    val pre = AtomicTable.manifest(dir).get
    assert(pre.fileStats.values.flatMap(_.values)
      .forall(st => st.mins.isEmpty && st.maxs.isEmpty))
    assert(pre.stats.values.forall(st => st.mins.isEmpty && st.maxs.isEmpty))
    val res = spark.sql("CALL gfs.system.analyze('db.t5', 'id')")
      .as[(Long, Long)].head()
    assert(res._2 === 2L, "two committed files analyzed")
    val m = AtomicTable.manifest(dir).get
    // partition-level maps folded from the file maps
    assert(m.stats("a").rows === 20L)
    assert(m.stats("a").mins("id") === "0" && m.stats("a").maxs("id") === "109")
    // file-level maps installed, and a point read prunes to one file
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      scansOf(df.queryExecution.executedPlan).head
        .scan.asInstanceOf[GraftScan].planInputPartitions()
        .map(_.asInstanceOf[GraftInputPartition].dataFiles.size).sum
    }
    val q = spark.sql("SELECT id FROM gfs.db.t5 WHERE id = 105")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(105L))
    assert(plannedFiles(q) === 1, "post-analyze point read plans one file")
    // analyzing a column that is sometimes null never blocks: v works too
    spark.sql("CALL gfs.system.analyze('db.t5', 'id,v')")
    val m2 = AtomicTable.manifest(dir).get
    assert(m2.stats("a").mins.keySet === Set("id", "v"))
  }

  test("cluster_by compaction: interleaved files become range-disjoint") {
    warehouse
    spark.sql("CREATE TABLE gfs.db.t6 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10', " +
      "'stats_columns'='id', 'cluster_by'='id')")
    // three inserts with INTERLEAVED ids: every file spans ~[0, 300),
    // so pre-compaction bounds overlap and nothing can file-skip
    (0 until 3).foreach { k =>
      (0L until 300L).filter(_ % 3 == k).map(i => (i, i * 1.5, "a"))
        .toDF("id", "v", "p").coalesce(1).createOrReplaceTempView("src_t6")
      spark.sql("INSERT INTO gfs.db.t6 SELECT * FROM src_t6")
    }
    def plannedFiles(sql: String): Int = {
      val df = spark.sql(sql)
      df.collect()
      scansOf(df.queryExecution.executedPlan).head
        .scan.asInstanceOf[GraftScan].planInputPartitions()
        .map(_.asInstanceOf[GraftInputPartition].dataFiles.size).sum
    }
    assert(plannedFiles("SELECT id FROM gfs.db.t6 WHERE id <= 50") === 3,
      "interleaved bounds overlap — nothing skippable before compaction")
    // clustered compaction: range-partition on (p, id), three files out
    spark.sql("CALL gfs.system.compact('db.t6', 2, 3)")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t6")).get
    assert(m.partitions("a").size === 1, "one rewritten dir")
    val bounds = m.fileStats(m.partitions("a").head).values
      .map(st => (st.mins("id").toLong, st.maxs("id").toLong)).toSeq.sorted
    assert(bounds.size >= 2, "the rewrite split the partition into ranges")
    bounds.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"file ranges must be disjoint: $bounds")
      case _ => ()
    }
    // the same range read now skips the non-matching range files
    val planned = plannedFiles("SELECT id FROM gfs.db.t6 WHERE id <= 50")
    assert(planned < bounds.size,
      s"post-compaction range read must skip files (planned $planned of ${bounds.size})")
    assert(spark.sql("SELECT count(*) FROM gfs.db.t6").as[Long].head() === 300L)
    assert(spark.sql("SELECT sum(id) FROM gfs.db.t6 WHERE id <= 50")
      .as[Long].head() === (0L to 50L).sum)
  }

  test("maintenance flows: compact drops stale entries, rollback restores") {
    seedRanged("t4")
    val dir = Paths.get(warehouse, "db", "t4")
    val vSeeded = AtomicTable.manifest(dir).get.version
    spark.sql("CALL gfs.system.compact('db.t4', 2)")
    val mC = AtomicTable.manifest(dir).get
    val live = mC.partitions.values.flatten.toSet
    assert(mC.fileStats.keySet.subsetOf(live),
      "compaction must not leak dropped dirs' file stats")
    // rollback to the fragmented version restores its file stats
    spark.sql(s"CALL gfs.system.rollback('db.t4', $vSeeded)")
    val mR = AtomicTable.manifest(dir).get
    assert(mR.partitions("a").size === 3)
    val bounds = mR.partitions("a").flatMap(d =>
      mR.fileStats.getOrElse(d, Map.empty).values.map(_.maxs("id"))).toSet
    assert(bounds === Set("9", "109", "209"),
      "restore must carry the restored dirs' file stats")
    // and reads prune again post-restore
    assert(spark.sql("SELECT count(*) FROM gfs.db.t4 WHERE id = 5")
      .as[Long].head() === 1L)
  }
}
