package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.etl.AtomicTable

/** `TBLPROPERTIES ('write_order'='col')` — range-clustered INSERTs:
  * every write RANGE-distributes and sorts on (partition levels, order
  * columns), so each partition's files land range-DISJOINT in the
  * order columns AT WRITE TIME. File-level zone maps then prune point
  * and range reads immediately — ingestion-time clustering, the effect
  * `cluster_by` compaction produces, without waiting for maintenance. */
class GraftWriteOrderSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-worder").toString
    spark.conf.set("spark.sql.catalog.gwo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwo.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwo.db")
    w
  }

  private def withoutCoalesce[T](f: => T): T = {
    val k = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try f finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("ordered INSERT lands range-disjoint files; point reads prune") {
    warehouse
    spark.sql("CREATE TABLE gwo.db.t1 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5', " +
      "'write_order'='id', 'stats_columns'='id')")
    // interleaved ids across 8 input partitions: without the ordered
    // distribution the single staged file would span the full range
    (0L until 800L).map(i => (i, i * 1.0, "a")).toDF("id", "v", "p")
      .repartition(8).createOrReplaceTempView("src_t1")
    withoutCoalesce {
      spark.sql("INSERT INTO gwo.db.t1 SELECT * FROM src_t1")
    }
    val root = Paths.get(warehouse, "db", "t1")
    val m = AtomicTable.manifest(root).get
    // several files, each covering a DISJOINT id range
    val bounds = m.partitions("a").flatMap(d =>
      m.fileStats(d).values.map(st =>
        (st.mins("id").toLong, st.maxs("id").toLong))).sortBy(_._1)
    assert(bounds.size > 1, s"range write must land several files: $bounds")
    bounds.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges must be disjoint: $bounds")
      case _ => ()
    }
    assert(spark.sql("SELECT count(*) FROM gwo.db.t1").as[Long].head() === 800L)
    // a point read plans exactly ONE file (file-level zone maps)
    val q = spark.sql("SELECT v FROM gwo.db.t1 WHERE id = 555")
    assert(q.as[Double].collect().toSeq === Seq(555.0))
    q.collect()
    val planned = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[GraftScan].planInputPartitions()
      .flatMap(_.asInstanceOf[GraftInputPartition].dataFiles)
    assert(planned.length === 1,
      s"id=555 lives in one range-disjoint file, planned $planned")
  }

  test("$files metadata table audits the per-file bounds from SQL") {
    warehouse
    // exercised against the range-clustered table t1 (seeded above by
    // run order; re-seed defensively if running alone)
    if (!spark.catalog.tableExists("gwo.db.t1")) cancel("t1 not seeded")
    val rows = spark.sql(
      "SELECT partition, dir, num_rows, mins['id'] AS lo, maxs['id'] AS hi " +
        "FROM gwo.db.`t1$files` ORDER BY CAST(mins['id'] AS BIGINT)")
      .collect()
    assert(rows.length > 1, "one row per committed file")
    assert(rows.map(_.getLong(2)).sum === 800L,
      "file rows sum to the table count")
    // the audited bounds ARE range-disjoint (write_order's contract)
    val bounds = rows.map(r => (r.getString(3).toLong, r.getString(4).toLong))
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ => ()
    }
  }

  test("write_order and write_salt refuse to combine") {
    warehouse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gwo.db.bad (id BIGINT, p STRING) " +
        "PARTITIONED BY (p) TBLPROPERTIES " +
        "('write_order'='id', 'write_salt'='id:4')")
    }
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("ordered writes compose with a days(ts) transform layout") {
    warehouse
    spark.sql("CREATE TABLE gwo.db.t2 (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES " +
      "('write_order'='id', 'stats_columns'='id')")
    val rows = for (d <- 0 until 2; i <- 0 until 200) yield
      ((d * 200 + i).toLong,
        java.sql.Timestamp.from(java.time.Instant.parse(
          f"2021-06-0${d + 1}%dT10:00:${i % 60}%02dZ")))
    rows.toDF("id", "ts").repartition(8).createOrReplaceTempView("src_t2")
    withoutCoalesce {
      spark.sql("INSERT INTO gwo.db.t2 SELECT * FROM src_t2")
    }
    assert(spark.sql("SELECT count(*) FROM gwo.db.t2").as[Long].head() === 400L)
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "t2")).get
    assert(m.partitions.keySet === Set("2021-06-01", "2021-06-02"))
    // each day's files disjoint in id
    m.partitions.foreach { case (day, dirs) =>
      val bounds = dirs.flatMap(d => m.fileStats(d).values.map(st =>
        (st.mins("id").toLong, st.maxs("id").toLong))).sortBy(_._1)
      bounds.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          assert(hi < lo2, s"day $day file ranges overlap: $bounds")
        case _ => ()
      }
    }
  }
}
