package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.etl.AtomicTable

/** `TBLPROPERTIES ('write_salt'='col:N')` — write fan-out for big
  * partitions: INSERT clusters on (partition levels, bucket(N, col)),
  * so a partition's rows land in up to N writer TASKS = N files per
  * commit instead of one. At 100 TB this is the difference between a
  * 1 TB day funnelling through one writer and N writers streaming in
  * parallel; compaction folds the files back when fragmentation bites,
  * and per-file stats/LIMIT pushdown ride the extra files for free. */
class GraftWriteSaltSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-salt").toString
    spark.conf.set("spark.sql.catalog.gws", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gws.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gws.db")
    w
  }

  // AQE coalescing folds TINY shuffles back to few tasks (desirable in
  // production — the salt is an UPPER bound of N, not a floor); these
  // tests disable coalescing so test-sized data exercises the fan-out
  private def withoutCoalesce[T](f: => T): T = {
    val k = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try f finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("salted INSERT fans one partition out to several files") {
    warehouse
    spark.sql("CREATE TABLE gws.db.t1 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5', " +
      "'write_salt'='id:4', 'stats_columns'='id')")
    (0L until 400L).map(i => (i, i * 1.0, if (i < 360) "big" else "small"))
      .toDF("id", "v", "p").repartition(8)
      .createOrReplaceTempView("src_t1")
    withoutCoalesce {
      spark.sql("INSERT INTO gws.db.t1 SELECT * FROM src_t1")
    }
    val root = Paths.get(warehouse, "db", "t1")
    val m = AtomicTable.manifest(root).get
    def filesOf(part: String): Long = m.partitions(part).map { d =>
      val s = Files.list(root.resolve(d))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }.sum
    val big = filesOf("big")
    assert(big > 1L && big <= 4L,
      s"the big partition must fan out to 2..4 files, got $big")
    assert(spark.sql("SELECT count(*) FROM gws.db.t1").as[Long].head() === 400L)
    assert(spark.sql("SELECT sum(id) FROM gws.db.t1 WHERE p = 'big'")
      .as[Long].head() === (0L until 360L).sum)
    // per-file stats recorded for every fanned-out file -> LIMIT
    // pushdown still counts exactly
    val q = spark.sql("SELECT id FROM gws.db.t1 LIMIT 5")
    assert(q.collect().length === 5)
    q.collect()
    val planned = q.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[GraftScan].planInputPartitions()
      .flatMap(_.asInstanceOf[GraftInputPartition].dataFiles)
    assert(planned.length === 1, "one fanned-out file covers LIMIT 5")
  }

  test("write_salt is declared meta: survives reload, ALTER can drop it") {
    warehouse
    spark.sql("CREATE TABLE gws.db.t2 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('write_salt'='id:3')")
    (0L until 90L).map(i => (i, "a")).toDF("id", "p").repartition(6)
      .createOrReplaceTempView("src_t2")
    withoutCoalesce {
      spark.sql("INSERT INTO gws.db.t2 SELECT * FROM src_t2")
    }
    val root = Paths.get(warehouse, "db", "t2")
    def files(): Long = {
      val m = AtomicTable.manifest(root).get
      m.partitions.values.flatten.map { d =>
        val s = Files.list(root.resolve(d))
        try s.filter(_.toString.endsWith(".parquet")).count()
        finally s.close()
      }.sum
    }
    val n1 = files()
    assert(n1 > 1L && n1 <= 3L, s"salted insert: 2..3 files, got $n1")
    spark.sql("ALTER TABLE gws.db.t2 UNSET TBLPROPERTIES ('write_salt')")
    withoutCoalesce {
      spark.sql("INSERT INTO gws.db.t2 SELECT id + 100, p FROM src_t2")
    }
    assert(files() === n1 + 1L, "unsalted insert adds ONE file")
    assert(spark.sql("SELECT count(*) FROM gws.db.t2").as[Long].head() === 180L)
  }

  test("bad write_salt specs are refused") {
    warehouse
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE gws.db.bad1 (id BIGINT, p STRING) " +
        "PARTITIONED BY (p) TBLPROPERTIES ('write_salt'='p:4')")
    }
    assert(e1.getMessage.contains("must not be a partition column"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gws.db.bad2 (id BIGINT, p STRING) " +
        "PARTITIONED BY (p) TBLPROPERTIES ('write_salt'='nope:4')")
    }
    assert(e2.getMessage.contains("not in the table schema"))
  }
}
