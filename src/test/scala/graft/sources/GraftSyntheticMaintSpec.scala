package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.etl.AtomicTable

/** The "opaque level" claim, pinned: bucket and transform levels ride
  * every spec-agnostic maintenance surface unchanged — compaction folds
  * small-file debt inside a bucket, time travel pins the pre-compaction
  * snapshot, the SQL changefeed attributes row-level changes across
  * bucketed commits, and vacuum reclaims the superseded dirs — because
  * all of them key on manifest dirs, never on what the level MEANS. */
class GraftSyntheticMaintSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-synmaint").toString
    spark.conf.set("spark.sql.catalog.gsm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsm.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsm.db")
    w
  }

  test("compact folds a fragmented bucket; lookups still prune; time travel pins") {
    warehouse
    spark.sql("CREATE TABLE gsm.db.b (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('retain'='20')")
    // five small appends fragment every bucket
    for (i <- 0 until 5) {
      (i * 20L until i * 20L + 20L).map(j => (j, j * 1.0)).toDF("k", "v")
        .createOrReplaceTempView(s"src_b_$i")
      spark.sql(s"INSERT INTO gsm.db.b SELECT * FROM src_b_$i")
    }
    val root = Paths.get(warehouse, "db", "b")
    val preVersion = AtomicTable.currentVersion(root).get
    val res = spark.sql("CALL gsm.system.compact('db.b', 2)").collect()
    assert(res.nonEmpty)
    val m = AtomicTable.manifest(root).get
    // each bucket folded to one dir with one file
    m.partitions.foreach { case (b, dirs) =>
      assert(dirs.size === 1, s"bucket $b must fold to one dir")
    }
    assert(spark.sql("SELECT count(*) FROM gsm.db.b").as[Long].head() === 100L)
    // the point lookup still prunes to one bucket after the rewrite
    val q = spark.sql("SELECT v FROM gsm.db.b WHERE k = 42")
    assert(q.as[Double].collect().toSeq === Seq(42.0))
    // time travel reads the PRE-compaction snapshot intact
    val old = spark.read.format("graft")
      .option("versionAsOf", preVersion.toString)
      .load(root.toString)
    assert(old.count() === 100L)
  }

  test("SQL changefeed attributes changes across bucketed commits") {
    warehouse
    spark.sql("CREATE TABLE gsm.db.c (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES ('retain'='20')")
    spark.sql("INSERT INTO gsm.db.c VALUES (1, 10), (2, 20), (3, 30)") // v1
    spark.sql("UPDATE gsm.db.c SET v = 21 WHERE k = 2")                // v2
    spark.sql("DELETE FROM gsm.db.c WHERE k = 3")                      // v3
    spark.sql("CALL gsm.system.table_changes('db.c', 2, 3, 'k', 'c_ch')")
    val ch = spark.sql("SELECT k, v, _change_type, _commit_version " +
      "FROM c_ch").as[(Long, Long, String, Long)].collect().toSet
    assert(ch === Set(
      (2L, 20L, "update_preimage", 2L),
      (2L, 21L, "update_postimage", 2L),
      (3L, 30L, "delete", 3L)))
  }

  test("compact + vacuum on a days(ts) table; pruning survives the rewrite") {
    warehouse
    spark.sql("CREATE TABLE gsm.db.t (id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES ('retain'='2')")
    for (i <- 0 until 4) {
      Seq((i * 2L, s"2021-05-0${i % 2 + 1} 0$i:00:00"),
        (i * 2L + 1L, s"2021-05-0${i % 2 + 1} 0$i:30:00"))
        .toDF("id", "ts_s")
        .selectExpr("id", "to_timestamp(ts_s) AS ts")
        .createOrReplaceTempView(s"src_t_$i")
      spark.sql(s"INSERT INTO gsm.db.t SELECT * FROM src_t_$i")
    }
    val root = Paths.get(warehouse, "db", "t")
    assert(AtomicTable.manifest(root).get.partitions
      .values.exists(_.size > 1), "days are fragmented before compact")
    spark.sql("CALL gsm.system.compact('db.t', 2)").collect()
    assert(spark.sql("SELECT count(*) FROM gsm.db.t").as[Long].head() === 8L)
    val q = spark.sql(
      "SELECT id FROM gsm.db.t WHERE ts >= TIMESTAMP'2021-05-02 00:00:00'")
    assert(q.as[Long].collect().toSet ===
      Set(2L, 3L, 6L, 7L), "day-2 rows only")
    // vacuum reclaims the superseded pre-compaction dirs
    val vac = spark.sql("CALL gsm.system.vacuum('db.t', 0)").collect()
    assert(vac.nonEmpty)
    assert(spark.sql("SELECT count(*) FROM gsm.db.t").as[Long].head() === 8L)
  }
}
