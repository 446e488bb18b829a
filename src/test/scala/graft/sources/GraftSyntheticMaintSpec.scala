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

  test("spec evolution TO a bucket layout: one rewrite, then SPJ-ready") {
    warehouse
    spark.sql("CREATE TABLE gsm.db.e (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='20')")
    Seq("x", "y").flatMap(p => (0L until 30L).map(i => (i, i * 1.0, p)))
      .toDF("k", "v", "p").createOrReplaceTempView("src_e")
    spark.sql("INSERT INTO gsm.db.e SELECT * FROM src_e")
    val cat = spark.sessionState.catalogManager.catalog("gsm")
      .asInstanceOf[GraftCatalog]
    cat.repartitionDeclaredTable(spark,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "e"), "k_bucket4")
    val root = Paths.get(warehouse, "db", "e")
    val m = AtomicTable.manifest(root).get
    assert(m.operation === "repartition")
    assert(m.partitions.keySet.subsetOf(Set("0", "1", "2", "3")))
    // one file per bucket (the rewrite clustered on the derived id)
    m.partitions.values.flatten.foreach { d =>
      val s = Files.list(root.resolve(d))
      val nf = try s.filter(_.toString.endsWith(".parquet")).count()
        finally s.close()
      assert(nf === 1L, s"evolved dir $d must hold one file")
    }
    assert(spark.sql("SELECT count(*) FROM gsm.db.e").as[Long].head() === 60L)
    // the p column survived as data; the bucket lookup prunes
    assert(spark.sql("SELECT count(*) FROM gsm.db.e WHERE p = 'y'")
      .as[Long].head() === 30L)
    assert(spark.sql("SELECT sum(v) FROM gsm.db.e WHERE k = 7")
      .as[Double].head() === 14.0, "both p-copies of k=7")
    // the next INSERT stages under the evolved bucket spec
    spark.sql("INSERT INTO gsm.db.e VALUES (100, 1.0, 'z')")
    assert(spark.sql("SELECT count(*) FROM gsm.db.e").as[Long].head() === 61L)
    assert(AtomicTable.manifest(root).get.partitions.keySet
      .subsetOf(Set("0", "1", "2", "3")))
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
