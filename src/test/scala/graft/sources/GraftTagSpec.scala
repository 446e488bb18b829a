package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.etl.AtomicTable

/** Snapshot tags: `CALL system.tag` pins a retained version against GC
  * under a durable name, `VERSION AS OF '<name>'` resolves it, and
  * `untag` lets it age out — the reproducibility primitive ("the exact
  * corpus snapshot this training run read"). */
class GraftTagSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-tag").toString
    spark.conf.set("spark.sql.catalog.gtag", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtag.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.db")
    w
  }

  test("a tag pins its version's manifest and data across aggressive GC") {
    warehouse
    spark.sql("CREATE TABLE gtag.db.t1 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='1')")
    spark.sql("INSERT INTO gtag.db.t1 VALUES (1, 'a'), (2, 'b')")   // v1
    val dir = Paths.get(warehouse, "db", "t1")
    spark.sql("CALL gtag.system.tag('db.t1', 'prod', 1)")           // v2
    // churn several retain=1 commits that REWRITE v1's partitions —
    // without the tag, v1's manifest and dirs would be reclaimed
    for (i <- 3 to 6)
      spark.sql(s"INSERT OVERWRITE gtag.db.t1 VALUES ($i, 'a'), ($i, 'b')")
    assert(Files.exists(dir.resolve("_manifests").resolve("v1.json")),
      "the tagged manifest must survive retain=1 GC")
    val m1 = AtomicTable.manifestAt(dir, 1L)
    assert(m1.allDirs.forall(d => Files.isDirectory(dir.resolve(d))),
      "every data dir v1 references must survive")
    // SQL resolution: the tag reads exactly v1's contents
    assert(spark.sql("SELECT id FROM gtag.db.t1 VERSION AS OF 'prod' " +
      "ORDER BY id").as[Long].collect().toSeq === Seq(1L, 2L))
    // numeric literals resolve as before
    assert(spark.sql("SELECT count(*) FROM gtag.db.t1 VERSION AS OF 1")
      .as[Long].head() === 2L)
    // the current table is unaffected
    assert(spark.sql("SELECT count(*) FROM gtag.db.t1").as[Long].head() === 2L)
  }

  test("untag releases the pin; the version ages out at the next commit") {
    warehouse
    val dir = Paths.get(warehouse, "db", "t1")
    spark.sql("CALL gtag.system.untag('db.t1', 'prod')")
    spark.sql("INSERT OVERWRITE gtag.db.t1 VALUES (99, 'a')")
    assert(!Files.exists(dir.resolve("_manifests").resolve("v1.json")),
      "after untag, the old version must GC at the next commit")
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM gtag.db.t1 VERSION AS OF 'prod'").collect()
    }
    assert(err.getMessage.contains("no tag"),
      s"an unknown tag must error helpfully, got: ${err.getMessage}")
  }

  test("tag validation: non-retained versions and digit names refuse") {
    warehouse
    spark.sql("CREATE TABLE gtag.db.t2 (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='1')")
    spark.sql("INSERT INTO gtag.db.t2 VALUES (1, 'a')")             // v1
    spark.sql("INSERT OVERWRITE gtag.db.t2 VALUES (2, 'a')")        // v2, v1 GC'd
    val gone = intercept[Exception] {
      spark.sql("CALL gtag.system.tag('db.t2', 'late', 1)").collect()
    }
    assert(gone.getMessage.contains("not retained"))
    val digits = intercept[Exception] {
      spark.sql("CALL gtag.system.tag('db.t2', '123', 2)").collect()
    }
    assert(digits.getMessage.contains("ambiguous"))
  }
}
