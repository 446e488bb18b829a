package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.etl.AtomicTable

/** Cross-PROCESS SQL writes: three OS processes (two forked Spark JVMs
  * plus this suite's session) INSERT INTO one catalog table
  * concurrently. The catalog holds no coordinating state, so this
  * composes the whole SQL write path — declared-schema resolution,
  * clustered write distribution, the staged-txn commit — with the
  * link(2) create-new version claim that linearizes processes. Every
  * INSERT must land as its own version with no rows or partitions lost:
  * the several-ingest-drivers-one-table deployment reality. */
class CrossProcessSqlSpec extends SparkSuite {
  import spark.implicits._

  private val perWriter = 5

  private def forkChild(warehouse: String, tag: String): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    new ProcessBuilder(javaBin, "-Xmx2g", "-cp", cp,
      "graft.tools.SqlInsertRaceChild",
      warehouse, "rcat", tag, perWriter.toString)
      .redirectErrorStream(true)
      .start()
  }

  test("three processes INSERT INTO one catalog table: all commits land") {
    val warehouse = Files.createTempDirectory("graft-sqlrace").toString
    spark.conf.set("spark.sql.catalog.rcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rcat.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rcat.db")
    spark.sql("CREATE TABLE rcat.db.race (id BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='1000')")

    val children = Seq(forkChild(warehouse, "a"), forkChild(warehouse, "b"))
    var parentFailure: Option[Throwable] = None
    val parent = new Thread(() => {
      try for (k <- 1 to perWriter) {
        spark.sql(s"INSERT INTO rcat.db.race VALUES ($k, 'c_$k'), " +
          s"(${1000 + k}, 'hot')")
        ()
      } catch { case t: Throwable => parentFailure = Some(t) }
    })
    parent.start()
    children.foreach { c =>
      val out = new String(c.getInputStream.readAllBytes(), "UTF-8")
      assert(c.waitFor() === 0, s"child writer failed:\n${out.takeRight(4000)}")
    }
    parent.join(180000)
    parentFailure.foreach(t => fail(s"parent writer failed: $t", t))

    val total = 3 * perWriter
    assert(spark.sql("SELECT count(*) FROM rcat.db.race").as[Long].head()
      === 2L * total, "no INSERT may be lost")
    val got = spark.sql("SELECT p FROM rcat.db.race").as[String].collect().toSet
    val expected = (1 to perWriter)
      .flatMap(k => Seq(s"a_$k", s"b_$k", s"c_$k")).toSet + "hot"
    assert(got === expected,
      "a lost read-modify-write would drop another process's partitions")
    // the SHARED partition holds every process's appends: the old
    // replace-on-insert semantics would have kept only the last writer's
    assert(spark.sql("SELECT count(*) FROM rcat.db.race WHERE p = 'hot'")
      .as[Long].head() === total.toLong,
      "concurrent INSERTs into one partition must all survive")
    assert(AtomicTable.manifest(Paths.get(warehouse, "db", "race")).get
      .partitions("hot").size === total,
      "each INSERT appended its own dir to the hot partition's list")
    // every INSERT claimed its own version — the commit log shows all 15
    val root = Paths.get(warehouse, "db", "race")
    assert(AtomicTable.currentVersion(root) === Some(total.toLong))
    assert(AtomicTable.history(root).size === total)
  }
}
