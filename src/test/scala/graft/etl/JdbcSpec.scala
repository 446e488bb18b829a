package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** JDBC warehouse edge round-trips against embedded Derby — the Spark
  * analog of the reference's SQLite-backed load tests
  * (`/root/reference/tests/test_load.py` over `tests/conftest.py:121-137`). */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")

  private def freshUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def factDf = Seq(
    ("UNRATE", "Unemployment Rate", "2024-01-01", Some(3.7), "FRED"),
    ("UNRATE", "Unemployment Rate", "2024-02-01", None, "FRED"),
    ("CPIAUCSL", "Consumer Price Index", "2024-01-01", Some(308.4), "BLS"))
    .toDF("series_id", "series_name", "date", "value", "source")
    .withColumn("date", to_date($"date"))

  test("fact merge round-trips: insert, idempotent rerun, revision update") {
    val url = freshUrl()
    val r1 = Jdbc.mergeFact(spark, factDf, url)
    assert(r1 === Map("inserted" -> 3L, "updated" -> 0L, "unchanged" -> 0L))

    // scan returns engine types: real DateType, null preserved
    val back = Jdbc.scanFact(spark, url)
    assert(back.schema("date").dataType === org.apache.spark.sql.types.DateType)
    assert(back.count() === 3)
    assert(back.filter("series_id = 'UNRATE' AND value IS NULL").count() === 1)

    // rerun of the same batch: fully unchanged (ε-equality, null==null)
    val r2 = Jdbc.mergeFact(spark, factDf, url)
    assert(r2 === Map("inserted" -> 0L, "updated" -> 0L, "unchanged" -> 3L))

    // one revised value: exactly one UPDATE, other rows untouched
    val revised = factDf.withColumn("value",
      when($"series_id" === "UNRATE" && $"date" === to_date(lit("2024-01-01")), 3.9)
        .otherwise($"value"))
    val r3 = Jdbc.mergeFact(spark, revised, url)
    assert(r3 === Map("inserted" -> 0L, "updated" -> 1L, "unchanged" -> 2L))
    val row = Jdbc.scanFact(spark, url)
      .filter("series_id = 'UNRATE' AND date = DATE'2024-01-01'").collect().head
    assert(row.getDouble(row.fieldIndex("value")) === 3.9)
  }

  test("date crosses the JDBC edge as ISO-8601 text (L2)") {
    val url = freshUrl()
    Jdbc.mergeFact(spark, factDf, url)
    // read WITHOUT the engine's date conversion: the stored column is text
    val raw = spark.read.jdbc(url, Jdbc.FactTable, Jdbc.props(url))
    assert(raw.schema("date").dataType === org.apache.spark.sql.types.StringType)
    assert(raw.select("date").as[String].collect().toSet ===
      Set("2024-01-01", "2024-02-01"))
  }

  test("dim merge is insert-if-absent; existing rows never overwritten") {
    val url = freshUrl()
    val dim = Seq(("UNRATE", "Unemployment Rate", "FRED"),
      ("CPIAUCSL", "Consumer Price Index", "BLS"))
      .toDF("series_id", "series_name", "source")
    assert(Jdbc.mergeDim(spark, dim, url) ===
      Map("inserted" -> 2L, "unchanged" -> 0L))

    // renamed series must NOT overwrite (reference: metadata is stable)
    val renamed = dim.withColumn("series_name", lit("RENAMED"))
      .unionByName(Seq(("NEW1", "Brand New", "FRED"))
        .toDF("series_id", "series_name", "source"))
    assert(Jdbc.mergeDim(spark, renamed, url) ===
      Map("inserted" -> 1L, "unchanged" -> 2L))
    val back = Jdbc.scanDim(spark, url).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back("UNRATE") === "Unemployment Rate")
    assert(back("NEW1") === "Brand New")
  }

  // ---- dialect resolution (the DATABASE_URL analog,
  //      /root/reference/src/config.py:16-19) ----

  test("dialect resolves from the JDBC url") {
    assert(Jdbc.dialectOf("jdbc:derby:/tmp/x;create=true") === Jdbc.Derby)
    assert(Jdbc.dialectOf("jdbc:postgresql://host:5432/warehouse") === Jdbc.Postgres)
    intercept[IllegalArgumentException](Jdbc.dialectOf("jdbc:mysql://x/y"))
  }

  test("postgres DDL uses IF NOT EXISTS and DOUBLE PRECISION") {
    val fact = Jdbc.factDdl(Jdbc.Postgres)
    assert(fact.startsWith(s"CREATE TABLE IF NOT EXISTS ${Jdbc.FactTable}"))
    assert(fact.contains("\"value\" DOUBLE PRECISION"))
    assert(fact.contains("PRIMARY KEY (\"series_id\", \"date\")"))
    assert(Jdbc.dimDdl(Jdbc.Postgres)
      .startsWith(s"CREATE TABLE IF NOT EXISTS ${Jdbc.DimTable}"))
    assert(Jdbc.props("jdbc:postgresql://h/w")
      .getProperty("driver") === "org.postgresql.Driver")
  }

  // ---- Postgres-dialect EXECUTION via the test-scoped org.postgresql
  //      Driver double (PgFake: real JDBC protocol over embedded Derby,
  //      pg-only syntax translated, statements logged pre-rewrite) ----

  private val pgCounter = new java.util.concurrent.atomic.AtomicInteger()
  private def freshPgUrl(): String =
    s"jdbc:postgresql://localhost:5432/graft_test_${pgCounter.incrementAndGet()}"

  test("postgres dialect executes the full fact round trip") {
    val url = freshPgUrl()
    graft.testutil.PgFake.executed.clear()

    val r1 = Jdbc.mergeFact(spark, factDf, url)
    assert(r1 === Map("inserted" -> 3L, "updated" -> 0L, "unchanged" -> 0L))
    // rerun idempotent — including the IF NOT EXISTS DDL second time around
    val r2 = Jdbc.mergeFact(spark, factDf, url)
    assert(r2 === Map("inserted" -> 0L, "updated" -> 0L, "unchanged" -> 3L))
    // one revision drives the batched-prepared-UPDATE leg
    val revised = factDf.withColumn("value",
      when($"series_id" === "UNRATE" && $"date" === to_date(lit("2024-01-01")), 4.1)
        .otherwise($"value"))
    assert(Jdbc.mergeFact(spark, revised, url) ===
      Map("inserted" -> 0L, "updated" -> 1L, "unchanged" -> 2L))

    val back = Jdbc.scanFact(spark, url)
    assert(back.schema("date").dataType === org.apache.spark.sql.types.DateType)
    assert(back.count() === 3)
    assert(back.filter("series_id = 'UNRATE' AND value IS NULL").count() === 1)
    assert(back.filter("value = 4.1").count() === 1)

    // the EXECUTED statements were the Postgres-dialect text: idempotent
    // DDL with IF NOT EXISTS + DOUBLE PRECISION, and the parameterized
    // UPDATE — not some pre-rendered Derby variant
    val log = graft.testutil.PgFake.executed.toArray.map(_.toString)
    assert(log.exists(s => s.contains("CREATE TABLE IF NOT EXISTS") &&
      s.contains("DOUBLE PRECISION")))
    assert(log.exists(_.startsWith(s"UPDATE ${Jdbc.FactTable}")))
  }

  test("postgres dialect executes the dim insert-if-absent path") {
    val url = freshPgUrl()
    val dim = Seq(("UNRATE", "Unemployment Rate", "FRED"))
      .toDF("series_id", "series_name", "source")
    assert(Jdbc.mergeDim(spark, dim, url) === Map("inserted" -> 1L, "unchanged" -> 0L))
    assert(Jdbc.mergeDim(spark, dim, url) === Map("inserted" -> 0L, "unchanged" -> 1L))
    assert(Jdbc.scanDim(spark, url).count() === 1)
  }

  test("derby DDL is a bare CREATE (idempotence via SQLState)") {
    val fact = Jdbc.factDdl(Jdbc.Derby)
    assert(fact.startsWith(s"CREATE TABLE ${Jdbc.FactTable}"))
    assert(!fact.contains("IF NOT EXISTS"))
    assert(fact.contains("\"value\" DOUBLE,"))
    // and the execution path is idempotent end-to-end:
    val url = freshUrl()
    Jdbc.ensureTables(url)
    Jdbc.ensureTables(url) // second create must be swallowed, not thrown
  }
}
