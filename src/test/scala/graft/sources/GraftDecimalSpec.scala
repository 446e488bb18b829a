package graft.sources

import java.nio.file.Files

import graft.SparkSuite

/** DECIMAL columns end-to-end through the graft DSv2 format: all three
  * parquet storage widths (unscaled INT32 for p<=9, INT64 for p<=18,
  * big-endian FIXED_LEN_BYTE_ARRAY above), negative values' sign
  * extension, schema inference from footers, exact filtering, and
  * decimal zone-map stats driving partition pruning. */
class GraftDecimalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-dec").toString
    spark.conf.set("spark.sql.catalog.gdec", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdec.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdec.db")
    w
  }

  test("all three decimal storage widths round-trip, negatives included") {
    warehouse
    spark.sql("CREATE TABLE gdec.db.d1 (id BIGINT, small DECIMAL(9,2), " +
      "mid DECIMAL(18,4), wide DECIMAL(28,6), p STRING) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gdec.db.d1 VALUES " +
      "(1, 12.34, 123456.7891, 1234567890123456789012.345678, 'a'), " +
      "(2, -99.99, -0.0001, -1234567890123456789012.345678, 'a'), " +
      "(3, 0.01, CAST(NULL AS DECIMAL(18,4)), 0.000001, 'b')")
    val rows = spark.sql(
      "SELECT id, CAST(small AS STRING), CAST(mid AS STRING), " +
        "CAST(wide AS STRING) FROM gdec.db.d1 ORDER BY id")
      .as[(Long, String, String, String)].collect().toSeq
    assert(rows === Seq(
      (1L, "12.34", "123456.7891", "1234567890123456789012.345678"),
      (2L, "-99.99", "-0.0001", "-1234567890123456789012.345678"),
      (3L, "0.01", null, "0.000001")))
    // exact decimal filtering through the scan
    assert(spark.sql(
      "SELECT id FROM gdec.db.d1 WHERE small = CAST(-99.99 AS DECIMAL(9,2))")
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("decimal zone-map stats prune partitions and files") {
    warehouse
    spark.sql("CREATE TABLE gdec.db.d2 (id BIGINT, amt DECIMAL(12,2), " +
      "p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('stats_columns'='amt')")
    spark.sql("INSERT INTO gdec.db.d2 VALUES " +
      "(1, 10.00, 'a'), (2, 20.00, 'a'), (3, 1000.00, 'b'), (4, 2000.00, 'b')")
    // bounds recorded in the manifest, in cast-to-string form
    val dir = java.nio.file.Paths.get(warehouse, "db", "d2")
    val m = graft.etl.AtomicTable.manifest(dir).get
    assert(m.stats("a").mins("amt") === "10.00" &&
      m.stats("a").maxs("amt") === "20.00")
    assert(m.stats("b").mins("amt") === "1000.00")
    // a range read admits only the partition whose bounds overlap —
    // numeric decimal compare, not text ("999.00" > "1000.00" as text)
    val read = spark.sql(
      "SELECT id FROM gdec.db.d2 WHERE amt >= CAST(999 AS DECIMAL(12,2))")
    assert(read.as[Long].collect().toSet === Set(3L, 4L))
    // decimal-typed aggregate pushdown bounds: min/max answer from the
    // manifest's decimal zone maps when no filter is pushed
    assert(spark.sql("SELECT CAST(min(amt) AS STRING), " +
      "CAST(max(amt) AS STRING) FROM gdec.db.d2").collect()(0) ===
      org.apache.spark.sql.Row("10.00", "2000.00"))
  }

  test("schema inference reads decimal footers (no _table.json)") {
    warehouse
    // stage a raw AtomicTable (no declared meta) holding decimals, then
    // load it through the catalog — the footer-inferred schema must
    // carry DecimalType, not fail on FIXED_LEN_BYTE_ARRAY
    val src = Seq((1L, "123456789012345678901.55", "a"),
      (2L, "-1.55", "b"))
      .toDF("id", "amt", "p")
      .selectExpr("id", "CAST(amt AS DECIMAL(23,2)) AS amt", "p")
    graft.etl.AtomicTable.replacePartitions(spark,
      java.nio.file.Paths.get(warehouse, "db", "d3").toString, src, "p")
    val got = spark.sql("SELECT id, CAST(amt AS STRING) FROM gdec.db.d3 " +
      "ORDER BY id").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "123456789012345678901.55"), (2L, "-1.55")))
  }
}
