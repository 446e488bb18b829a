package graft.ingest

import graft.SparkSuite

/** Port of the reference's transform tests
  * (`/root/reference/tests/test_transform.py`) against the Spark
  * normalizers. */
class NormalizeSpec extends SparkSuite {

  private def fred = Normalize.fredObservations(
    Normalize.readFredJson(spark, Fixtures.fredPayload), "UNRATE", "UNRATE")

  private def bls = Normalize.blsBatch(
    Normalize.readBlsJson(spark, Fixtures.blsPayload), Fixtures.blsSeriesMap)

  test("FRED: exact column contract and row count") {
    assert(fred.columns.toSeq === Normalize.factColumns)
    assert(fred.count() === 3)
  }

  test("FRED: '.' missing marker becomes null; numbers parse as double") {
    val rows = fred.orderBy("date").collect()
    assert(rows(0).getDouble(3) === 5.0)
    assert(rows(1).isNullAt(3))
    assert(rows(2).getDouble(3) === 5.2)
  }

  test("FRED: response metadata fields do not survive normalization") {
    assert(!fred.columns.exists(_.startsWith("realtime")))
  }

  test("FRED: literal stamping of id/name/source") {
    val r = fred.collect().head
    assert(r.getString(0) === "UNRATE" && r.getString(1) === "UNRATE" &&
      r.getString(4) === "FRED")
  }

  test("BLS: two series x three observations explode to 6 rows") {
    assert(bls.columns.toSeq === Normalize.factColumns)
    assert(bls.count() === 6)
  }

  test("BLS: date synthesized first-of-month from year+period") {
    val dates = bls.orderBy("date", "series_id").collect().map(_.getDate(2).toString)
    assert(dates === Array("2024-01-01", "2024-01-01", "2024-02-01",
      "2024-02-01", "2024-03-01", "2024-03-01"))
  }

  test("BLS: most-recent-first input comes out oldest-first") {
    val first = bls.collect().head
    assert(first.getDate(2).toString === "2024-01-01")
  }

  test("BLS: reverse-map lookup with fallback to id for unknown series") {
    val names = bls.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names("CUUR0000SA0") === "CPI_URBAN")
    assert(names("CES0500000003") === "AVG_WAGES")
    val unknown = Normalize.blsBatch(
      Normalize.readBlsJson(spark, Fixtures.blsPayload), Seq("CPI_URBAN" -> "CUUR0000SA0"))
    val fallback = unknown.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fallback("CES0500000003") === "CES0500000003")
  }

  test("BLS: '-' missing marker becomes null") {
    val df = Normalize.blsBatch(
      Normalize.readBlsJson(spark, Fixtures.blsMissingPayload), Fixtures.blsSeriesMap)
    assert(df.collect().head.isNullAt(3))
  }
}
