package graft.ingest

/** The reference's edge-case payloads, transcribed verbatim from
  * `/root/reference/tests/conftest.py` (via FIXTURES.md §A) — these are
  * the behavioral spec for the normalizers. */
object Fixtures {

  /** A1: realistic FRED response — extra metadata that must not survive,
    * "." missing marker that must become null. */
  val fredPayload: String =
    """{
      |  "realtime_start": "2024-01-01", "realtime_end": "9999-12-31",
      |  "units": "Percent", "output_type": 1, "count": 3, "offset": 0, "limit": 100000,
      |  "observations": [
      |    {"date": "2024-01-01", "value": "5.0", "realtime_start": "2024-01-01", "realtime_end": "9999-12-31"},
      |    {"date": "2024-02-01", "value": ".",   "realtime_start": "2024-02-01", "realtime_end": "9999-12-31"},
      |    {"date": "2024-03-01", "value": "5.2", "realtime_start": "2024-03-01", "realtime_end": "9999-12-31"}
      |  ]
      |}""".stripMargin

  /** A2: BLS batch — two series, data most-recent-first. */
  val blsPayload: String =
    """{
      |  "status": "REQUEST_SUCCEEDED", "responseTime": 150, "message": [],
      |  "Results": { "series": [
      |    { "seriesID": "CUUR0000SA0", "data": [
      |        {"year": "2024", "period": "M03", "periodName": "March",    "value": "314.2", "footnotes": [{}]},
      |        {"year": "2024", "period": "M02", "periodName": "February", "value": "313.5", "footnotes": [{}]},
      |        {"year": "2024", "period": "M01", "periodName": "January",  "value": "312.0", "footnotes": [{}]} ] },
      |    { "seriesID": "CES0500000003", "data": [
      |        {"year": "2024", "period": "M03", "periodName": "March",    "value": "34.85", "footnotes": [{}]},
      |        {"year": "2024", "period": "M02", "periodName": "February", "value": "34.75", "footnotes": [{}]},
      |        {"year": "2024", "period": "M01", "periodName": "January",  "value": "34.55", "footnotes": [{}]} ] }
      |  ] }
      |}""".stripMargin

  /** A2 variant: "-" missing marker. */
  val blsMissingPayload: String =
    """{
      |  "status": "REQUEST_SUCCEEDED",
      |  "Results": { "series": [
      |    { "seriesID": "CUUR0000SA0", "data": [
      |        {"year": "2024", "period": "M01", "periodName": "January", "value": "-", "footnotes": [{}]} ] }
      |  ] }
      |}""".stripMargin

  val blsSeriesMap: Seq[(String, String)] = Seq(
    "CPI_URBAN" -> "CUUR0000SA0",
    "AVG_WAGES" -> "CES0500000003")
}
