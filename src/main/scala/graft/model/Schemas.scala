package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas of the economic-data star schema and of the raw API
  * payloads the ingest layer normalizes.
  *
  * Column contract and nullability derive from the reference:
  * fact/dim shape `/root/reference/src/transform.py:19-30,73-94`, DDL
  * `/root/reference/src/load.py:5-24`; raw payload shapes from the
  * reference's own fixtures `/root/reference/tests/conftest.py:56-114`.
  *
  * Dates are civil dates (`DateType`, session TZ pinned UTC) — the reference
  * stores ISO-8601 strings in SQL (`src/load.py:38-39`); we keep a real date
  * type end-to-end and only format at a text/JDBC edge. Missing numeric
  * values are SQL NULL (never Double.NaN) — see SURVEY.md §7.4.
  */
object Schemas {

  /** fact_economic_observations — PK (series_id, date), advisory in Spark;
    * enforced by the merge join keys (graft.etl.Merge). */
  val fact: StructType = StructType(Seq(
    StructField("series_id", StringType, nullable = false),
    StructField("series_name", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("source", StringType, nullable = false)))

  /** dim_series — PK series_id; one row per configured series. */
  val dim: StructType = StructType(Seq(
    StructField("series_id", StringType, nullable = false),
    StructField("series_name", StringType, nullable = false),
    StructField("source", StringType, nullable = false)))

  /** FRED `series/observations` response (fields we read; extra response
    * metadata is dropped by schema-on-read — Catalyst never materializes
    * unrequested fields). */
  val fredResponse: StructType = StructType(Seq(
    StructField("observations", ArrayType(StructType(Seq(
      StructField("date", StringType),
      StructField("value", StringType),
      StructField("realtime_start", StringType),
      StructField("realtime_end", StringType)))))))

  /** BLS v2 timeseries batch response. */
  val blsResponse: StructType = {
    val dataItem = StructType(Seq(
      StructField("year", StringType),
      StructField("period", StringType),
      StructField("periodName", StringType),
      StructField("value", StringType),
      StructField("footnotes", ArrayType(MapType(StringType, StringType)))))
    val series = StructType(Seq(
      StructField("seriesID", StringType),
      StructField("data", ArrayType(dataItem))))
    StructType(Seq(
      StructField("status", StringType),
      StructField("Results", StructType(Seq(
        StructField("series", ArrayType(series)))))))
  }

  /** Per-series extraction state (offset + content hash), the batch analog of
    * a streaming checkpoint — reference `src/extract.py:115-119`. */
  case class ExtractionState(
      source: String,
      seriesId: String,
      lastObservationDate: Option[String],
      lastHash: String,
      lastUpdated: String)
}
