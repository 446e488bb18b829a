package graft.etl

import java.sql.Date

import graft.SparkSuite
import graft.model.SeriesRegistry

class TransformsSpec extends SparkSuite {
  import spark.implicits._

  test("buildDimSeries yields 14 rows, FRED before BLS, fixed columns") {
    val dim = Transforms.buildDimSeries(spark,
      SeriesRegistry.fredSeries, SeriesRegistry.blsSeries)
    assert(dim.columns.toSeq === Seq("series_id", "series_name", "source"))
    val rows = dim.collect()
    assert(rows.length === 14)
    assert(rows.take(9).forall(_.getString(2) == "FRED"))
    assert(rows.drop(9).forall(_.getString(2) == "BLS"))
    assert(rows.map(_.getString(0)).distinct.length === 14)
  }

  test("buildDimSeries with empty input keeps explicit columns") {
    val dim = Transforms.buildDimSeries(spark, Seq(), Seq())
    assert(dim.columns.toSeq === Seq("series_id", "series_name", "source"))
    assert(dim.count() === 0)
  }

  test("combineFactTables unions (incl. empty frame) and sorts oldest-first") {
    def f(rows: Seq[(String, String, String, Option[Double], String)]) =
      rows.map { case (id, nm, d, v, src) => (id, nm, Date.valueOf(d), v, src) }
        .toDF("series_id", "series_name", "date", "value", "source")
    val a = f(Seq(("A", "A", "2024-03-01", Some(1.0), "FRED")))
    val b = f(Seq(("B", "B", "2024-01-01", Some(2.0), "BLS"),
      ("A", "A", "2024-01-01", Some(3.0), "FRED")))
    val empty = a.limit(0)
    val out = Transforms.combineFactTables(Seq(a, b, empty)).collect()
    assert(out.length === 3)
    assert(out.map(r => (r.getDate(2).toString, r.getString(0))).toSeq ===
      Seq(("2024-01-01", "A"), ("2024-01-01", "B"), ("2024-03-01", "A")))
  }
}
