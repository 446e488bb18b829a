package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/** Raw-payload sources behind a trait so the offline harness and tests
  * substitute file-backed payloads for the live REST APIs
  * (`/root/reference/src/extract.py:69-175`). The fetch fan-out is
  * driver-side (9 FRED GETs + 1 BLS batch POST per run — the BLS batch
  * coalesces 5 series into one request, `src/extract.py:139-150`); data
  * only becomes distributed once the JSON lands in the raw zone.
  */
trait SeriesSource {
  /** One FRED series; `observationStart` pushes the incremental offset
    * down to the API (R2 — `src/extract.py:86-87`). */
  def fetchFred(seriesId: String, observationStart: Option[String]): String

  /** One batch request for all BLS series (year range fixed by caller). */
  def fetchBls(seriesIds: Seq[String], startYear: Int, endYear: Int): String
}

/** Live REST source (FRED GET per series, BLS batch POST), with R3 retry
  * on transport errors. Requires network + API keys; the harness never
  * exercises this path — it exists for production use. */
final class HttpSeriesSource(
    fredApiKey: String,
    blsApiKey: Option[String],
    fredBase: String = "https://api.stlouisfed.org/fred/series/observations",
    blsBase: String = "https://api.bls.gov/publicAPI/v2/timeseries/data/")
  extends SeriesSource {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  private def isTransport(e: Throwable): Boolean =
    e.isInstanceOf[java.io.IOException]

  override def fetchFred(seriesId: String, observationStart: Option[String]): String =
    State.retry(retryOn = isTransport) {
      val startParam = observationStart.map(d => s"&observation_start=$d").getOrElse("")
      val uri = URI.create(
        s"$fredBase?series_id=$seriesId&api_key=$fredApiKey&file_type=json$startParam")
      val resp = client.send(HttpRequest.newBuilder(uri).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"FRED HTTP ${resp.statusCode()}")
      resp.body()
    }

  override def fetchBls(seriesIds: Seq[String], startYear: Int, endYear: Int): String =
    State.retry(retryOn = isTransport) {
      val ids = seriesIds.map(id => s""""$id"""").mkString("[", ",", "]")
      val key = blsApiKey.map(k => s""","registrationkey":"$k"""").getOrElse("")
      val payload =
        s"""{"seriesid":$ids,"startyear":"$startYear","endyear":"$endYear"$key}"""
      val req = HttpRequest.newBuilder(URI.create(blsBase))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"BLS HTTP ${resp.statusCode()}")
      resp.body()
    }
}

/** Offline source reading canned payloads — `fred_{id}.json` and
  * `bls.json` under `dir`. Used by tests and the offline harness. */
final class FileSeriesSource(dir: Path) extends SeriesSource {
  override def fetchFred(seriesId: String, observationStart: Option[String]): String =
    Files.readString(dir.resolve(s"fred_$seriesId.json"))

  override def fetchBls(seriesIds: Seq[String], startYear: Int, endYear: Int): String =
    Files.readString(dir.resolve("bls.json"))
}
