package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.time.{Instant, LocalDate}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Normalize, SeriesSource, State}
import graft.model.Schemas
import graft.model.Schemas.ExtractionState

/** The 3-phase pipeline driver (O1-O3, `/root/reference/src/main.py:18-74`)
  * re-expressed Spark-first: extract is driver-side HTTP + raw-zone
  * snapshots + state commits; transform and load are ONE lazy logical plan
  * (explode → cast → union → merge-join) that only executes at the sink
  * action. Phase failures abort the run with a phase-tagged error; a
  * single bad FRED series is skipped, not fatal (O2,
  * `src/main.py:41-47`).
  */
object Pipeline {

  final case class RunReport(
      factStats: Map[String, Long],
      dimStats: Map[String, Long],
      skippedSeries: Seq[String])

  final case class Layout(stateDir: String, rawDir: String, warehouseDir: String) {
    def factPath: String = s"$warehouseDir/fact_economic_observations"
    def dimPath: String = s"$warehouseDir/dim_series"
  }

  /** Extract one FRED series: fetch (with offset pushdown), hash-compare,
    * snapshot, advance state (`src/extract.py:69-122`). Returns the raw
    * JSON whether or not it changed — transform always runs
    * (`src/extract.py:102`). */
  def extractFred(seriesId: String, source: SeriesSource, store: State.Store,
      rawDir: Path, today: LocalDate, now: Instant): String = {
    val prev = store.load("fred", seriesId)
    val json = source.fetchFred(seriesId, prev.flatMap(_.lastObservationDate))
    val obsJson = State.fredObservationsJson(json)
    val hash = State.contentHash(obsJson)
    if (!prev.exists(_.lastHash == hash)) {
      Files.createDirectories(rawDir)
      Files.writeString(rawDir.resolve(
        s"FRED_${seriesId}_${today.toString.replace('-', '_')}.json"), json)
    }
    val newest = lastObservationDate(obsJson)
    store.save(ExtractionState("fred", seriesId,
      State.advanceOffset(prev.flatMap(_.lastObservationDate), newest),
      hash, now.toString))
    json
  }

  /** Extract the BLS batch: whole-response hash, app-level status check
    * distinct from transport errors (`src/extract.py:129-175`). */
  def extractBls(seriesIds: Seq[String], source: SeriesSource, store: State.Store,
      rawDir: Path, today: LocalDate, now: Instant, startYear: Int, endYear: Int): String = {
    val json = source.fetchBls(seriesIds, startYear, endYear)
    if (!json.contains("\"REQUEST_SUCCEEDED\""))
      throw new RuntimeException(s"BLS API error: status not REQUEST_SUCCEEDED")
    val hash = State.contentHash(json)
    val prev = store.load("bls", "batch")
    if (!prev.exists(_.lastHash == hash)) {
      Files.createDirectories(rawDir)
      Files.writeString(rawDir.resolve(
        s"BLS_batch_${today.toString.replace('-', '_')}.json"), json)
    }
    store.save(ExtractionState("bls", "batch", None, hash, now.toString))
    json
  }

  private def lastObservationDate(obsJson: String): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.readTree(obsJson)
    if (arr == null || !arr.isArray || arr.size() == 0) None
    else Option(arr.get(arr.size() - 1).get("date")).map(_.asText)
  }

  /** Load phase: join-based MERGE into the transactional parquet warehouse
    * (AtomicTable), rewriting ONLY the source partitions that actually
    * changed — the R1 hash-skip idea applied at the storage layer: a
    * one-series revision must not rewrite the other sources' terabytes.
    * The commit is AtomicTable's single version-pointer rename, matching
    * the reference's one-transaction MERGE (`src/load.py:86-103`): a crash
    * mid-write leaves the table readable at the previous version (no
    * localCheckpoint needed — staged txn dirs never overwrite the files
    * the plan is reading). */
  def mergeFact(spark: SparkSession, incoming: DataFrame, factPath: String): Map[String, Long] = {
    val existing = AtomicTable.read(spark, factPath, Schemas.fact)
    val keys = Seq("series_id", "date")
    val deduped = Merge.lastWinsByKey(incoming, keys, col("value").desc_nulls_last)
    val classified = Merge.classify(deduped, existing, keys, "value")
    val stats = Merge.stats(classified)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // sources with at least one insert/update; unchanged partitions are
    // neither read again nor rewritten
    val changedSources = classified.filter(col("action") =!= "unchanged")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    if (changedSources.nonEmpty) {
      val newRows = Merge.upsert(
        existing.filter(col("source").isInCollection(changedSources)),
        deduped.filter(col("source").isInCollection(changedSources)), keys)
      AtomicTable.replacePartitions(spark, factPath, newRows, "source")
    }
    Map("inserted" -> 0L, "updated" -> 0L, "unchanged" -> 0L) ++
      stats.map { case (k, v) =>
        (k match { case "insert" => "inserted"; case "update" => "updated"; case o => o }) -> v
      }
  }

  /** Dim load: insert-if-absent, append-only (`src/load.py:108-134`). */
  def mergeDim(spark: SparkSession, incoming: DataFrame, dimPath: String): Map[String, Long] = {
    val exists = Files.exists(Paths.get(dimPath))
    val existing =
      if (exists) spark.read.parquet(dimPath)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.dim)
    val newRows = Merge.insertIfAbsent(incoming, existing, Seq("series_id")).cache()
    val inserted = newRows.count()
    if (inserted > 0) newRows.write.mode(SaveMode.Append).parquet(dimPath)
    newRows.unpersist()
    Map("inserted" -> inserted, "unchanged" -> (incoming.count() - inserted))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively) finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** Full run: extract → transform → load with the reference's failure
    * semantics (phase-tagged abort, per-series skip). */
  def run(spark: SparkSession, source: SeriesSource, layout: Layout,
      fredSeries: Seq[(String, String)], blsSeries: Seq[(String, String)],
      today: LocalDate, now: Instant,
      blsStartYear: Int = 2021): RunReport = {

    val store = State.Store(layout.stateDir)
    val rawDir = Paths.get(layout.rawDir)

    // Phase 1: extract (driver-side; BLS aborts the phase, FRED series skip)
    var skipped = List.empty[String]
    val fredJsons: Seq[(String, String, String)] =
      try {
        fredSeries.flatMap { case (name, id) =>
          try Some((id, name, extractFred(id, source, store, rawDir, today, now)))
          catch {
            case NonFatal(_) => skipped ::= id; None
          }
        }
      } catch {
        case NonFatal(e) => throw new RuntimeException("Pipeline failed during extract", e)
      }
    val blsJson =
      try extractBls(blsSeries.map(_._2), source, store, rawDir, today, now,
        blsStartYear, today.getYear)
      catch {
        case NonFatal(e) => throw new RuntimeException("Pipeline failed during extract", e)
      }

    // Phase 2: transform (lazy plan construction only)
    val (fact, dim) =
      try {
        val fredFrames = fredJsons.map { case (id, name, json) =>
          Normalize.fredObservations(Normalize.readFredJson(spark, json), id, name)
        }
        val blsFrame = Normalize.blsBatch(Normalize.readBlsJson(spark, blsJson), blsSeries)
        val fact = Transforms.combineFactTables(fredFrames :+ blsFrame)
        val dim = Transforms.buildDimSeries(spark, fredSeries, blsSeries)
        (fact, dim)
      } catch {
        case NonFatal(e) => throw new RuntimeException("Pipeline failed during transform", e)
      }

    // Phase 3: load (the only actions in the run)
    try {
      val factStats = mergeFact(spark, fact, layout.factPath)
      val dimStats = mergeDim(spark, dim, layout.dimPath)
      RunReport(factStats, dimStats, skipped.reverse)
    } catch {
      case NonFatal(e) => throw new RuntimeException("Pipeline failed during load", e)
    }
  }
}
