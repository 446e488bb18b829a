package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A minimal transactional-table protocol over parquet — the engine's
  * answer to the reference's single-transaction MERGE
  * (`/root/reference/src/load.py:86-103`) without taking a Delta/Iceberg
  * dependency.
  *
  * Layout:
  * {{{
  *   table/
  *     _graft_version          <- current version number (the ONLY mutable file)
  *     _manifests/v<N>.json    <- version -> {partition value -> data dir}
  *     data/txn-<id>/source=X/ <- immutable parquet, one dir per (txn, partition)
  * }}}
  *
  * Writers stage changed partitions into a fresh `data/txn-<id>/` dir and
  * write manifest v(N+1) = v(N) with those partitions' dirs replaced; the
  * commit point is ONE atomic rename of the `_graft_version` pointer
  * (`Files.move` with `ATOMIC_MOVE` — rename(2) locally, also atomic on
  * HDFS; on S3 the pointer would live in a conditional-PUT object or a
  * commit service, same protocol shape). A crash anywhere before the swap
  * leaves orphan data files but the table reads exactly as the previous
  * version; a crash after the swap leaves unreferenced old dirs that the
  * next commit's best-effort GC removes. Readers never see a torn table.
  *
  * Scale notes: unchanged partitions are carried forward in the manifest
  * by reference — a one-partition revision moves one partition's bytes,
  * never the table's. Reads group partition dirs by their txn dir and use
  * `basePath` so Spark's partition discovery restores the partition
  * column and partition pruning still applies (asserted in PipelineSpec).
  */
object AtomicTable {

  /** partitions: partition value -> data dir relative to the table root. */
  final case class Manifest(version: Long, partitions: Map[String, String])

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def versionFile(root: Path): Path = root.resolve("_graft_version")
  private def manifestFile(root: Path, v: Long): Path =
    root.resolve("_manifests").resolve(s"v$v.json")

  def currentVersion(root: Path): Option[Long] =
    if (Files.exists(versionFile(root)))
      Some(Files.readString(versionFile(root)).trim.toLong)
    else None

  def manifest(root: Path): Option[Manifest] = currentVersion(root).map { v =>
    val n = mapper.readTree(Files.readString(manifestFile(root, v)))
    Manifest(n.get("version").asLong,
      n.get("partitions").fields().asScala
        .map(e => e.getKey -> e.getValue.asText).toMap)
  }

  private def writeManifest(root: Path, m: Manifest): Unit = {
    val node = mapper.createObjectNode()
    node.put("version", m.version)
    val parts = node.putObject("partitions")
    m.partitions.toSeq.sortBy(_._1).foreach { case (k, v) => parts.put(k, v) }
    Files.createDirectories(root.resolve("_manifests"))
    Files.writeString(manifestFile(root, m.version),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node))
  }

  /** Read the table at its current version (empty frame with `schema` if
    * the table has never committed). Column order follows `schema`. */
  def read(spark: SparkSession, table: String, schema: StructType): DataFrame =
    manifest(Paths.get(table)) match {
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(m) =>
        // one scan per txn dir (its basePath restores the partition column
        // from the dir names), unioned; a filter on the partition column
        // pushes through the union into each scan's PartitionFilters
        val byTxn = m.partitions.values.toSeq.sorted
          .groupBy(d => d.substring(0, d.lastIndexOf('/')))
        byTxn.toSeq.sortBy(_._1).map { case (txnDir, dirs) =>
          spark.read.option("basePath", s"$table/$txnDir")
            .parquet(dirs.map(d => s"$table/$d"): _*)
        }.reduce(_.unionByName(_)).select(schema.fieldNames.map(col): _*)
    }

  /** Atomically replace the partitions present in `rows` (values of
    * `partitionCol`), leaving all other partitions at their current data
    * dirs. `beforeCommit` is a test hook invoked after the staged data is
    * durable but before the version swap — throwing there simulates a
    * crash at the worst moment and must leave the table unchanged. */
  def replacePartitions(spark: SparkSession, table: String, rows: DataFrame,
      partitionCol: String, beforeCommit: () => Unit = () => ()): Manifest = {
    val root = Paths.get(table)
    val txn = s"txn-${UUID.randomUUID().toString.take(12)}"
    rows.write.partitionBy(partitionCol).parquet(root.resolve("data").resolve(txn).toString)
    val txnDir = root.resolve("data").resolve(txn)
    val written = Files.list(txnDir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith(s"$partitionCol="))
      .map { n =>
        ExternalCatalogUtils.unescapePathName(
          n.substring(partitionCol.length + 1)) -> s"data/$txn/$n"
      }.toMap
    val prev = manifest(root)
    val next = Manifest(prev.map(_.version).getOrElse(0L) + 1L,
      prev.map(_.partitions).getOrElse(Map.empty) ++ written)
    writeManifest(root, next)

    beforeCommit()

    // the commit point: one atomic rename of the version pointer
    val tmp = root.resolve(s"_version.$txn.tmp")
    Files.writeString(tmp, next.version.toString)
    Files.move(tmp, versionFile(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    gc(root, next)
    next
  }

  /** Best-effort post-commit GC: delete data dirs no manifest references…
    * conservatively, only dirs unreferenced by the CURRENT manifest that
    * also belong to no newer manifest file. Crash here leaves orphans,
    * never corruption. */
  private def gc(root: Path, current: Manifest): Unit = {
    val dataDir = root.resolve("data")
    if (!Files.isDirectory(dataDir)) return
    val referenced = current.partitions.values.toSet
    val txns = Files.list(dataDir).iterator.asScala.toList
    for (txn <- txns if Files.isDirectory(txn)) {
      val parts = Files.list(txn).iterator.asScala.toList
      for (p <- parts if Files.isDirectory(p)) {
        val rel = s"data/${txn.getFileName}/${p.getFileName}"
        if (!referenced.contains(rel)) deleteRecursively(p)
      }
      val left = Files.list(txn).iterator.asScala
        .filter(q => Files.isDirectory(q) || !q.getFileName.toString.startsWith("_"))
        .toList
      if (left.isEmpty) deleteRecursively(txn)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively) finally children.close()
    }
    Files.deleteIfExists(p)
  }
}
