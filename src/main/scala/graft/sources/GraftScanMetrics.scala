package graft.sources

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** Driver-side DSv2 custom metrics for the graft scan: every pruning
  * tier reports what it skipped, per granularity and per mechanism, so
  * the SQL UI shows WHY a 100 TB table planned as three files — the
  * observability twin of the spec-pinned skipping contracts. All sums:
  * Spark aggregates one value per scan node (driver metrics arrive as a
  * single synthetic task update).
  *
  * Naming: `partitions` are table partitions (manifest keys), `files`
  * are committed data files. "static" = decided from pushed filters
  * against manifest metadata at plan time; "runtime" = decided from
  * join-side values delivered through SupportsRuntimeV2Filtering (DPP
  * and runtime zone-map/bloom skipping).
  */
private[sources] object GraftScanMetrics {
  private class M(n: String, d: String) extends CustomSumMetric {
    override def name(): String = n
    override def description(): String = d
  }

  val PartitionsPlanned = "partitionsPlanned"
  val PartitionsSkippedStatic = "partitionsSkippedStatic"
  val PartitionsSkippedRuntime = "partitionsSkippedRuntime"
  val FilesPlanned = "filesPlanned"
  val FilesSkippedPartition = "filesSkippedPartition"
  val FilesSkippedZoneMap = "filesSkippedZoneMap"
  val FilesSkippedBloom = "filesSkippedBloom"
  val FilesSkippedRuntime = "filesSkippedRuntime"
  val FilesSkippedLimit = "filesSkippedLimit"
  val BytesPlanned = "bytesPlanned"

  /** The scan's advertised metric set (order is display order). */
  def all: Array[CustomMetric] = Array(
    new M(PartitionsPlanned, "partitions planned"),
    new M(PartitionsSkippedStatic, "partitions skipped (key/zone-map)"),
    new M(PartitionsSkippedRuntime, "partitions skipped (DPP/runtime)"),
    new M(FilesPlanned, "files planned"),
    new M(FilesSkippedPartition, "files inside skipped partitions"),
    new M(FilesSkippedZoneMap, "files skipped (zone map)"),
    new M(FilesSkippedBloom, "files skipped (bloom)"),
    new M(FilesSkippedRuntime, "files skipped (runtime zone-map/bloom)"),
    new M(FilesSkippedLimit, "files skipped (LIMIT/TopN)"),
    new M(BytesPlanned, "bytes planned (manifest estimate)"))

  final case class Value(metricName: String, metricValue: Long)
      extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = metricValue
  }
}
