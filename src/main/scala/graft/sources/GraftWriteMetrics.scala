package graft.sources

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric}

/** Task-side DSv2 custom metrics for the graft WRITE path — the
  * observability twin of the scan metrics: the Spark UI shows how many
  * rows/files each write produced and how many bloom sidecar builders
  * accumulated alongside them (one builder per (partition value, bloom
  * column) per task = one sidecar file at task commit). Top-level
  * zero-arg classes for the same reason as the scan metrics: the SQL
  * UI listener re-instantiates metric classes reflectively. */
private[sources] object GraftWriteMetrics {
  val RowsWritten = "graftRowsWritten"
  val FilesWritten = "graftFilesWritten"
  val BloomBuilders = "graftBloomSidecars"

  def all: Array[CustomMetric] = Array(
    new GraftRowsWrittenMetric, new GraftFilesWrittenMetric,
    new GraftBloomSidecarsMetric)
}

private[sources] class GraftRowsWrittenMetric extends CustomSumMetric {
  override def name(): String = GraftWriteMetrics.RowsWritten
  override def description(): String = "rows written (graft)"
}
private[sources] class GraftFilesWrittenMetric extends CustomSumMetric {
  override def name(): String = GraftWriteMetrics.FilesWritten
  override def description(): String = "data files written (graft)"
}
private[sources] class GraftBloomSidecarsMetric extends CustomSumMetric {
  override def name(): String = GraftWriteMetrics.BloomBuilders
  override def description(): String = "bloom sidecars written (graft)"
}
