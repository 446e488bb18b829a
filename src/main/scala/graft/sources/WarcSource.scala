package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `spark.read.format("warc").load(path)` — a DataSource V2 scan over
  * WARC archives (plain `.warc` and member-concatenated `.warc.gz`, the
  * Common Crawl layout). Byte-level framing lives in [[WarcIO]]; this
  * file is the Spark planning surface.
  *
  * Scale decisions, stated:
  *  - **One input partition per archive file.** A gzip member stream has
  *    no random access without an external index, and a plain WARC can
  *    only be split by scanning for a record boundary — while Common
  *    Crawl ships ~90k files of ~1 GB per snapshot, so file-granular
  *    parallelism already saturates any executor fleet. (The standard
  *    `cdx` index would enable sub-file splits; file-per-task is what
  *    production CC readers do.)
  *  - **Column pruning reaches the byte level.** The scan implements
  *    `SupportsPushDownRequiredColumns`; when `payload` is not selected,
  *    the parser discards payload bytes buffer-by-buffer instead of
  *    materializing them ([[WarcIO.readRecords]] `keepPayload=false`) —
  *    a headers-only survey of a 100 TB crawl allocates O(64 KB) per
  *    task, not O(record).
  *  - **Hadoop FileSystem API throughout**, so `load("s3a://…")` works
  *    unchanged on an object store; the driver lists once, executors
  *    each open exactly their own file.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

object WarcSource {
  /** The fixed relation schema: the spec'd header fields typed, the full
    * header block as a map (extension headers stay reachable), the raw
    * payload, and file provenance. */
  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", TimestampType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("headers", MapType(StringType, StringType)),
    StructField("payload", BinaryType),
    StructField("source_file", StringType)))

  private[sources] def listArchives(conf: Configuration, root: String): Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else Seq(st)
    walk(fs.getFileStatus(p))
      .filter { st =>
        val n = st.getPath.getName
        !n.startsWith(".") && !n.startsWith("_") &&
          (n.endsWith(".warc") || n.endsWith(".warc.gz"))
      }
      .map(_.getPath.toString).sorted
  }
}

private[sources] class WarcTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"warc(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(options.asScala.toMap ++ properties)
}

private[sources] class WarcScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new WarcScan(options, required)
}

private[sources] class WarcScan(options: Map[String, String],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(path=${options.getOrElse("path", "?")}, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("warc source requires a path"))
    WarcSource.listArchives(spark.sessionState.newHadoopConf(), path)
      .map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    new WarcReaderFactory(required,
      new SerializableConfiguration(spark.sessionState.newHadoopConf()))
  }
}

private[sources] final case class WarcInputPartition(file: String)
    extends InputPartition

private[sources] class WarcReaderFactory(required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].file, required, conf.value)
}

private[sources] class WarcPartitionReader(file: String,
    required: StructType, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val needPayload = required.fieldNames.contains("payload")
  private val fieldIdx: Array[Int] =
    required.fieldNames.map(WarcSource.schema.fieldIndex)

  private val stream = {
    val p = new Path(file)
    p.getFileSystem(conf).open(p)
  }
  private val records = WarcIO.readRecords(stream, gz = file.endsWith(".gz"),
    keepPayload = needPayload, source = file)
  private var current: WarcIO.WarcRecord = null

  override def next(): Boolean = {
    if (records.hasNext) { current = records.next(); true } else false
  }

  override def get(): InternalRow = {
    val r = current
    val row = new GenericInternalRow(fieldIdx.length)
    var i = 0
    while (i < fieldIdx.length) {
      row.update(i, fieldIdx(i) match {
        case 0 => UTF8String.fromString(r.warcType)
        case 1 => UTF8String.fromString(r.recordId)
        case 2 => UTF8String.fromString(r.targetUri)
        case 3 => parseDateMicros(r.warcDate)
        case 4 => UTF8String.fromString(r.contentType)
        case 5 => java.lang.Long.valueOf(r.contentLength)
        case 6 =>
          val ks = r.headers.keys.toArray.sorted
          ArrayBasedMapData(
            ks.map(k => UTF8String.fromString(k): Any),
            ks.map(k => UTF8String.fromString(r.headers(k)): Any))
        case 7 => r.payload
        case 8 => UTF8String.fromString(file)
      })
      i += 1
    }
    row
  }

  /** WARC-Date is ISO-8601 UTC; null (not a crash) on a malformed value —
    * the raw string stays reachable in `headers`. */
  private def parseDateMicros(s: String): java.lang.Long =
    try {
      val inst = java.time.Instant.parse(s)
      java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    } catch { case _: Throwable => null }

  override def close(): Unit = { try stream.close() catch { case _: Throwable => } }
}
