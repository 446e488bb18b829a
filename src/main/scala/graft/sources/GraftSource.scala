package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type => PType}
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.AtomicTable

/** `spark.read.format("graft").load(tableRoot)` — the engine's
  * [[AtomicTable]] protocol as a native DataSource V2 relation, which is
  * what makes the transactional tables reachable from PLAIN SQL
  * (`CREATE TEMPORARY VIEW t USING graft OPTIONS (path '…')`) with the
  * table's own metadata driving the scan:
  *
  *  - **Snapshot isolation for free**: the scan plans against ONE
  *    manifest read at planning time; concurrent commits land new
  *    versions that this scan simply never sees.
  *  - **Manifest pruning pushed down** ([[SupportsPushDownFilters]]):
  *    equality/IN on the partition column selects partitions by key;
  *    range/equality predicates on zone-mapped columns drop partitions
  *    whose committed [min, max] cannot match — all from metadata,
  *    before a single file is listed. Every filter is also kept as a
  *    residual (Spark re-evaluates), so pruning can only skip work,
  *    never change results.
  *  - **Merge-on-read deletion vectors applied IN the reader**: each
  *    input partition carries its vector files; the reader loads the
  *    (small, by maintenance contract) deleted-key set into a hash set
  *    and drops matching rows as it streams — the Iceberg v2 scan
  *    shape, so SQL readers see the merged state with no extra join in
  *    their plan.
  *  - **Column pruning reaches the parquet reader**
  *    ([[SupportsPushDownRequiredColumns]]): the projection is pushed
  *    into the record materializer (key columns are force-included
  *    only while vectors are outstanding, then dropped from output).
  *  - **One input partition per table partition** — co-located with the
  *    layout the writers maintain (one file per partition after
  *    compaction), the right granularity for a fact table whose
  *    partitions are balance-managed by compact/z-order.
  *  - **Time travel as read options**: `.option("versionAsOf", n)` /
  *    `.option("timestampAsOf", ts)` pin the scan (and its schema,
  *    zone maps, and deletion vectors) to a retained snapshot — the
  *    Delta read-option surface, SQL-reachable through view OPTIONS;
  *    a pinned handle is read-only and refuses writes/streams.
  *
  * Scope: flat primitive schemas (long/int/double/float/boolean/
  * string/binary/date/timestamp) — the warehouse fact-table shape;
  * nested columns stay on the Scala API. The partition column surfaces
  * as STRING (the manifest's own key form). */
class GraftSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = GraftSource.rootOf(options)
    val pin = GraftSource.pinnedVersion(k => Option(options.get(k)), root)
    // a table being CREATED by a write has no manifest yet: return an
    // empty shape and let the write's own schema through
    // (ACCEPT_ANY_SCHEMA); reads of the empty root still fail loudly
    // at scan planning
    if (pin.isEmpty &&
      AtomicTable.manifest(java.nio.file.Paths.get(root)).isEmpty) StructType(Nil)
    else GraftSource.inferredSchema(new Configuration(), root, pin)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftTable(properties.asScala.toMap, schema)
  override def supportsExternalMetadata(): Boolean = false
}

object GraftSource {

  private[sources] def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
    require(p.isDefined, "graft source needs a path (the AtomicTable root)")
    p.get.stripPrefix("[\"").stripSuffix("\"]")
  }

  /** Time-travel read pin (Delta's read-option surface): `versionAsOf`
    * names a retained version directly; `timestampAsOf` resolves through
    * [[AtomicTable.versionAsOf]] (latest commit at or before the
    * instant — epoch millis, ISO-8601 instant, or `yyyy-MM-dd HH:mm:ss`
    * UTC wall time). `get` abstracts over the two option carriers Spark
    * hands a TableProvider (CaseInsensitiveStringMap vs the getTable
    * properties map), so both resolve identically. */
  private[sources] def pinnedVersion(get: String => Option[String],
      root: String): Option[Long] = {
    val byV = get("versionAsOf").map(_.trim.toLong)
    val byTs = get("timestampAsOf").map(parseTsMs)
    require(byV.isEmpty || byTs.isEmpty,
      "graft time travel takes versionAsOf OR timestampAsOf, not both")
    byV.orElse(byTs.map { ts =>
      AtomicTable.versionAsOf(java.nio.file.Paths.get(root), ts).getOrElse(
        throw new IllegalArgumentException(s"no commit of $root at or " +
          s"before timestampAsOf=$ts is inside the retention window"))
    })
  }

  private def parseTsMs(s: String): Long = {
    val t = s.trim
    if (t.forall(_.isDigit)) t.toLong
    else try java.time.Instant.parse(t).toEpochMilli
    catch {
      case _: java.time.format.DateTimeParseException =>
        java.time.LocalDateTime
          .parse(t.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
  }

  /** The manifest a read plans against: the pinned snapshot, or the head. */
  private[sources] def manifestFor(root: String, pin: Option[Long])
      : Option[AtomicTable.Manifest] = {
    val rootPath = java.nio.file.Paths.get(root)
    pin match {
      case None => AtomicTable.manifest(rootPath)
      case Some(v) =>
        try Some(AtomicTable.manifestAt(rootPath, v))
        catch {
          case _: java.nio.file.NoSuchFileException | _: java.io.FileNotFoundException =>
            throw new IllegalArgumentException(
              s"versionAsOf=$v of $root is outside the retention window")
        }
    }
  }

  private[sources] def partitionColOf(m: AtomicTable.Manifest): String = {
    val d = m.partitions.values.head
    val seg = d.substring(d.lastIndexOf('/') + 1)
    seg.substring(0, seg.indexOf('='))
  }

  /** Spark type for a flat parquet primitive (the supported scope). */
  private def sparkType(t: PType): DataType = {
    require(t.isPrimitive, s"graft source reads flat schemas; '${t.getName}' is nested")
    val p = t.asPrimitiveType()
    p.getPrimitiveTypeName match {
      case BOOLEAN => BooleanType
      case FLOAT => FloatType
      case DOUBLE => DoubleType
      case INT96 => TimestampType
      case INT32 => p.getLogicalTypeAnnotation match {
        case _: DateLogicalTypeAnnotation => DateType
        case _ => IntegerType
      }
      case INT64 => p.getLogicalTypeAnnotation match {
        case ts: TimestampLogicalTypeAnnotation =>
          if (ts.isAdjustedToUTC) TimestampType else TimestampNTZType
        case _ => LongType
      }
      case BINARY => p.getLogicalTypeAnnotation match {
        case _: StringLogicalTypeAnnotation => StringType
        case _ => BinaryType
      }
      case other => throw new IllegalArgumentException(
        s"unsupported parquet type $other for column ${t.getName}")
    }
  }

  /** Schema = first data file's parquet schema + the partition column
    * (STRING, the manifest key form) appended — of the PINNED version's
    * files when time-traveling, so a snapshot from before a schema
    * evolution reads with its own (narrower) shape. */
  private[sources] def inferredSchema(conf: Configuration, root: String,
      pin: Option[Long] = None): StructType = {
    val m = manifestFor(root, pin).getOrElse(
      throw new IllegalArgumentException(s"$root has no committed manifest"))
    require(m.partitions.nonEmpty, s"$root is empty — no partitions committed")
    val dir = new Path(s"$root/${m.partitions.values.toSeq.min}")
    val fs = dir.getFileSystem(conf)
    val first = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).head
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(first, conf))
    val msg = try footer.getFooter.getFileMetaData.getSchema finally footer.close()
    StructType(msg.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, sparkType(f), nullable = true)) :+
      StructField(partitionColOf(m), StringType, nullable = false))
  }
}

private[sources] class GraftTable(props: Map[String, String],
    schema0: StructType, validateWrites: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  private val lower = props.map { case (k, v) => k.toLowerCase -> v }
  private val root = lower.getOrElse("path",
    throw new IllegalArgumentException("graft source needs a path"))
  // resolve the time-travel pin ONCE, here: a timestampAsOf landing
  // between planning calls must not resolve to two different versions
  private val pinned: Option[Long] =
    GraftSource.pinnedVersion(k => lower.get(k.toLowerCase), root)
  override def name(): String =
    s"graft:$root${pinned.map(v => s"@v$v").getOrElse("")}"
  override def schema(): StructType = schema0
  // surfacing the partitioning is what lets Spark accept a static
  // `PARTITION (p='x')` spec on INSERT OVERWRITE
  override def partitioning(): Array[Transform] =
    partitionColNow.map(pc =>
      org.apache.spark.sql.connector.expressions.Expressions.identity(pc))
      .toArray
  override def capabilities(): java.util.Set[TableCapability] =
    if (pinned.isDefined) java.util.EnumSet.of(TableCapability.BATCH_READ)
    // catalog tables have a DECLARED schema, so writes resolve against it
    // (INSERT by position/name both work); pathwise tables accept the
    // query's own schema (new tables have no shape to validate against)
    else if (validateWrites) java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.STREAMING_WRITE)
    else java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, schema0, pinned,
      Option(options.get("startingVersion")).map(_.trim.toLong))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(pinned.isEmpty,
      "cannot write through a time-travel read (versionAsOf/timestampAsOf)")
    // catalog-declared partition column and retention ride the props, so
    // INSERT INTO a catalog table needs no per-write options
    new GraftWriteBuilder(root, info, lower.get("partition"),
      lower.get("retain").map(_.toInt), declaredStatsCols)
  }

  private def declaredStatsCols: Seq[String] =
    lower.get("stats_columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)

  private def retainN: Int = lower.get("retain").map(_.toInt).getOrElse(1)
  private def partitionColNow: Option[String] =
    lower.get("partition").orElse(
      AtomicTable.manifest(java.nio.file.Paths.get(root))
        .filter(_.partitions.nonEmpty).map(GraftSource.partitionColOf))

  /** Metadata-only SQL DELETE: when every predicate pins only the
    * partition column, `DELETE FROM t WHERE p = 'x'` (and TRUNCATE) is
    * ONE manifest commit that drops partitions — zero bytes scanned or
    * moved, the same class of operation as the Scala API's
    * dropPartitions. Anything finer falls through `canDeleteWhere =
    * false` to the row-level rewrite below. */
  override def canDeleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    pinned.isEmpty && {
      AtomicTable.manifest(java.nio.file.Paths.get(root)) match {
        case None => true // nothing committed: any delete is a no-op
        case Some(m) => partitionColNow.exists(pc =>
          GraftV2Predicates.partitionsFor(predicates, pc, m.partitions.keySet)
            .isDefined)
      }
    }

  override def deleteWhere(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    require(pinned.isEmpty, "cannot DELETE through a time-travel read")
    val rootPath = java.nio.file.Paths.get(root)
    AtomicTable.manifest(rootPath).foreach { m =>
      val pc = partitionColNow.getOrElse(return)
      val drop = GraftV2Predicates.partitionsFor(predicates, pc,
        m.partitions.keySet).getOrElse(throw new IllegalArgumentException(
        s"predicates [${predicates.mkString(", ")}] are not metadata-only " +
          s"on partition column '$pc'"))
      if (drop.nonEmpty) {
        AtomicTable.commitManifest(rootPath, Map.empty,
          dropPartitions = drop, retain = retainN,
          expectedVersion = Some(m.version), operation = "delete")
        ()
      }
    }
  }

  /** SQL DELETE/UPDATE/MERGE as partition-granular copy-on-write — see
    * [[GraftRowLevelOperation]]. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinned.isEmpty,
      s"cannot ${info.command} through a time-travel read")
    val pc = partitionColNow.getOrElse(throw new IllegalArgumentException(
      s"$root has no partition column on record — commit data or declare " +
        "the table through the catalog first"))
    () => new GraftRowLevelOperation(root, schema0, pc, retainN, info.command,
      declaredStatsCols.filter(schema0.fieldNames.contains))
  }
}

private[sources] class GraftScanBuilder(root: String, full: StructType,
    pinned: Option[Long], startingVersion: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // every filter stays a residual: pruning only skips work
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new GraftScan(root, full, required, pushed, pinned, startingVersion)
}

private[sources] class GraftScan(root: String, full: StructType,
    required: StructType, filters: Array[Filter],
    pinned: Option[Long] = None, startingVersion: Option[Long] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft:$root${pinned.map(v => s"@v$v").getOrElse("")} " +
      s"pushed=[${filters.mkString(", ")}]"

  // the scan is key-grouped by the partition column BY CONSTRUCTION
  // (one input partition per table partition, each tagged with its
  // key): reporting it lets Spark elide the shuffle for aggregations
  // and joins already clustered on the column — the storage-partitioned
  // join path (spark.sql.sources.v2.bucketing.enabled). Planned ONCE
  // and cached so the reported numPartitions and the planned partitions
  // can never disagree.
  private lazy val planned: Array[InputPartition] =
    GraftSource.manifestFor(root, pinned) match {
      case None => Array.empty
      case Some(m) => planFromManifest(m)
    }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    GraftSource.manifestFor(root, pinned)
      .filter(_.partitions.nonEmpty)
      .map { m =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity(GraftSource.partitionColOf(m))), planned.length)
          : org.apache.spark.sql.connector.read.partitioning.Partitioning
      }.getOrElse(
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0))

  override def planInputPartitions(): Array[InputPartition] = planned

  /** The scan plan for one specific manifest — split out so the
    * row-level scan can pin the manifest it planned against. A manifest
    * can be empty (every partition deleted) and still be a real table. */
  private[sources] def planFromManifest(m: AtomicTable.Manifest)
      : Array[InputPartition] = {
    if (m.partitions.isEmpty) return Array.empty
    val partitionCol = GraftSource.partitionColOf(m)
    val keyCols: Seq[String] = m.properties.get(AtomicTable.DeleteKeysProperty)
      .map(_.split(",").toSeq).getOrElse(Nil)
    val kept = prunePartitions(m, partitionCol)
    val conf = new Configuration()
    kept.toSeq.sortBy(_._1).map { case (part, dir) =>
      val dataFiles = listParquet(conf, s"$root/$dir")
      val vecFiles = m.deletes.getOrElse(part, Nil)
        .flatMap(d => listParquet(conf, s"$root/$d"))
      GraftInputPartition(part, dataFiles, vecFiles, keyCols, partitionCol)
        : InputPartition
    }.toArray
  }

  private def listParquet(conf: Configuration, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted.toSeq
  }

  /** Metadata pruning: partition-key predicates select by manifest key;
    * zone-mapped column predicates drop partitions whose [min, max]
    * cannot satisfy them. Conservative in every unknown case. */
  private def prunePartitions(m: AtomicTable.Manifest,
      partitionCol: String): Map[String, String] = {
    def admits(part: String): Boolean = filters.forall {
      case EqualTo(c, v) if c == partitionCol => part == String.valueOf(v)
      case In(c, vs) if c == partitionCol => vs.map(String.valueOf).contains(part)
      case GreaterThan(c, v) if c == partitionCol => part > String.valueOf(v)
      case GreaterThanOrEqual(c, v) if c == partitionCol => part >= String.valueOf(v)
      case LessThan(c, v) if c == partitionCol => part < String.valueOf(v)
      case LessThanOrEqual(c, v) if c == partitionCol => part <= String.valueOf(v)
      case f => zoneAdmits(m, part, f)
    }
    m.partitions.filter { case (p, _) => admits(p) }
  }

  private def zoneAdmits(m: AtomicTable.Manifest, part: String,
      f: Filter): Boolean = {
    def bounds(c: String): Option[(String, String, DataType)] =
      if (!full.fieldNames.contains(c)) None
      else m.stats.get(part).flatMap(s =>
        (s.mins.get(c), s.maxs.get(c)) match {
          case (Some(mn), Some(mx)) => Some((mn, mx, full(c).dataType))
          case _ => None
        })
    def cmp(dt: DataType, a: String, b: Any): Int =
      AtomicTable.statsOrder(dt, a, String.valueOf(b))
    f match {
      case EqualTo(c, v) => bounds(c).forall { case (mn, mx, dt) =>
        cmp(dt, mn, v) <= 0 && cmp(dt, mx, v) >= 0 }
      case GreaterThan(c, v) => bounds(c).forall { case (_, mx, dt) =>
        cmp(dt, mx, v) > 0 }
      case GreaterThanOrEqual(c, v) => bounds(c).forall { case (_, mx, dt) =>
        cmp(dt, mx, v) >= 0 }
      case LessThan(c, v) => bounds(c).forall { case (mn, _, dt) =>
        cmp(dt, mn, v) < 0 }
      case LessThanOrEqual(c, v) => bounds(c).forall { case (mn, _, dt) =>
        cmp(dt, mn, v) <= 0 }
      case In(c, vs) => bounds(c).forall { case (mn, mx, dt) =>
        vs.exists(v => cmp(dt, mn, v) <= 0 && cmp(dt, mx, v) >= 0) }
      case _ => true // unknown/compound filter: cannot prune on it
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(root, required, filters, startingVersion)
}

/** `spark.readStream.format("graft")` — every AtomicTable is a
  * STREAMING SOURCE whose offsets are table VERSIONS: each micro-batch
  * is the manifest diff between two committed versions, i.e. exactly
  * the partition dirs the commits in that range (re)referenced. For
  * append-style tables — epoch-partitioned streaming sinks
  * ([[graft.streaming.Streams.exactlyOnceBatchCommit]]), ingest-tagged
  * corpora — that IS a row-level insert changefeed; a partition
  * REWRITE re-emits the partition's new full contents (upsert-style
  * changefeed, Delta-CDF without preimages), and a dropped partition
  * emits nothing (no tombstones). The version column `_commit_version`
  * is not added — consumers that need it should partition by epoch,
  * which the exactly-once sinks already do.
  *
  * Exactly-once composition: offsets are versions, the diff is of the
  * two ENDPOINT manifests only (intermediate versions may be GC'd),
  * and restart resumes from the checkpointed version — which must
  * still be inside the table's retention window (`retain` generously
  * on changefeed sources; a too-small window fails loudly here rather
  * than silently re-emitting the world). Pushed partition-key filters
  * still prune the diff; deletion vectors do NOT apply (the feed
  * carries what each commit staged — a vector delete stages no data). */
private[sources] class GraftMicroBatchStream(root: String,
    required: StructType, filters: Array[Filter],
    startingVersion: Option[Long] = None)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class V(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  private def currentV: Long =
    AtomicTable.currentVersion(java.nio.file.Paths.get(root)).getOrElse(0L)

  // Trigger.AvailableNow: pin the target version at trigger start so the
  // run drains exactly the commits that existed then and stops
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(currentV)
  }

  // `startingVersion` (Delta-CDF's knob): emit commits FROM that version
  // onward — the first micro-batch diffs against version N-1's manifest,
  // which must still be retained (same retention contract as resume);
  // the default V(0) replays the table from its first commit
  override def initialOffset(): Offset =
    V(startingVersion.map(v => math.max(v - 1L, 0L)).getOrElse(0L))
  override def deserializeOffset(json: String): Offset = V(json.trim.toLong)
  override def latestOffset(): Offset =
    V(availableNowCap.getOrElse(currentV))
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def reportLatestOffset(): Offset = V(currentV)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[V].v, end.asInstanceOf[V].v)
    if (e <= s) return Array.empty
    val rootPath = java.nio.file.Paths.get(root)
    val endM = AtomicTable.manifestAt(rootPath, e)
    val startParts: Map[String, String] =
      if (s == 0L) Map.empty
      else try AtomicTable.manifestAt(rootPath, s).partitions
      catch {
        case _: java.nio.file.NoSuchFileException | _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"changefeed resume version $s of $root is outside the " +
              "retention window — recreate the stream (and write the " +
              "source table with a larger `retain`)")
      }
    val partitionCol = GraftSource.partitionColOf(endM)
    val changed = endM.partitions.filter { case (p, d) =>
      !startParts.get(p).contains(d) && partitionFilterAdmits(p, partitionCol)
    }
    val conf = new Configuration()
    changed.toSeq.sortBy(_._1).map { case (part, dir) =>
      val p = new Path(s"$root/$dir")
      val fs = p.getFileSystem(conf)
      val files =
        if (!fs.exists(p)) Nil
        else fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted.toSeq
      GraftInputPartition(part, files, Nil, Nil, partitionCol): InputPartition
    }.toArray
  }

  private def partitionFilterAdmits(part: String, partitionCol: String): Boolean =
    filters.forall {
      case EqualTo(c, v) if c == partitionCol => part == String.valueOf(v)
      case In(c, vs) if c == partitionCol => vs.map(String.valueOf).contains(part)
      case GreaterThan(c, v) if c == partitionCol => part > String.valueOf(v)
      case GreaterThanOrEqual(c, v) if c == partitionCol => part >= String.valueOf(v)
      case LessThan(c, v) if c == partitionCol => part < String.valueOf(v)
      case LessThanOrEqual(c, v) if c == partitionCol => part <= String.valueOf(v)
      case _ => true
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

private[sources] final case class GraftInputPartition(partValue: String,
    dataFiles: Seq[String], vectorFiles: Seq[String], keyCols: Seq[String],
    partitionCol: String)
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(partValue)))
}

private[sources] class GraftReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(p.asInstanceOf[GraftInputPartition], required)
}

/** Streams one table partition's parquet rows, applying its deletion
  * vectors from an in-memory key set (vectors are small by the
  * maintenance contract — materializeDeletes folds them). */
private[sources] class GraftPartitionReader(part: GraftInputPartition,
    required: StructType) extends PartitionReader[InternalRow] {

  private val conf = new Configuration()
  // resolved by NAME from the manifest's own key form: with schema
  // evolution, "not present in the files" no longer identifies it —
  // evolved columns are also absent from pre-evolution files
  private lazy val partitionColIdx: Int =
    required.fieldNames.indexOf(part.partitionCol)
  private def fileHasColumn(n: String): Boolean = fileSchemaNames.contains(n)
  private lazy val fileSchemaNames: Set[String] = {
    val r = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(part.dataFiles.head), conf))
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .map(_.getName).toSet
    finally r.close()
  }

  // deleted-key set: tuples of the key columns' raw values
  private val deleted: java.util.HashSet[Seq[Any]] = {
    val s = new java.util.HashSet[Seq[Any]]()
    for (vf <- part.vectorFiles)
      readGroups(vf, part.keyCols.toSet) { (g, names) =>
        s.add(part.keyCols.map(c => rawValue(g, names(c))))
      }
    s
  }

  // columns the parquet reader must materialize: the required file
  // columns, plus key columns while vectors are outstanding; a fully
  // column-pruned scan (count(*)) still projects ONE column so row
  // multiplicity survives the reader
  private lazy val fileCols: Seq[String] = {
    val req = required.fieldNames.filter(fileHasColumn).toSeq
    val withKeys = if (deleted.isEmpty) req else (req ++ part.keyCols).distinct
    if (withKeys.nonEmpty) withKeys else Seq(fileSchemaNames.min)
  }

  private val files = part.dataFiles.iterator
  private var reader: org.apache.parquet.hadoop.ParquetReader[Group] = _
  private var fieldIdx: Map[String, Int] = Map.empty
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (!files.hasNext) return false
    val path = new Path(files.next())
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    val fileSchema = try footer.getFooter.getFileMetaData.getSchema
      finally footer.close()
    val projected = projectSchema(fileSchema, fileCols)
    val c = new Configuration()
    c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), path).withConf(c).build()
    fieldIdx = projected.getFields.asScala.zipWithIndex
      .map { case (f, i) => f.getName -> i }.toMap
    true
  }

  private def projectSchema(file: MessageType, cols: Seq[String]): MessageType = {
    val kept = file.getFields.asScala.filter(f => cols.contains(f.getName))
    new MessageType(file.getName, kept.asJava)
  }

  private def readGroups(file: String, cols: Set[String])(
      f: (Group, Map[String, Int]) => Unit): Unit = {
    val path = new Path(file)
    val footer = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    val fileSchema = try footer.getFooter.getFileMetaData.getSchema
      finally footer.close()
    val projected = projectSchema(fileSchema, cols.toSeq)
    val c = new Configuration()
    c.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projected.toString)
    val idx = projected.getFields.asScala.zipWithIndex
      .map { case (g, i) => g.getName -> i }.toMap
    val r = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(), path).withConf(c).build()
    try {
      var g = r.read()
      while (g != null) { f(g, idx); g = r.read() }
    } finally r.close()
  }

  /** The raw comparable value of field `i` of `g` (null-safe): what the
    * deleted-key tuples and the row-side probe both use. */
  private def rawValue(g: Group, i: Int): Any = {
    if (g.getFieldRepetitionCount(i) == 0) return null
    val t = g.getType.getType(i).asPrimitiveType()
    t.getPrimitiveTypeName match {
      case BOOLEAN => g.getBoolean(i, 0)
      case INT32 => g.getInteger(i, 0)
      case INT64 => g.getLong(i, 0)
      case FLOAT => g.getFloat(i, 0)
      case DOUBLE => g.getDouble(i, 0)
      case BINARY | INT96 | FIXED_LEN_BYTE_ARRAY =>
        new String(java.util.Base64.getEncoder.encode(
          g.getBinary(i, 0).getBytes))
      case other => throw new IllegalArgumentException(s"unsupported key type $other")
    }
  }

  /** Catalyst value for required field `name` from the group. */
  private def catalystValue(g: Group, name: String, dt: DataType): Any = {
    val i = fieldIdx(name)
    if (g.getFieldRepetitionCount(i) == 0) return null
    val t = g.getType.getType(i).asPrimitiveType()
    (t.getPrimitiveTypeName, dt) match {
      case (BOOLEAN, BooleanType) => g.getBoolean(i, 0)
      case (INT32, DateType) => g.getInteger(i, 0)
      case (INT32, IntegerType) => g.getInteger(i, 0)
      // the parquet-compatible widenings (readEvolved's cast contract)
      case (INT32, LongType) => g.getInteger(i, 0).toLong
      case (FLOAT, DoubleType) => g.getFloat(i, 0).toDouble
      case (INT64, TimestampType) | (INT64, TimestampNTZType) =>
        t.getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation
            if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS =>
            g.getLong(i, 0) * 1000L
          case _ => g.getLong(i, 0) // MICROS (Spark's default unit)
        }
      case (INT64, LongType) => g.getLong(i, 0)
      case (FLOAT, FloatType) => g.getFloat(i, 0)
      case (DOUBLE, DoubleType) => g.getDouble(i, 0)
      case (INT96, TimestampType) =>
        // 12-byte legacy: nanos-of-day little-endian + julian day
        val b = java.nio.ByteBuffer.wrap(g.getInt96(i, 0).getBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = b.getLong
        val julianDay = b.getInt
        (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
      case (BINARY, StringType) =>
        UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
      case (BINARY, BinaryType) => g.getBinary(i, 0).getBytes
      case (pt, st) => throw new IllegalArgumentException(
        s"unsupported ($pt -> $st) for column $name")
    }
  }

  private val partValueUtf8 = UTF8String.fromString(part.partValue)

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !openNext()) return false
      val g = reader.read()
      if (g == null) {
        if (!openNext()) return false
      } else {
        val isDeleted = !deleted.isEmpty &&
          deleted.contains(part.keyCols.map(c => rawValue(g, fieldIdx(c))))
        if (!isDeleted) {
          val row = new GenericInternalRow(required.length)
          var j = 0
          while (j < required.length) {
            val f = required(j)
            if (j == partitionColIdx) row.update(j, partValueUtf8)
            // schema evolution: a required column this partition's files
            // predate reads as NULL (the readEvolved contract)
            else if (!fieldIdx.contains(f.name)) row.update(j, null)
            else row.update(j, catalystValue(g, f.name, f.dataType))
            j += 1
          }
          current = row
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}

/** Write side of the graft format — `df.write.format("graft")
  * .option("partition", "<col>").save(root)`:
  *
  *  - **append mode = dynamic partition replace** (the Hive/Delta
  *    `partitionOverwriteMode=dynamic` contract, and exactly
  *    [[AtomicTable.replacePartitions]]'s semantics): the partitions
  *    present in the data are replaced, every other partition is
  *    carried by reference.
  *  - **overwrite mode** (truncate): one commit that lands the new
  *    partitions AND drops every pre-existing partition not rewritten.
  *  - Tasks stage parquet straight into a fresh `data/txn-*` dir (one
  *    writer per partition value per task — pre-repartition by the
  *    partition column for one file per partition), the driver commits
  *    the manifest through the normal claim loop: atomic, optimistic,
  *    crash-safe (an aborted write leaves only a vacuum-reclaimable
  *    orphan txn dir). Truncate commits with `expectedVersion` so a
  *    racing writer aborts the overwrite instead of surviving it.
  *  - The `partition` option may be omitted when the table exists (the
  *    column comes from the manifest). Flat primitive schemas, same
  *    scope as the read side; timestamps write as INT64 micros. */
private[sources] class GraftWriteBuilder(root: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo,
    declaredPartition: Option[String] = None,
    declaredRetain: Option[Int] = None,
    declaredStats: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsOverwriteV2
  with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  // None = append (which for this format IS dynamic partition replace);
  // Some(preds) = INSERT OVERWRITE scoped to the partitions the
  // predicates select (ALWAYS_TRUE = truncate, via the default
  // truncate() -> overwrite(alwaysTrue) path)
  private var overwritePreds: Option[Array[Predicate]] = None

  /** Accept only predicates resolvable to partition keys from metadata —
    * a static `PARTITION (p='x')` spec, IN/OR combinations, or the
    * always-true truncate. Anything finer is not an overwrite this
    * format can scope, and must be an UPDATE/MERGE instead. */
  override def canOverwrite(predicates: Array[Predicate]): Boolean =
    predicates.forall(pr => pr.name() == "ALWAYS_TRUE" ||
      GraftV2Predicates.valuesFor(pr, resolvePartitionCol()).isDefined)

  override def overwrite(predicates: Array[Predicate])
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwritePreds = Some(predicates); this
  }

  /** Hive's `partitionOverwriteMode=dynamic` contract — exactly this
    * format's append semantics. */
  override def overwriteDynamicPartitions()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwritePreds = None; this
  }

  private def resolvePartitionCol(): String =
    Option(info.options.get("partition"))
      .orElse(AtomicTable.manifest(java.nio.file.Paths.get(root))
        .filter(_.partitions.nonEmpty).map(GraftSource.partitionColOf))
      .orElse(declaredPartition)
      .getOrElse(throw new IllegalArgumentException(
        "writing a new graft table needs .option(\"partition\", \"<col>\")"))

  // retention is per-commit (the latest commit's retain wins), so time
  // travel / changefeed consumers need every write path to carry it —
  // a per-write option wins over the table's declared setting
  private def resolveRetain(): Int =
    Option(info.options.get("retain")).map(_.trim.toInt)
      .orElse(declaredRetain).getOrElse(1)

  /** Zone-map columns for this write: a per-write `stats_columns` option
    * wins over the table's declared setting. Collected IN the writer
    * tasks as rows stream through, so a tracked table pays no second
    * pass and every SQL INSERT keeps its partitions prunable. */
  private def resolveStats(partitionCol: String): Seq[String] = {
    val cols = Option(info.options.get("stats_columns"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(declaredStats)
    cols.foreach { c =>
      require(c != partitionCol,
        s"stats_columns must not include the partition column '$c'")
      require(info.schema().fieldNames.contains(c),
        s"stats column '$c' is not in the write schema")
      require(GraftWriteStats.supported(info.schema()(c).dataType),
        s"stats column '$c' has unsupported type ${info.schema()(c).dataType}")
    }
    cols
  }

  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
      // cluster incoming rows by the partition column BEFORE the write:
      // without it, T upstream tasks x K partition values = T*K staged
      // files per commit — the fan-out that kills object-store listings
      // at 1000 executors. With it, each partition value lands in one
      // task = one file, the layout compaction maintains. An input
      // already hash-partitioned on the column satisfies the
      // distribution, so pre-repartitioned writers pay no extra shuffle.
      override def requiredDistribution()
          : org.apache.spark.sql.connector.distributions.Distribution =
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .identity(resolvePartitionCol())))
      override def requiredOrdering()
          : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        Array.empty
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = {
        val pc = resolvePartitionCol()
        new GraftBatchWrite(root, info.schema(), pc,
          overwritePreds, resolveRetain(), resolveStats(pc))
      }
      override def toStreaming
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
        val pc = resolvePartitionCol()
        new GraftStreamingWrite(root, info.schema(), pc,
          info.queryId(), resolveRetain(), resolveStats(pc))
      }
    }
}

/** `df.writeStream.format("graft")` — the table is a native STREAMING
  * SINK. Each epoch stages into its own deterministic
  * `data/txn-st-<query>-e<epoch>` dir and commits as a dynamic
  * partition replace; exactly-once comes from the epoch riding the
  * SAME manifest swap as the data (property
  * `graft.stream.<queryId>` — query-scoped, so several streams can
  * feed one table), with a replayed epoch skipped before it commits.
  * Combined with the changefeed source, tables chain into multi-hop
  * streaming pipelines: sink a stream into table A, stream table A
  * into table B, each hop transactional. Partition by an
  * epoch-derived or event-time column for the append-only layout the
  * changefeed reads incrementally. */
private[sources] class GraftStreamingWrite(root: String, schema: StructType,
    partitionCol: String, queryId: String, retain: Int = 1,
    statsColumns: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  // per-run nonce: a replay AFTER RESTART stages into a fresh dir, so a
  // skipped (already-committed) epoch can never pollute the dir its
  // original commit published; the fresh orphan ages out through vacuum
  private val nonce = java.util.UUID.randomUUID().toString.take(8)
  private def txnFor(epochId: Long) =
    GraftStreamingWriterFactory.txnFor(queryId, nonce, epochId)
  private def epochProp = s"graft.stream.$queryId"

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    GraftStreamingWriterFactory(root, schema, partitionCol, queryId, nonce,
      statsColumns)

  override def commit(epochId: Long, messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val rootPath = java.nio.file.Paths.get(root)
    val last = AtomicTable.manifest(rootPath)
      .flatMap(_.properties.get(epochProp)).map(_.toLong).getOrElse(-1L)
    if (epochId <= last) return // replayed epoch: already committed
    val written = GraftWriteCommit.pruneAndMap(root, txnFor(epochId),
      partitionCol, messages)
    AtomicTable.commitManifest(rootPath, written,
      newStats = GraftWriteCommit.mergedStats(schema, statsColumns, messages),
      properties = Map(epochProp -> epochId.toString), retain = retain)
    ()
  }

  override def abort(epochId: Long, messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(root, "data", txnFor(epochId))
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p); ()
    }
    rm(dir)
  }
}

/** partition value -> parquet file NAMES this committed task attempt
  * wrote. Carrying exact files lets the driver prune the staging dir of
  * any failed/zombie attempt's leftovers BEFORE the manifest commit —
  * without it, a retried task would leave its dead attempt's file in
  * the shared txn dir and the commit would double those rows. */
private[sources] final case class GraftCommitMessage(
    files: Map[String, Set[String]],
    stats: Map[String, GraftTaskStats] = Map.empty)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** Per-partition zone-map fragment ONE task observed while writing: row
  * count plus min/max of the tracked columns, already rendered in the
  * manifest's string encoding (the `cast(col as string)` form the Scala
  * API commits, so one table can mix both writers' stats). Collected AS
  * the rows stream through the writer — stats always bound exactly the
  * staged files, never a re-execution of the input plan. */
private[sources] final case class GraftTaskStats(rows: Long,
    mins: Map[String, String], maxs: Map[String, String])

/** Typed track-and-render for writer-side zone maps, shared by batch,
  * streaming, and row-level writes. */
private[sources] object GraftWriteStats {

  /** Supported stats column types (everything statsOrder can compare). */
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The raw comparable value of stats field `i`, null when SQL-null. */
  def valueAt(row: InternalRow, i: Int, dt: DataType): Any =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType | TimestampType | TimestampNTZType => row.getLong(i)
      case IntegerType | DateType => row.getInt(i)
      case DoubleType => row.getDouble(i)
      case FloatType => row.getFloat(i)
      case BooleanType => row.getBoolean(i)
      case StringType => row.getUTF8String(i).toString
      case other => throw new IllegalArgumentException(s"stats type $other")
    }

  /** a < b in the zone-map order (same order statsOrder applies on the
    * rendered strings — strings compare as java Strings, timestamps as
    * micros, numerics numerically). */
  def lt(dt: DataType, a: Any, b: Any): Boolean = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case IntegerType | DateType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case DoubleType =>
      java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]) < 0
    case FloatType =>
      java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float]) < 0
    case BooleanType => !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
    case StringType => a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) < 0
    case other => throw new IllegalArgumentException(s"stats type $other")
  }

  /** Render in the manifest's `cast(col as string)` encoding. */
  def render(dt: DataType, v: Any): String = dt match {
    case DateType => java.time.LocalDate.ofEpochDay(
      v.asInstanceOf[Int].toLong).toString
    case TimestampType | TimestampNTZType =>
      val us = v.asInstanceOf[Long]
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      val base = "%04d-%02d-%02d %02d:%02d:%02d".format(ldt.getYear,
        ldt.getMonthValue, ldt.getDayOfMonth, ldt.getHour, ldt.getMinute,
        ldt.getSecond)
      val frac = Math.floorMod(us, 1000000L)
      if (frac == 0L) base
      else base + "." + "%06d".format(frac).reverse.dropWhile(_ == '0').reverse
    case _ => String.valueOf(v)
  }

  /** Driver-side merge of the committed tasks' fragments into the
    * manifest's [[AtomicTable.PartStats]], bounds compared by the SAME
    * comparator the pruned reads use. */
  def merge(schema: StructType, statsColumns: Seq[String],
      messages: Seq[GraftTaskStats]): AtomicTable.PartStats = {
    val rows = messages.map(_.rows).sum
    var mins = Map.empty[String, String]
    var maxs = Map.empty[String, String]
    statsColumns.foreach { c =>
      val dt = schema(c).dataType
      val lo = messages.flatMap(_.mins.get(c))
        .reduceOption((a, b) => if (AtomicTable.statsOrder(dt, a, b) <= 0) a else b)
      val hi = messages.flatMap(_.maxs.get(c))
        .reduceOption((a, b) => if (AtomicTable.statsOrder(dt, a, b) >= 0) a else b)
      lo.foreach(v => mins += c -> v)
      hi.foreach(v => maxs += c -> v)
    }
    AtomicTable.PartStats(rows, mins, maxs)
  }
}

private[sources] class GraftBatchWrite(root: String, schema: StructType,
    partitionCol: String,
    overwrite: Option[Array[org.apache.spark.sql.connector.expressions.filter.Predicate]],
    retain: Int = 1,
    statsColumns: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.BatchWrite {

  private val txn = s"txn-${java.util.UUID.randomUUID().toString.take(12)}"
  private val readVersion =
    AtomicTable.currentVersion(java.nio.file.Paths.get(root)).getOrElse(0L)

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new GraftWriterFactory(root, txn, schema, partitionCol, statsColumns)

  override def commit(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val written = GraftWriteCommit.pruneAndMap(root, txn, partitionCol, messages)
    val rootPath = java.nio.file.Paths.get(root)
    // overwrite scope: the partitions the predicates select from the
    // CURRENT manifest (ALWAYS_TRUE selects all = truncate); append
    // drops nothing — partitions present in the data replace themselves
    val drop: Set[String] = overwrite match {
      case None => Set.empty
      case Some(preds) =>
        val keys = AtomicTable.manifest(rootPath).map(_.partitions.keySet)
          .getOrElse(Set.empty)
        GraftV2Predicates.partitionsFor(preds, partitionCol, keys)
          .getOrElse(throw new IllegalArgumentException(
            s"INSERT OVERWRITE predicates [${preds.mkString(", ")}] do not " +
              s"resolve to partitions of '$partitionCol'")) -- written.keySet
    }
    AtomicTable.commitManifest(rootPath, written,
      newStats = GraftWriteCommit.mergedStats(schema, statsColumns, messages),
      dropPartitions = drop, retain = retain,
      expectedVersion = if (overwrite.isDefined) Some(readVersion) else None)
    ()
  }

  override def abort(messages: Array[
      org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    // staged bytes become a never-committed orphan; reclaim eagerly
    val dir = java.nio.file.Paths.get(root, "data", txn)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p); ()
    }
    rm(dir)
  }
}

/** Driver-side half of a graft write commit, shared by batch and
  * streaming: union the committed task attempts' file reports, prune
  * the staging txn dir of anything no committed attempt wrote (a
  * failed or zombie attempt's leftovers — Spark only passes messages
  * from attempts it committed), and return the manifest's
  * partition -> dir map. */
private[sources] object GraftWriteCommit {
  def pruneAndMap(root: String, txn: String, partitionCol: String,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Map[String, String] = {
    val byPart = mutable.Map.empty[String, mutable.Set[String]]
    messages.foreach {
      case GraftCommitMessage(files, _) =>
        files.foreach { case (pv, fs) =>
          byPart.getOrElseUpdate(pv, mutable.Set.empty) ++= fs
        }
      case _ => ()
    }
    val conf = new Configuration()
    val txnPath = new Path(s"$root/data/$txn")
    val fs = txnPath.getFileSystem(conf)
    if (fs.exists(txnPath)) fs.listStatus(txnPath).foreach { st =>
      val dirName = st.getPath.getName
      if (dirName.startsWith(s"$partitionCol=")) {
        val part = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(dirName.substring(partitionCol.length + 1))
        byPart.get(part) match {
          case None => fs.delete(st.getPath, true); ()
          case Some(keep) => fs.listStatus(st.getPath).foreach { f =>
            val n = f.getPath.getName
            if (n.endsWith(".parquet") && !keep.contains(n)) {
              fs.delete(f.getPath, false); ()
            }
          }
        }
      }
    }
    byPart.keys.map { pv =>
      pv -> (s"data/$txn/$partitionCol=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(pv))
    }.toMap
  }

  /** Merge the committed tasks' per-partition stats fragments into the
    * manifest's zone maps (empty when stats aren't tracked). */
  def mergedStats(schema: StructType, statsColumns: Seq[String],
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Map[String, AtomicTable.PartStats] = {
    if (statsColumns.isEmpty) return Map.empty
    val frags = mutable.Map.empty[String, mutable.Buffer[GraftTaskStats]]
    messages.foreach {
      case GraftCommitMessage(_, stats) =>
        stats.foreach { case (pv, st) =>
          frags.getOrElseUpdate(pv, mutable.Buffer.empty) += st
        }
      case _ => ()
    }
    frags.map { case (pv, sts) =>
      pv -> GraftWriteStats.merge(schema, statsColumns, sts.toSeq)
    }.toMap
  }
}

private[sources] final case class GraftStreamingWriterFactory(root: String,
    schema: StructType, partitionCol: String, queryId: String, nonce: String,
    statsColumns: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftDataWriter(root,
      GraftStreamingWriterFactory.txnFor(queryId, nonce, epochId),
      schema, partitionCol, partitionId, taskId, statsColumns)
}

private[sources] object GraftStreamingWriterFactory {
  def txnFor(queryId: String, nonce: String, epochId: Long): String =
    s"txn-st-${queryId.take(8)}-$nonce-e$epochId"
}

private[sources] class GraftWriterFactory(root: String, txn: String,
    schema: StructType, partitionCol: String, statsColumns: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GraftDataWriter(root, txn, schema, partitionCol, partitionId, taskId,
      statsColumns)
}

/** Task-side writer: one parquet file per partition VALUE this task
  * sees (pre-repartition by the partition column upstream for the
  * one-file-per-partition layout the maintenance operators keep). */
private[sources] class GraftDataWriter(root: String, txn: String,
    schema: StructType, partitionCol: String, partitionId: Int, taskId: Long,
    statsColumns: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter

  private val partIdx = schema.fieldIndex(partitionCol)
  private val statsFields: Array[(String, Int, DataType)] =
    statsColumns.map(c => (c, schema.fieldIndex(c), schema(c).dataType)).toArray
  // per partition VALUE: row count + typed running min/max per stats col
  private final class StatsAcc {
    var rows = 0L
    val mins = new Array[Any](statsFields.length)
    val maxs = new Array[Any](statsFields.length)
  }
  private val statsAcc = mutable.Map.empty[String, StatsAcc]
  private val dataFields = schema.fields.zipWithIndex.filter(_._1.name != partitionCol)
  private val msgType: MessageType = {
    import org.apache.parquet.schema.Types
    val b = Types.buildMessage()
    dataFields.foreach { case (f, _) =>
      val t = f.dataType match {
        case LongType => Types.optional(INT64).named(f.name)
        case IntegerType => Types.optional(INT32).named(f.name)
        case DoubleType => Types.optional(DOUBLE).named(f.name)
        case FloatType => Types.optional(FLOAT).named(f.name)
        case BooleanType => Types.optional(BOOLEAN).named(f.name)
        case StringType => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case BinaryType => Types.optional(BINARY).named(f.name)
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case TimestampNTZType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case DateType => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case other => throw new IllegalArgumentException(
          s"unsupported write type $other for column ${f.name}")
      }
      b.addField(t)
      ()
    }
    b.named("graft")
  }
  private val factory = new SimpleGroupFactory(msgType)
  private val writers = mutable.Map.empty[String,
    org.apache.parquet.hadoop.ParquetWriter[Group]]

  private[sources] def fileNameFor(): String =
    s"part-$partitionId-$taskId.parquet"

  private def writerFor(part: String): org.apache.parquet.hadoop.ParquetWriter[Group] =
    writers.getOrElseUpdate(part, {
      val dir = s"$root/data/$txn/$partitionCol=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(part)
      val file = new Path(s"$dir/${fileNameFor()}")
      ExampleParquetWriter.builder(
          org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
            file, new Configuration()))
        .withType(msgType)
        .withConf(new Configuration())
        .build()
    })

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(partIdx), s"null partition value for '$partitionCol'")
    val partValue = schema(partIdx).dataType match {
      case StringType => row.getUTF8String(partIdx).toString
      case LongType => row.getLong(partIdx).toString
      case IntegerType => row.getInt(partIdx).toString
      case other => throw new IllegalArgumentException(
        s"unsupported partition column type $other")
    }
    val g = factory.newGroup()
    dataFields.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          g.add(f.name, row.getLong(i))
        case IntegerType | DateType => g.add(f.name, row.getInt(i))
        case DoubleType => g.add(f.name, row.getDouble(i))
        case FloatType => g.add(f.name, row.getFloat(i))
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case StringType => g.add(f.name, org.apache.parquet.io.api.Binary
          .fromConstantByteArray(row.getUTF8String(i).getBytes))
        case BinaryType => g.add(f.name, org.apache.parquet.io.api.Binary
          .fromConstantByteArray(row.getBinary(i)))
        case _ => ()
      }
    }
    writerFor(partValue).write(g)
    if (statsFields.nonEmpty) {
      val acc = statsAcc.getOrElseUpdate(partValue, new StatsAcc)
      acc.rows += 1L
      var k = 0
      while (k < statsFields.length) {
        val (_, i, dt) = statsFields(k)
        val v = GraftWriteStats.valueAt(row, i, dt)
        if (v != null) {
          if (acc.mins(k) == null || GraftWriteStats.lt(dt, v, acc.mins(k)))
            acc.mins(k) = v
          if (acc.maxs(k) == null || GraftWriteStats.lt(dt, acc.maxs(k), v))
            acc.maxs(k) = v
        }
        k += 1
      }
    }
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writers.values.foreach(_.close())
    val stats = statsAcc.map { case (part, acc) =>
      part -> GraftTaskStats(acc.rows,
        statsFields.zipWithIndex.flatMap { case ((c, _, dt), k) =>
          Option(acc.mins(k)).map(v => c -> GraftWriteStats.render(dt, v)) }.toMap,
        statsFields.zipWithIndex.flatMap { case ((c, _, dt), k) =>
          Option(acc.maxs(k)).map(v => c -> GraftWriteStats.render(dt, v)) }.toMap)
    }.toMap
    GraftCommitMessage(writers.keySet.toSeq
      .map(p => p -> Set(fileNameFor())).toMap, stats)
  }
  override def abort(): Unit = writers.values.foreach(_.close())
  override def close(): Unit = ()
}
