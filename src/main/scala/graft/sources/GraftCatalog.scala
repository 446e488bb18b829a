package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.etl.AtomicTable

/** A DataSource V2 [[TableCatalog]] over a warehouse DIRECTORY of
  * [[AtomicTable]]s — the piece that makes the whole table format
  * reachable from PURE SQL, no paths in queries:
  *
  * {{{
  * spark.sql.catalog.graft      = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.root = /warehouse
  *
  * CREATE TABLE graft.db.t (id BIGINT, v DOUBLE, p STRING) PARTITIONED BY (p)
  * INSERT INTO graft.db.t SELECT ...
  * SELECT * FROM graft.db.t VERSION AS OF 2          -- native SQL time travel
  * SELECT * FROM graft.db.t TIMESTAMP AS OF '...'    -- via the commit clock
  * }}}
  *
  * Layout is filesystem-native and matches what a 1000-executor cluster
  * wants from an object store: a namespace is a directory level, a table
  * is an [[AtomicTable]] root under it, and ALL state lives in the
  * table's own manifests — the catalog holds no mutable metadata of its
  * own beyond a per-table `_table.json` (declared schema + partition
  * column, written once at CREATE so an empty table is loadable before
  * its first commit). Concurrency therefore inherits the manifest
  * claim-loop guarantees: two INSERTs race at the table's commit point,
  * not in the catalog.
  *
  * Scope decisions:
  *  - exactly ONE identity partition transform (the AtomicTable model);
  *  - `VERSION AS OF` resolves through `loadTable(ident, version)`,
  *    `TIMESTAMP AS OF` through `loadTable(ident, micros)` against the
  *    strictly-monotonic commit clock — both return a READ-ONLY pinned
  *    handle;
  *  - CTAS works through Spark's non-atomic create-then-write path (a
  *    failed CTAS leaves an empty creatable-over table, same as the
  *    built-in file catalogs without staging);
  *  - `alterTable` supports property changes and appended nullable
  *    ADD COLUMNS (metadata-only schema evolution, null-filled reads);
  *    rename/drop are rewrites and stay on the Scala API. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  import GraftCatalog.DefaultRetain

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name' needs spark.sql.catalog.$name.root=<warehouse dir>"))
    root = Paths.get(r)
    Files.createDirectories(root)
    ()
  }
  override def name(): String = catalogName

  private def nsDir(ns: Array[String]): Path =
    ns.foldLeft(root)((p, s) => p.resolve(s))
  private def tableDir(ident: Identifier): Path =
    nsDir(ident.namespace()).resolve(ident.name())
  private def metaFile(dir: Path): Path = dir.resolve("_table.json")
  private def isTable(dir: Path): Boolean =
    Files.exists(metaFile(dir)) || Files.isDirectory(dir.resolve("_manifests"))

  // ------------------------------------------------------------ tables

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val dir = nsDir(ns)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(ns)
    val s = Files.list(dir)
    try s.iterator.asScala
      .filter(p => Files.isDirectory(p) && isTable(p))
      .map(p => Identifier.of(ns, p.getFileName.toString)).toArray
    finally s.close()
  }

  override def tableExists(ident: Identifier): Boolean = isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table = ident.name() match {
    // Iceberg-style metadata tables, all from manifests only, no scan:
    // `t$history` is DESCRIBE HISTORY (the commit log); `t$partitions`
    // is the current layout — partition key, data dir, row count, and
    // the zone-map bounds per tracked column, i.e. exactly what the
    // pruned reads consult, now auditable from SQL
    case HistoryName(base) =>
      val dir = nsDir(ident.namespace()).resolve(base)
      if (!isTable(dir)) throw new NoSuchTableException(ident)
      new GraftHistoryTable(s"$catalogName:${ident.toString}",
        AtomicTable.history(dir))
    case DetailName(base) =>
      val dir = nsDir(ident.namespace()).resolve(base)
      if (!isTable(dir)) throw new NoSuchTableException(ident)
      // root-only: version, layout, counts, and vector tallies are all
      // partition-granular — DESCRIBE DETAIL never opens a blob
      val m = AtomicTable.rootOpt(dir)
      val meta = readMeta(dir)
      new GraftDetailTable(s"$catalogName:${ident.toString}", GraftDetailRow(
        dir.toString,
        m.map(_.version).getOrElse(0L),
        m.map(_.partitions.size).getOrElse(0),
        m.map(x => AtomicTable.history(dir).headOption.flatMap(_.rows)).flatten,
        m.map(_.deletes.values.map(_.size).sum).getOrElse(0),
        meta.map(_._2).orElse(m.filter(_.partitions.nonEmpty)
          .map(GraftSource.partitionColOf)).getOrElse(""),
        meta.map(_._3).getOrElse(GraftCatalog.DefaultRetain),
        meta.map(_._4.mkString(",")).getOrElse("")))
    case PartitionsName(base) =>
      val dir = nsDir(ident.namespace()).resolve(base)
      if (!isTable(dir)) throw new NoSuchTableException(ident)
      // root-only: the partition map IS the root's planning tier
      val m = AtomicTable.rootOpt(dir).getOrElse(
        AtomicTable.ManifestRoot(0L, Map.empty))
      val rows = m.partitions.toSeq.sortBy(_._1).map { case (k, d) =>
        val st = m.stats.get(k)
        GraftPartitionsRow(k, d.mkString(","), d.size, st.map(_.rows),
          st.map(_.mins).getOrElse(Map.empty),
          st.map(_.maxs).getOrElse(Map.empty),
          m.deletes.getOrElse(k, Nil).size)
      }
      new GraftPartitionsTable(s"$catalogName:${ident.toString}", rows)
    case FilesName(base) =>
      // the FILE-level map: one row per committed data file with its
      // recorded rows and [min, max] bounds — what LIMIT pushdown and
      // file skipping consult, auditable from SQL (Iceberg's `files`
      // metadata table)
      val dir = nsDir(ident.namespace()).resolve(base)
      if (!isTable(dir)) throw new NoSuchTableException(ident)
      val m = AtomicTable.manifest(dir).getOrElse(
        AtomicTable.Manifest(0L, Map.empty))
      val rows = for {
        (k, dirs) <- m.partitions.toSeq.sortBy(_._1)
        d <- dirs
        (f, st) <- m.fileStats.getOrElse(d,
          Map.empty[String, AtomicTable.PartStats]).toSeq.sortBy(_._1)
      } yield GraftPartitionsRow(k, s"$d/$f", 1, Some(st.rows),
        st.mins, st.maxs, m.deletes.getOrElse(k, Nil).size)
      new GraftPartitionsTable(s"$catalogName:${ident.toString}", rows)
    case _ => loadPinned(ident, None)
  }

  private val HistoryName = "(.+)\\$history".r
  private val PartitionsName = "(.+)\\$partitions".r
  private val DetailName = "(.+)\\$detail".r
  private val FilesName = "(.+)\\$files".r

  /** `VERSION AS OF <v>` — Spark hands the SQL literal through
    * verbatim. A non-numeric literal resolves as a snapshot TAG
    * (`CALL system.tag(...)` — `VERSION AS OF 'prod'` reads the pinned
    * version, which GC keeps alive for as long as the tag exists). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.trim
    v.toLongOption match {
      case Some(n) => loadPinned(ident, Some(n))
      case None =>
        val dir = tableDir(ident)
        if (!isTable(dir)) throw new NoSuchTableException(ident)
        val tagged = AtomicTable.tagVersion(dir, v).getOrElse(
          throw new IllegalArgumentException(
            s"table $ident has no tag '$v' — CALL system.tag to create one"))
        loadPinned(ident, Some(tagged))
    }
  }

  /** `TIMESTAMP AS OF <ts>` — Spark resolves the literal to epoch MICROS;
    * the commit clock is millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = AtomicTable.versionAsOf(dir, timestampMicros / 1000L).getOrElse(
      throw new IllegalArgumentException(s"no commit of $ident at or before " +
        s"timestamp ${timestampMicros / 1000L}ms is inside the retention window"))
    loadPinned(ident, Some(v))
  }

  private def loadPinned(ident: Identifier, version: Option[Long]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val meta = readMeta(dir)
    // the DECLARED schema is the truth for catalog tables (it is what
    // CREATE + ALTER ADD COLUMNS agreed to; pre-evolution partitions
    // null-fill in the reader); a PINNED version instead reads with its
    // own snapshot shape, and undeclared tables (written by path into
    // the warehouse dir) fall back to file inference
    // root-only: a table LOAD must not hydrate any blob — pruned reads
    // would otherwise pay O(table) metadata before planning even starts
    val hasData = AtomicTable.rootOpt(dir).exists(_.partitions.nonEmpty) ||
      version.isDefined
    val schema =
      if (version.isDefined)
        GraftSource.inferredSchema(new Configuration(), dir.toString, version)
      else meta.map(_._1).getOrElse {
        if (hasData) GraftSource.inferredSchema(new Configuration(), dir.toString)
        else throw new NoSuchTableException(ident)
      }
    val props = Map("path" -> dir.toString,
      "retain" -> meta.map(_._3).getOrElse(DefaultRetain).toString) ++
      meta.map("partition" -> _._2) ++
      meta.map(m => "stats_columns" -> m._4.mkString(","))
        .filter(_._2.nonEmpty) ++
      (if (meta.isDefined) readSalt(dir).map { case (c, n) =>
        "write_salt" -> s"$c:$n" } else None) ++
      (if (meta.isDefined) Some(readOrder(dir)).filter(_.nonEmpty)
        .map(o => "write_order" -> o.mkString(",")) else None) ++
      (if (meta.isDefined) Some(readBloomBy(dir)).filter(_.nonEmpty)
        .map(b => "bloom_columns" -> b.mkString(",")) else None) ++
      version.map("versionasof" -> _.toString)
    new GraftTable(props, schema, validateWrites = true)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    if (!Files.isDirectory(dir.getParent))
      throw new NoSuchNamespaceException(ident.namespace())
    val partColList = partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case t if t.name == "bucket" && t.references.length == 1 =>
        // bucket(N, col): stored as the synthetic level <col>_bucketN —
        // opaque to every spec-agnostic component, decoded by the
        // writer / scan / function catalog (see GraftBuckets)
        val src = t.references.head.fieldNames.mkString(".")
        val n = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform needs a literal bucket count, got [$t]"))
        require(n > 0, s"bucket count must be positive, got $n")
        require(schema.fieldNames.contains(src),
          s"bucket column '$src' is not in the table schema")
        require(GraftBuckets.supportedType(schema(src).dataType),
          s"bucket is not defined over ${schema(src).dataType.catalogString} " +
            s"(column '$src')")
        GraftBuckets.levelName(src, n)
      case t if Seq("hours", "days", "months", "years").contains(t.name) &&
          t.references.length == 1 =>
        // monotone time transforms: <col>_days / _months / _years —
        // range predicates on the source prune (see GraftTransforms)
        val src = t.references.head.fieldNames.mkString(".")
        val kind = t.name match {
          case "hours" => GraftTransforms.Hours
          case "days" => GraftTransforms.Days
          case "months" => GraftTransforms.Months
          case _ => GraftTransforms.Years
        }
        require(schema.fieldNames.contains(src),
          s"${t.name} column '$src' is not in the table schema")
        require(GraftTransforms.supportedType(kind, schema(src).dataType),
          s"${t.name} is not defined over " +
            s"${schema(src).dataType.catalogString} (column '$src')")
        GraftTransforms.levelName(src, kind)
      case t if t.name == "truncate" && t.references.length == 1 =>
        val src = t.references.head.fieldNames.mkString(".")
        val w = t.arguments.collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"truncate transform needs a literal width, got [$t]"))
        require(w > 0, s"truncate width must be positive, got $w")
        require(schema.fieldNames.contains(src),
          s"truncate column '$src' is not in the table schema")
        require(GraftTransforms.supportedType(GraftTransforms.Trunc(w),
          schema(src).dataType),
          s"truncate is not defined over " +
            s"${schema(src).dataType.catalogString} (column '$src')")
        GraftTransforms.levelName(src, GraftTransforms.Trunc(w))
      case other => throw new IllegalArgumentException(
        "graft tables take PARTITIONED BY (<col> | bucket(<n>, <col>) | " +
          "days/months/years(<col>) | truncate(<w>, <col>)) levels, " +
          s"got [$other]")
    }
    require(partColList.nonEmpty,
      "graft tables take at least one PARTITIONED BY (<col>) identity column")
    require(partColList.distinct == partColList,
      s"duplicate PARTITIONED BY columns: [${partColList.mkString(", ")}]")
    partColList.foreach(c => require(
      GraftBuckets.level(c).isDefined ||
        GraftTransforms.level(c).isDefined ||
        schema.fieldNames.contains(c),
      s"partition column '$c' is not in the table schema"))
    // stored and threaded everywhere as the comma-joined spec
    val partCol = partColList.mkString(",")
    // retention is what makes SQL time travel WORK on this table: every
    // catalog-routed commit carries it (TBLPROPERTIES ('retain'='N') to
    // size the window; manifests are tiny, but retained manifests pin
    // their data dirs against GC — that is the disk cost being chosen)
    val retain = Option(properties.get("retain"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "retain")))
      .map(_.trim.toInt).getOrElse(DefaultRetain)
    // zone-map columns: TBLPROPERTIES ('stats_columns'='a,b') makes every
    // catalog-routed write (INSERT, MERGE, UPDATE rewrites) commit
    // per-partition min/max, so pruned reads work on SQL-owned tables
    val statsCols = Option(properties.get("stats_columns"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "stats_columns")))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    statsCols.foreach { c =>
      require(schema.fieldNames.contains(c), s"stats column '$c' not in schema")
      require(!partColList.contains(c),
        "stats_columns must not include a partition column")
    }
    // compaction clustering: TBLPROPERTIES ('cluster_by'='a,b') makes
    // CALL system.compact range-cluster each partition's files on these
    // columns (file-level zone maps then prune range reads)
    val clusterBy = Option(properties.get("cluster_by"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "cluster_by")))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    clusterBy.foreach { c =>
      require(schema.fieldNames.contains(c), s"cluster column '$c' not in schema")
      require(!partColList.contains(c),
        "cluster_by must not include a partition column")
    }
    // write fan-out: TBLPROPERTIES ('write_salt'='col:N') makes every
    // INSERT cluster on (partition levels, bucket(N, col)) — up to N
    // writer tasks (= N files) per partition per commit, the knob for
    // partitions too big for one task's write throughput
    val writeSalt = Option(properties.get("write_salt"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "write_salt")))
      .map(GraftCatalog.parseSalt(_, schema, partColList))
    // range-clustered INSERTs: TBLPROPERTIES ('write_order'='a[,b]')
    // makes every write RANGE-distribute + sort on (partition levels,
    // these columns) — each partition's files land range-DISJOINT in
    // the order columns, so file-level zone maps prune immediately,
    // without waiting for a clustered compaction
    val writeOrder = Option(properties.get("write_order"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "write_order")))
      .map(GraftCatalog.parseOrder(_, schema, partColList)).getOrElse(Nil)
    require(writeSalt.isEmpty || writeOrder.isEmpty,
      "write_salt and write_order are mutually exclusive (hash fan-out " +
        "vs range clustering)")
    // per-file bloom sidecars: TBLPROPERTIES ('bloom_columns'='a,b')
    // makes every write drop an 8 KiB membership filter next to each
    // data file — point lookups on UNCLUSTERED columns skip files zone
    // maps cannot (Delta's bloom filter index)
    val bloomCols = Option(properties.get("bloom_columns"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "bloom_columns")))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    bloomCols.foreach { c =>
      require(schema.fieldNames.contains(c), s"bloom column '$c' not in schema")
      require(!partColList.contains(c),
        "bloom_columns must not include a partition column")
      require(!Seq(org.apache.spark.sql.types.TimestampType,
        org.apache.spark.sql.types.TimestampNTZType).contains(schema(c).dataType),
        s"bloom column '$c': timestamp literals render differently from " +
          "the sidecar encoding — store epoch micros as BIGINT instead")
    }
    Files.createDirectories(dir)
    // the catalog's only commit point: O_EXCL create-new of _table.json
    // linearizes two processes racing the same CREATE (same primitive
    // the manifest claim loop uses)
    try writeMeta(dir, schema, partCol, retain, statsCols, createNew = true,
      clusterBy = clusterBy, writeSalt = writeSalt, writeOrder = writeOrder,
      bloomBy = bloomCols)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new TableAlreadyExistsException(ident)
    }
    new GraftTable(Map("path" -> dir.toString, "partition" -> partCol,
      "retain" -> retain.toString) ++
      (if (statsCols.nonEmpty) Map("stats_columns" -> statsCols.mkString(","))
       else Map.empty), schema, validateWrites = true)
  }

  /** `ALTER TABLE ... ADD COLUMNS / RENAME COLUMN / DROP COLUMN`: all
    * METADATA-ONLY evolutions — no file is ever rewritten. ADD appends
    * a nullable column that pre-evolution partitions read as NULL;
    * RENAME records `graft.rename.<new>=<old>` so the reader and every
    * pruning tier (zone maps, file stats, bloom sidecars, sort
    * markers) resolve old files through the alias chain; DROP removes
    * the column from the declared schema and marks the name retired —
    * re-adding a retired name is REFUSED (stale file-level metadata
    * under it would mis-prune), partition levels and delete-key
    * columns refuse rename/drop loudly. */
  /** The table properties ALTER may change after CREATE: retention and
    * zone-map columns are commit-time knobs; everything else (path,
    * partition layout) is structural — layout changes go through
    * [[repartitionDeclaredTable]], which rewrites data AND meta. */
  private val MutableProperties =
    Set("retain", "stats_columns", "cluster_by", "write_salt",
      "write_order", "bloom_columns")

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val sets = changes.collect { case s: TableChange.SetProperty => s }
    val removes = changes.collect { case r: TableChange.RemoveProperty => r }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    changes.foreach {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case _: TableChange.AddColumn => ()
      case _: TableChange.RenameColumn | _: TableChange.DeleteColumn => ()
      case other => throw new UnsupportedOperationException(
        s"graft catalog does not support ALTER ${other.getClass.getSimpleName}")
    }
    // accepted-and-ignored would be silent data-behavior drift: a user
    // who SET a property must get it or an error, never a shrug
    (sets.map(_.property) ++ removes.map(_.property)).foreach { p =>
      if (!MutableProperties(p)) throw new UnsupportedOperationException(
        s"table property '$p' cannot be altered — only " +
          s"${MutableProperties.toSeq.sorted.mkString("/")} change after " +
          "CREATE (partition layout changes are rewrites: " +
          "GraftCatalog.repartitionDeclaredTable)")
    }
    if (adds.nonEmpty || sets.nonEmpty || removes.nonEmpty ||
        renames.nonEmpty || drops.nonEmpty) {
      adds.foreach { a =>
        require(a.fieldNames.length == 1,
          s"nested column '${a.fieldNames.mkString(".")}' not supported")
        require(a.position() == null,
          "positioned ADD COLUMNS not supported — columns append")
        require(a.isNullable,
          s"added column '${a.fieldNames.head}' must be nullable: existing " +
            "partitions read it as NULL")
      }
      // evolve the declared meta; undeclared (path-written) tables get
      // their meta materialized from inference first
      val (schema0, partCol, retain0, statsCols0) = readMeta(dir).getOrElse {
        val inferred = GraftSource.inferredSchema(new Configuration(), dir.toString)
        val pc = AtomicTable.rootOpt(dir).filter(_.partitions.nonEmpty)
          .map(GraftSource.partitionColOf).getOrElse(
            throw new IllegalArgumentException(s"$ident has no partition column"))
        (inferred, pc, DefaultRetain, Nil)
      }
      val pcols0 = AtomicTable.partCols(partCol)
      val tableProps = AtomicTable.rootOpt(dir)
        .map(_.properties).getOrElse(Map.empty[String, String])
      val dvKeys = tableProps.get(AtomicTable.DeleteKeysProperty)
        .map(_.split(",").toSet).getOrElse(Set.empty[String])
      val retired = GraftSource.retiredNames(tableProps)
      // a column serving as the SOURCE of a synthetic partition level
      // (<col>_bucketN / <col>_days / ...) is structurally pinned: the
      // level name embeds it, and the dir derivation would silently
      // stop matching after a rename/drop
      def levelSource(c: String): Boolean = pcols0.exists(p =>
        GraftBuckets.level(p).exists(_._1 == c) ||
          GraftTransforms.level(p).exists(_.src == c))

      // ---- RENAME COLUMN: metadata-only — the declared schema and the
      // per-column knobs move to the new name, and one properties
      // commit records `graft.rename.<new> = <old>` so readers and
      // every pruning tier resolve old files through the alias chain.
      // No data file is rewritten, ever.
      renames.foreach { r =>
        require(r.fieldNames.length == 1,
          s"nested column '${r.fieldNames.mkString(".")}' not supported")
      }
      drops.foreach { d =>
        require(d.fieldNames.length == 1,
          s"nested column '${d.fieldNames.mkString(".")}' not supported")
      }
      val renamePairs: Seq[(String, String)] =
        renames.map(r => r.fieldNames.head -> r.newName)
      val dropNames: Seq[String] = drops.map { d =>
        val c = d.fieldNames.head
        if (!schema0.fieldNames.contains(c) && !d.ifExists)
          throw new IllegalArgumentException(s"column '$c' does not exist")
        c
      }.filter(schema0.fieldNames.contains)
      renamePairs.foreach { case (old, nw) =>
        require(schema0.fieldNames.contains(old),
          s"column '$old' does not exist")
        require(!schema0.fieldNames.contains(nw),
          s"column '$nw' already exists")
        require(!pcols0.contains(old) && !levelSource(old),
          s"cannot rename '$old': it is (or derives) a partition level — " +
            "layout changes are rewrites (repartitionDeclaredTable)")
        require(!retired.contains(nw),
          s"cannot rename to '$nw': the name was used by a dropped or " +
            "renamed column — stale zone maps/bloom sidecars recorded " +
            "under it would mis-prune the new column")
        if (dvKeys.contains(old))
          require(AtomicTable.rootOpt(dir)
              .forall(_.deletes.values.forall(_.isEmpty)),
            s"cannot rename delete-key column '$old' while delete " +
              "vectors are outstanding — fold them first " +
              "(MergeInto.materializeDeletes)")
      }
      dropNames.foreach { c =>
        require(!pcols0.contains(c) && !levelSource(c),
          s"cannot drop '$c': it is (or derives) a partition level — " +
            "layout changes are rewrites (repartitionDeclaredTable)")
        require(!dvKeys.contains(c),
          s"cannot drop delete-key column '$c': outstanding and future " +
            "delete vectors are keyed by it")
      }
      val renameMap = renamePairs.toMap
      def renamed(c: String): String = renameMap.getOrElse(c, c)
      val schema1 = StructType(schema0.fields
        .filterNot(f => dropNames.contains(f.name))
        .map(f => if (renameMap.contains(f.name)) f.copy(name = renamed(f.name))
          else f))
      val taken = schema1.fieldNames.toSet
      val added = adds.map { a =>
        require(!taken.contains(a.fieldNames.head),
          s"column '${a.fieldNames.head}' already exists")
        // name-reuse guard: zone maps / bloom sidecars recorded under a
        // retired name would silently mis-prune a NEW column reusing it
        require(!retired.contains(a.fieldNames.head) &&
            !dropNames.contains(a.fieldNames.head),
          s"column name '${a.fieldNames.head}' was previously dropped or " +
            "renamed away — stale file-level metadata under it would " +
            "mis-prune; pick a fresh name")
        org.apache.spark.sql.types.StructField(a.fieldNames.head, a.dataType,
          nullable = true)
      }
      val newSchema = StructType(schema1.fields ++ added)
      var retain = retain0
      // per-column knobs follow the rename and die with a drop
      var statsCols = statsCols0.filterNot(dropNames.contains).map(renamed)
      var clusterBy = readClusterBy(dir)
        .filterNot(dropNames.contains).map(renamed)
      var salt = readSalt(dir).map { case (c, n) =>
        require(!dropNames.contains(c),
          s"cannot drop '$c': it is the write_salt column — clear the " +
            "property first")
        (renamed(c), n)
      }
      var order = {
        val o = readOrder(dir)
        o.foreach(c => require(!dropNames.contains(c),
          s"cannot drop '$c': it is a write_order column — clear the " +
            "property first"))
        o.map(renamed)
      }
      var bloomBy = readBloomBy(dir)
        .filterNot(dropNames.contains).map(renamed)
      sets.foreach(s => s.property match {
        case "retain" => retain = s.value.trim.toInt
        case "stats_columns" =>
          statsCols = s.value.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case "cluster_by" =>
          clusterBy = s.value.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case "write_salt" => salt = Some(GraftCatalog.parseSalt(
          s.value, newSchema, AtomicTable.partCols(partCol)))
        case "write_order" => order = GraftCatalog.parseOrder(
          s.value, newSchema, AtomicTable.partCols(partCol))
        case "bloom_columns" =>
          bloomBy = s.value.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      })
      removes.foreach(_.property match {
        case "retain" => retain = DefaultRetain
        case "stats_columns" => statsCols = Nil
        case "cluster_by" => clusterBy = Nil
        case "write_salt" => salt = None
        case "write_order" => order = Nil
        case "bloom_columns" => bloomBy = Nil
      })
      require(retain >= 1, s"retain must be >= 1, got $retain")
      val pcols = AtomicTable.partCols(partCol)
      statsCols.foreach { c =>
        require(newSchema.fieldNames.contains(c),
          s"stats column '$c' not in schema")
        require(!pcols.contains(c),
          "stats_columns must not include a partition column")
      }
      clusterBy.foreach { c =>
        require(newSchema.fieldNames.contains(c),
          s"cluster column '$c' not in schema")
        require(!pcols.contains(c),
          "cluster_by must not include a partition column")
      }
      require(salt.isEmpty || order.isEmpty,
        "write_salt and write_order are mutually exclusive")
      bloomBy.foreach { c =>
        require(newSchema.fieldNames.contains(c),
          s"bloom column '$c' not in schema")
        require(!pcols.contains(c),
          "bloom_columns must not include a partition column")
      }
      // durable evolution markers ride a properties-only commit, landed
      // BEFORE the meta flip: a crash in between leaves inert aliases
      // (keyed by names not yet in the schema), never a schema reading
      // old files without its alias. Skipped when the table has no
      // commits — nothing on disk carries the old name yet.
      if ((renamePairs.nonEmpty || dropNames.nonEmpty) &&
          AtomicTable.currentVersion(dir).isDefined) {
        val prevDropped = tableProps.get(GraftSource.DroppedColsProperty)
          .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
        val evolveProps =
          renamePairs.map { case (old, nw) =>
            (GraftSource.RenamePrefix + nw) -> old }.toMap ++
          (if (dropNames.isEmpty) Map.empty[String, String]
           else Map(GraftSource.DroppedColsProperty ->
             (prevDropped ++ dropNames).distinct.mkString(","))) ++
          // delete-key contract follows the rename (vectors proven
          // folded above), so later MOR deletes key on the new name
          (if (dvKeys.exists(renameMap.contains))
            Map(AtomicTable.DeleteKeysProperty ->
              tableProps(AtomicTable.DeleteKeysProperty)
                .split(",").toSeq.map(renamed).mkString(","))
           else Map.empty[String, String])
        AtomicTable.commitManifest(dir, Map.empty, properties = evolveProps,
          retain = retain, operation = "evolve")
        ()
      }
      writeMeta(dir, newSchema, partCol, retain, statsCols,
        clusterBy = clusterBy, writeSalt = salt, writeOrder = order,
        bloomBy = bloomBy)
    }
    loadTable(ident)
  }

  /** PARTITION-SPEC EVOLUTION for a declared table: rewrite the layout
    * ([[AtomicTable.repartitionTable]], one optimistic full-table
    * rewrite) and update the declared meta so every later catalog
    * write stages under the new spec. Data first: if the rewrite
    * aborts on a concurrent commit, the meta is untouched. */
  def repartitionDeclaredTable(spark: org.apache.spark.sql.SparkSession,
      ident: Identifier, newSpec: String): Unit = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val (schema, _, retain, statsCols) = readMeta(dir).getOrElse(
      throw new IllegalArgumentException(
        s"$ident is not a declared table — use AtomicTable.repartitionTable"))
    val clusterBy = readClusterBy(dir)
    AtomicTable.partCols(newSpec).foreach { c =>
      // a SYNTHETIC level (<col>_bucketN / _days / _months / _years /
      // _truncW) evolves a table TO a bucket/transform layout — its
      // SOURCE column must exist and support the transform; the level
      // itself never is (and never becomes) a data column
      val synthetic = !schema.fieldNames.contains(c) &&
        (GraftBuckets.level(c) match {
          case Some((src, _)) =>
            require(schema.fieldNames.contains(src),
              s"bucket source '$src' is not in the table schema")
            require(GraftBuckets.supportedType(schema(src).dataType),
              s"bucket is not defined over ${schema(src).dataType.catalogString}")
            true
          case None => GraftTransforms.level(c) match {
            case Some(l) =>
              require(schema.fieldNames.contains(l.src),
                s"transform source '${l.src}' is not in the table schema")
              require(GraftTransforms.supportedType(l.kind, schema(l.src).dataType),
                s"${GraftTransforms.kindName(l.kind)} is not defined over " +
                  schema(l.src).dataType.catalogString)
              true
            case None => false
          }
        })
      require(synthetic || schema.fieldNames.contains(c),
        s"partition column '$c' is not in the table schema")
      require(!statsCols.contains(c),
        s"'$c' is a stats column; drop it from stats_columns first")
      require(!clusterBy.contains(c),
        s"'$c' is a cluster column; drop it from cluster_by first")
    }
    AtomicTable.repartitionTable(spark, dir.toString, schema, newSpec,
      retain = retain)
    writeMeta(dir, schema, AtomicTable.partCols(newSpec).mkString(","),
      retain, statsCols, clusterBy = clusterBy)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else { deleteRecursively(dir); true }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!isTable(tableDir(from))) throw new NoSuchTableException(from)
    if (isTable(tableDir(to))) throw new TableAlreadyExistsException(to)
    if (!Files.isDirectory(tableDir(to).getParent))
      throw new NoSuchNamespaceException(to.namespace())
    Files.move(tableDir(from), tableDir(to))
    ()
  }

  // -------------------------------------------------------- procedures

  /** `CALL <cat>.system.table_changes(...)` — see
    * [[GraftTableChangesProcedure]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    (ident.namespace().toSeq, ident.name()) match {
      case (Seq("system"), "table_changes") =>
        new GraftTableChangesProcedure(this)
      case (Seq("system"), "compact") => GraftMaintenanceProcedures.compact(this)
      case (Seq("system"), "vacuum") => GraftMaintenanceProcedures.vacuum(this)
      case (Seq("system"), "rollback") => GraftMaintenanceProcedures.rollback(this)
      case (Seq("system"), "clone") => GraftMaintenanceProcedures.clone(this)
      case (Seq("system"), "analyze") => GraftMaintenanceProcedures.analyze(this)
      case (Seq("system"), "create_mv") => GraftMvProcedures.createMv(this)
      case (Seq("system"), "refresh_mv") => GraftMvProcedures.refreshMv(this)
      case (Seq("system"), "rebuild_blooms") =>
        GraftMaintenanceProcedures.rebuildBlooms(this)
      case (Seq("system"), "tag") => GraftMaintenanceProcedures.tag(this)
      case (Seq("system"), "untag") => GraftMaintenanceProcedures.untag(this)
      case _ => throw new IllegalArgumentException(
        s"unknown procedure $ident — graft provides system.{table_changes," +
          "compact,vacuum,rollback,clone,analyze,create_mv,refresh_mv," +
          "tag,untag,rebuild_blooms}")
    }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("table_changes", "compact", "vacuum", "rollback", "clone",
        "analyze", "create_mv", "refresh_mv", "tag", "untag",
        "rebuild_blooms")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  /** FunctionCatalog: serves the `bucket` transform function. Spark's
    * storage-partitioned-join machinery resolves a scan-reported
    * `bucket(N, col)` partitioning by loading `bucket` from the table's
    * catalog with an EMPTY namespace (V2ExpressionUtils.loadV2FunctionOpt)
    * — without this, a bucketed table's KeyGroupedPartitioning is
    * unresolvable and every join falls back to shuffles. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name() match {
      case "bucket" => GraftBucketFunction
      case "hours" => new GraftTimeFunction(GraftTransforms.Hours)
      case "days" => new GraftTimeFunction(GraftTransforms.Days)
      case "months" => new GraftTimeFunction(GraftTransforms.Months)
      case "years" => new GraftTimeFunction(GraftTransforms.Years)
      case "truncate" => new GraftTruncateFunction
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array("bucket", "hours", "days", "months", "years", "truncate")
        .map(Identifier.of(Array.empty, _))
    else Array.empty

  private def identOf(tbl: String): Identifier = {
    val segs = tbl.split("\\.").toSeq
    require(segs.nonEmpty && segs.forall(_.nonEmpty),
      s"bad table identifier '$tbl' — expected 'namespace.table'")
    Identifier.of(segs.init.toArray, segs.last)
  }

  /** Resolve a `db.t`-style identifier (relative to this catalog) to
    * its table dir and DECLARED schema, for the changefeed procedure. */
  private[sources] def resolveForChanges(tbl: String): (String, StructType) = {
    val ident = identOf(tbl)
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val schema = readMeta(dir).map(_._1).getOrElse(
      GraftSource.inferredSchema(new Configuration(), dir.toString))
    (dir.toString, schema)
  }

  /** Resolve a `db.t` identifier to the dir a NEW table (e.g. an
    * incremental view) may be created at: the namespace must exist, the
    * table must not. */
  private[sources] def dirForNew(tbl: String): Path = {
    val ident = identOf(tbl)
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    if (!Files.isDirectory(dir.getParent))
      throw new NoSuchNamespaceException(ident.namespace())
    dir
  }

  /** Maintenance-grade resolution of a `db.t` identifier: table dir,
    * declared (or inferred) schema, partition spec, retention, and
    * zone-map stats columns — everything the `system.*` maintenance
    * procedures need to call the [[AtomicTable]] API under the same
    * contract the declared table's own writes use. */
  private[sources] def resolveMaintenance(tbl: String)
      : (Path, StructType, String, Int, Seq[String]) = {
    val ident = identOf(tbl)
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    readMeta(dir) match {
      case Some((schema, pcol, retain, stats)) =>
        (dir, schema, pcol, retain, stats)
      case None =>
        val schema = GraftSource.inferredSchema(new Configuration(), dir.toString)
        val pcol = AtomicTable.rootOpt(dir).filter(_.partitions.nonEmpty)
          .map(GraftSource.partitionColOf).getOrElse("")
        (dir, schema, pcol, DefaultRetain, Nil)
    }
  }

  /** Clone `srcT`'s retained snapshot (current when `version` is None)
    * as a brand-new INDEPENDENT table `dstT` in this catalog:
    * [[AtomicTable.cloneTable]] hard-links the immutable data bytes
    * (zero copied bytes on one filesystem), and the declared meta
    * carries over so the clone keeps the source's schema/partition/
    * stats contracts. */
  private[sources] def cloneInto(srcT: String, dstT: String,
      version: Option[Long]): AtomicTable.Manifest = {
    val srcIdent = identOf(srcT)
    val dstIdent = identOf(dstT)
    val srcDir = tableDir(srcIdent)
    if (!isTable(srcDir)) throw new NoSuchTableException(srcIdent)
    val dstDir = tableDir(dstIdent)
    if (isTable(dstDir)) throw new TableAlreadyExistsException(dstIdent)
    if (!Files.isDirectory(dstDir.getParent))
      throw new NoSuchNamespaceException(dstIdent.namespace())
    val retain = readMeta(srcDir).map(_._3).getOrElse(DefaultRetain)
    val m = AtomicTable.cloneTable(srcDir, dstDir, version, retain)
    if (Files.exists(metaFile(srcDir))) {
      Files.copy(metaFile(srcDir), metaFile(dstDir))
      ()
    }
    m
  }

  // -------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    val dir = nsDir(ns)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(ns)
    val s = Files.list(dir)
    try s.iterator.asScala
      .filter(p => Files.isDirectory(p) && !isTable(p) &&
        !p.getFileName.toString.startsWith("_"))
      .map(p => ns :+ p.getFileName.toString).toArray
    finally s.close()
  }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.isEmpty || (Files.isDirectory(nsDir(ns)) && !isTable(nsDir(ns)))

  override def loadNamespaceMetadata(ns: Array[String]): JMap[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    Map("location" -> nsDir(ns).toString).asJava
  }

  override def createNamespace(ns: Array[String],
      metadata: JMap[String, String]): Unit = {
    Files.createDirectories(nsDir(ns))
    ()
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(ns)
    if (!namespaceExists(ns) || ns.isEmpty) false
    else {
      if (!cascade) {
        val s = Files.list(dir)
        val empty = try !s.iterator.hasNext finally s.close()
        require(empty, s"namespace ${ns.mkString(".")} is not empty")
      }
      deleteRecursively(dir)
      true
    }
  }

  // ------------------------------------------------------------- metas

  /** `_table.json`: the declared schema (Spark's own JSON form), the
    * partition column, the retention window, and the zone-map columns —
    * written at CREATE, evolved only by ALTER ADD COLUMNS. */
  private def writeMeta(dir: Path, schema: StructType, partCol: String,
      retain: Int, statsCols: Seq[String] = Nil,
      createNew: Boolean = false, clusterBy: Seq[String] = Nil,
      writeSalt: Option[(String, Int)] = None,
      writeOrder: Seq[String] = Nil,
      bloomBy: Seq[String] = Nil): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("schema", schema.json)
    node.put("partition", partCol)
    node.put("retain", retain)
    if (statsCols.nonEmpty) node.put("stats", statsCols.mkString(","))
    if (clusterBy.nonEmpty) node.put("cluster", clusterBy.mkString(","))
    writeSalt.foreach { case (c, n) => node.put("salt", s"$c:$n") }
    if (writeOrder.nonEmpty) node.put("order", writeOrder.mkString(","))
    if (bloomBy.nonEmpty) node.put("bloom", bloomBy.mkString(","))
    val bytes = node.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (createNew)
      Files.write(metaFile(dir), bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
    else Files.write(metaFile(dir), bytes)
    ()
  }

  private def readMeta(dir: Path): Option[(StructType, String, Int, Seq[String])] = {
    val f = metaFile(dir)
    if (!Files.exists(f)) None
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = mapper.readTree(Files.readAllBytes(f))
      Some((DataType.fromJson(n.get("schema").asText).asInstanceOf[StructType],
        n.get("partition").asText,
        Option(n.get("retain")).map(_.asInt).getOrElse(DefaultRetain),
        Option(n.get("stats")).map(_.asText.split(",").toSeq).getOrElse(Nil)))
    }
  }

  /** Declared compaction cluster columns (TBLPROPERTIES 'cluster_by'):
    * CALL system.compact range-clusters each partition's files on them
    * so file-level zone maps prune range reads inside big partitions.
    * Kept out of readMeta's tuple — only the maintenance path needs it. */
  private[sources] def readClusterBy(dir: Path): Seq[String] = {
    val f = metaFile(dir)
    if (!Files.exists(f)) Nil
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Option(mapper.readTree(Files.readAllBytes(f)).get("cluster"))
        .map(_.asText.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil)
    }
  }

  /** Declared write fan-out (TBLPROPERTIES 'write_salt'='col:N'). */
  private[sources] def readSalt(dir: Path): Option[(String, Int)] = {
    val f = metaFile(dir)
    if (!Files.exists(f)) None
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Option(mapper.readTree(Files.readAllBytes(f)).get("salt"))
        .map(_.asText.split(":", 2)).collect {
          case Array(c, n) => (c, n.toInt)
        }
    }
  }

  /** Declared bloom-sidecar columns ('bloom_columns'='a,b'). */
  private[sources] def readBloomBy(dir: Path): Seq[String] = {
    val f = metaFile(dir)
    if (!Files.exists(f)) Nil
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Option(mapper.readTree(Files.readAllBytes(f)).get("bloom"))
        .map(_.asText.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil)
    }
  }

  /** Declared range-clustered write order ('write_order'='a,b'). */
  private[sources] def readOrder(dir: Path): Seq[String] = {
    val f = metaFile(dir)
    if (!Files.exists(f)) Nil
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Option(mapper.readTree(Files.readAllBytes(f)).get("order"))
        .map(_.asText.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator.asScala.toSeq.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }
}

/** The `$history` metadata table: one row per retained commit, newest
  * first, materialized from the manifests at load time (a handful of
  * tiny JSON reads — deliberately NOT distributed). */
private[sources] class GraftHistoryTable(tableName: String,
    commits: Seq[AtomicTable.CommitInfo])
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read._
  import org.apache.spark.sql.types._

  override def name(): String = tableName
  override def schema(): StructType = GraftHistoryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = GraftHistoryTable.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftHistoryPartition(commits))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftHistoryReaderFactory
      }
    }
}

private[sources] object GraftHistoryTable {
  import org.apache.spark.sql.types._
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("num_partitions", IntegerType, nullable = false),
    StructField("num_rows", LongType, nullable = true)))
}

private[sources] final case class GraftHistoryPartition(
    commits: Seq[AtomicTable.CommitInfo])
  extends org.apache.spark.sql.connector.read.InputPartition

private[sources] object GraftHistoryReaderFactory
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[GraftHistoryPartition].commits.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val c = it.next()
        cur = new GenericInternalRow(Array[Any](c.version, c.tsMs * 1000L,
          UTF8String.fromString(c.operation), c.numPartitions,
          c.rows.map(Long.box).orNull))
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

private[sources] final case class GraftDetailRow(location: String,
    version: Long, numPartitions: Int, numRows: Option[Long],
    deleteVectors: Int, partitionColumn: String, retain: Int,
    statsColumns: String)

/** The `$detail` metadata table: one row of table-level facts (DESCRIBE
  * DETAIL) — current version, partition count, zone-map row total, the
  * declared partition/retention/stats contract. Manifest-only. */
private[sources] class GraftDetailTable(tableName: String, row: GraftDetailRow)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read._
  import org.apache.spark.sql.types._

  override def name(): String = tableName
  override def schema(): StructType = GraftDetailTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = GraftDetailTable.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftDetailPartition(row))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftDetailReaderFactory
      }
    }
}

private[sources] object GraftDetailTable {
  import org.apache.spark.sql.types._
  val Schema: StructType = StructType(Seq(
    StructField("location", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("num_partitions", IntegerType, nullable = false),
    StructField("num_rows", LongType, nullable = true),
    StructField("delete_vectors", IntegerType, nullable = false),
    StructField("partition_column", StringType, nullable = false),
    StructField("retain", IntegerType, nullable = false),
    StructField("stats_columns", StringType, nullable = false)))
}

private[sources] final case class GraftDetailPartition(row: GraftDetailRow)
  extends org.apache.spark.sql.connector.read.InputPartition

private[sources] object GraftDetailReaderFactory
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private var done = false
      private val r = p.asInstanceOf[GraftDetailPartition].row
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(r.location), r.version, r.numPartitions,
        r.numRows.map(Long.box).orNull, r.deleteVectors,
        UTF8String.fromString(r.partitionColumn), r.retain,
        UTF8String.fromString(r.statsColumns)))
      override def close(): Unit = ()
    }
}

private[sources] final case class GraftPartitionsRow(partition: String,
    dir: String, numDirs: Int, rows: Option[Long], mins: Map[String, String],
    maxs: Map[String, String], deleteVectors: Int)

/** The `$partitions` metadata table: the current manifest's layout and
  * zone maps, one row per partition — what the pruned reads consult. */
private[sources] class GraftPartitionsTable(tableName: String,
    parts: Seq[GraftPartitionsRow])
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read._
  import org.apache.spark.sql.types._

  override def name(): String = tableName
  override def schema(): StructType = GraftPartitionsTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = GraftPartitionsTable.Schema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftPartitionsPartition(parts))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftPartitionsReaderFactory
      }
    }
}

private[sources] object GraftPartitionsTable {
  import org.apache.spark.sql.types._
  val Schema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("dir", StringType, nullable = false),
    StructField("num_dirs", IntegerType, nullable = false),
    StructField("num_rows", LongType, nullable = true),
    StructField("mins", MapType(StringType, StringType), nullable = false),
    StructField("maxs", MapType(StringType, StringType), nullable = false),
    StructField("delete_vectors", IntegerType, nullable = false)))
}

private[sources] final case class GraftPartitionsPartition(
    parts: Seq[GraftPartitionsRow])
  extends org.apache.spark.sql.connector.read.InputPartition

private[sources] object GraftPartitionsReaderFactory
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private def mapData(m: Map[String, String])
      : org.apache.spark.sql.catalyst.util.MapData = {
    val ks = m.keys.toSeq.sorted
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(ks.map(k => UTF8String.fromString(m(k))).toArray[Any]))
  }

  override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[GraftPartitionsPartition].parts.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val r = it.next()
        cur = new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.partition), UTF8String.fromString(r.dir),
          r.numDirs, r.rows.map(Long.box).orNull, mapData(r.mins),
          mapData(r.maxs), r.deleteVectors))
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

object GraftCatalog {
  /** Parse + validate a 'write_salt'='col:N' property. The salt column
    * must hash deterministically (the bucket function's type set) and
    * must not be a partition level (salting by the partition key is a
    * no-op — every row of a partition shares it). */
  private[sources] def parseSalt(spec: String, schema: StructType,
      partCols: Seq[String]): (String, Int) = {
    val (c, n) = spec.split(":", 2) match {
      case Array(col, num) => (col.trim, num.trim.toInt)
      case _ => throw new IllegalArgumentException(
        s"write_salt takes '<col>:<n>', got '$spec'")
    }
    require(n > 1, s"write_salt fan-out must be > 1, got $n")
    require(schema.fieldNames.contains(c),
      s"write_salt column '$c' is not in the table schema")
    require(GraftBuckets.supportedType(schema(c).dataType),
      s"write_salt is not defined over ${schema(c).dataType.catalogString}")
    require(!partCols.contains(c),
      "write_salt must not be a partition column")
    (c, n)
  }

  /** Parse + validate 'write_order'='a[,b...]'. */
  private[sources] def parseOrder(spec: String, schema: StructType,
      partCols: Seq[String]): Seq[String] = {
    val cols = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(cols.nonEmpty, "write_order needs at least one column")
    cols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"write_order column '$c' is not in the table schema")
      require(!partCols.contains(c),
        "write_order must not include a partition column")
    }
    cols
  }

  /** The DECLARED schema's field names, when `dir` is a catalog-created
    * table (`_table.json` present) — path-written tables return None.
    * Lets non-catalog readers distinguish a LIVE column from one merely
    * named by an evolution property: a crash between the evolve
    * properties commit and the meta flip leaves a `graft.rename.*`
    * alias whose old name is still declared (the rename never took
    * effect), and staleness checks must treat that orphan as inert. */
  private[graft] def declaredFieldNames(dir: java.nio.file.Path)
      : Option[Set[String]] = {
    val f = dir.resolve("_table.json")
    if (!java.nio.file.Files.exists(f)) None
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = mapper.readTree(java.nio.file.Files.readAllBytes(f))
      Some(org.apache.spark.sql.types.DataType
        .fromJson(n.get("schema").asText).asInstanceOf[StructType]
        .fieldNames.toSet)
    }
  }

  /** Default commit-retention for catalog tables: deep enough that
    * VERSION AS OF and changefeed restarts have a real window out of the
    * box, small enough that GC still reclaims (Delta defaults to ~30
    * days of log for the same reason). Override per table with
    * TBLPROPERTIES ('retain'='N'). */
  val DefaultRetain = 8
}

/** Compile-time anchor for [[Expressions]] (identity transforms built by
  * Spark's parser are matched structurally above). */
private object GraftCatalogTransforms {
  def identity(col: String): Transform = Expressions.identity(col)
}
