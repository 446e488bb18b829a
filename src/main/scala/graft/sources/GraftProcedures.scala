package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the operations that need arguments a table
  * identifier cannot carry — Spark 4's DSv2 [[BoundProcedure]] protocol
  * (`CALL cat.system.proc(...)`), the same shape Iceberg's stored
  * procedures use.
  *
  * `table_changes` is the SQL twin of [[graft.etl.ChangeFeed.changes]]
  * (full-fidelity row-level CDC: update pre/post images, DV preimages,
  * drops — not just the append-only `readChangeFeed` scan option). A
  * procedure's result must be a driver-side [[LocalScan]], so the
  * changes themselves are NOT returned through the CALL: instead the
  * procedure registers the lazy, fully-distributed change DataFrame as
  * a TEMP VIEW and returns its name — Iceberg's
  * `create_changelog_view` contract, which keeps the heavy diff on the
  * executors no matter how large the change volume is:
  *
  * {{{
  * CALL cat.system.table_changes('db.orders', 2, 5, 'o_orderkey', 'ch')
  * SELECT * FROM ch WHERE _change_type = 'update_postimage'
  * }}}
  */
private[sources] class GraftTableChangesProcedure(catalog: GraftCatalog)
    extends UnboundProcedure {
  override def name(): String = "table_changes"
  override def description(): String =
    "register the row-level changes of versions [starting_version, " +
      "ending_version] as a temp view; returns the view name"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = "table_changes"
    override def description(): String = GraftTableChangesProcedure.this.description()
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table identifier inside this catalog, e.g. 'db.orders'").build(),
      ProcedureParameter.in("starting_version", LongType).build(),
      ProcedureParameter.in("ending_version", LongType).build(),
      ProcedureParameter.in("key_cols", StringType)
        .comment("comma-joined key columns for update classification; " +
          "'' degrades rewrites to delete+insert set semantics").build(),
      ProcedureParameter.in("view", StringType)
        .comment("temp view name to register the change frame under").build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val tbl = input.getUTF8String(0).toString
      val from = input.getLong(1)
      val to = input.getLong(2)
      val keyCols = input.getUTF8String(3).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val view = input.getUTF8String(4).toString
      val (dir, schema) = catalog.resolveForChanges(tbl)
      val changes = graft.etl.ChangeFeed.changes(
        spark, dir, schema, from, to, keyCols)
      changes.createOrReplaceTempView(view)
      val out = new GenericInternalRow(
        Array[Any](UTF8String.fromString(view), from, to))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = GraftTableChangesProcedure.Result
        override def rows(): Array[InternalRow] = Array(out)
      }).iterator()
    }
  }
}

private[sources] object GraftTableChangesProcedure {
  val Result: StructType = StructType(Seq(
    StructField("changelog_view", StringType, nullable = false),
    StructField("starting_version", LongType, nullable = false),
    StructField("ending_version", LongType, nullable = false)))
}

/** One-row-result procedure scaffold: every maintenance procedure is
  * "parse args, call the [[graft.etl.AtomicTable]] maintenance API,
  * report a metadata row" — unlike `table_changes` there is no
  * distributed result to smuggle out, so a [[LocalScan]] row IS the
  * whole answer. */
private[sources] class GraftSimpleProcedure(procName: String, desc: String,
    params: Array[ProcedureParameter], result: StructType,
    run: InternalRow => Array[Any]) extends UnboundProcedure {
  override def name(): String = procName
  override def description(): String = desc
  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = params
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = new GenericInternalRow(run(input))
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = result
        override def rows(): Array[InternalRow] = Array(out)
      }).iterator()
    }
  }
}

/** The `CALL <cat>.system.*` maintenance surface — the operations a
  * 100 TB warehouse schedules nightly, each already implemented (and
  * scale-argued) in [[graft.etl.AtomicTable]], here made reachable
  * without Scala. The Iceberg analogs: `rewrite_data_files`
  * (→ compact), `remove_orphan_files` (→ vacuum),
  * `rollback_to_snapshot` (→ rollback), and snapshot/`CREATE TABLE
  * CLONE` (→ clone). Compaction is the TARGETED form on purpose:
  * cost ∝ fragmented partitions, never table size. */
private[sources] object GraftMaintenanceProcedures {

  private def tableParam = ProcedureParameter.in("table", StringType)
    .comment("table identifier inside this catalog, e.g. 'db.orders'").build()

  /** `compact('db.t', min_files[, files_per_partition])` — rewrite ONLY
    * the partitions holding `min_files`+ data files (small-file debt);
    * healthy partitions carry forward by reference. A table declaring
    * `cluster_by` range-clusters each rewritten partition's files on
    * those columns (disjoint per-file bounds → file-level zone maps
    * prune range reads inside big partitions — the OPTIMIZE-with-
    * clustering shape); `files_per_partition` spreads very large
    * partitions, default 1. */
  def compact(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "compact",
    "rewrite partitions with at least min_files data files down to " +
      "files_per_partition (cluster_by tables range-cluster them)",
    Array(tableParam,
      ProcedureParameter.in("min_files", LongType)
        .comment("only partitions with this many files or more rewrite").build(),
      ProcedureParameter.in("files_per_partition", LongType)
        .defaultValue("1")
        .comment("target files per rewritten partition").build()),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_before", LongType, nullable = false),
      StructField("files_after", LongType, nullable = false))),
    { input =>
      val spark = SparkSession.active
      val tbl = input.getUTF8String(0).toString
      val (dir, schema, pcol, retain, statsCols) =
        catalog.resolveMaintenance(tbl)
      require(pcol.nonEmpty,
        s"$dir has no partition spec — partition-targeted compaction " +
          "needs a partitioned table")
      val before = graft.etl.AtomicTable.dataFileCount(dir)
      val m = graft.etl.AtomicTable.compactFragmented(spark, dir.toString,
        schema, pcol, minFiles = input.getLong(1).toInt,
        statsColumns = statsCols, retain = retain,
        clusterBy = catalog.readClusterBy(dir),
        filesPerPartition = input.getLong(2).toInt,
        bloomBy = catalog.readBloomBy(dir))
      Array[Any](m.version, before, graft.etl.AtomicTable.dataFileCount(dir))
    })

  /** `vacuum('db.t', older_than_ms)` — reclaim never-committed staging
    * dirs no retained manifest references (crash leftovers, aborted
    * optimistic commits); the age gate keeps in-flight writers safe. */
  def vacuum(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "vacuum",
    "reclaim unreferenced staging dirs older than older_than_ms",
    Array(tableParam,
      ProcedureParameter.in("older_than_ms", LongType)
        .comment("only dirs untouched for this long reclaim (0 = all)").build()),
    StructType(Seq(
      StructField("reclaimed_dirs", LongType, nullable = false))),
    { input =>
      val (dir, _, _, _, _) =
        catalog.resolveMaintenance(input.getUTF8String(0).toString)
      Array[Any](graft.etl.AtomicTable.vacuum(dir, input.getLong(1)).toLong)
    })

  /** `rollback('db.t', version)` — commit a NEW version whose content
    * is exactly the retained `version`'s (restore; history preserved,
    * zero data bytes moved). */
  def rollback(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "rollback",
    "restore the table to a retained version as a new commit",
    Array(tableParam,
      ProcedureParameter.in("version", LongType)
        .comment("retained version whose content the new commit restores").build()),
    StructType(Seq(
      StructField("restored_version", LongType, nullable = false),
      StructField("current_version", LongType, nullable = false))),
    { input =>
      val (dir, _, _, retain, _) =
        catalog.resolveMaintenance(input.getUTF8String(0).toString)
      val v = input.getLong(1)
      val m = graft.etl.AtomicTable.restore(dir, v, retain)
      Array[Any](v, m.version)
    })

  /** `analyze('db.t', 'cols')` — backfill partition- and FILE-level
    * zone maps over the current snapshot (one column-pruned scan, a
    * stats-only commit, zero data bytes moved): enables metadata and
    * per-file data skipping on tables written before stats were
    * declared. '' analyzes the table's declared stats_columns. */
  def analyze(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "analyze",
    "backfill partition- and file-level zone maps for the given columns",
    Array(tableParam,
      ProcedureParameter.in("columns", StringType)
        .comment("comma-joined columns to analyze; '' = the table's " +
          "declared stats_columns").build()),
    StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("files_analyzed", LongType, nullable = false))),
    { input =>
      val spark = SparkSession.active
      val (dir, schema, pcol, retain, declared) =
        catalog.resolveMaintenance(input.getUTF8String(0).toString)
      val cols = input.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq match {
          case Nil => declared
          case cs => cs
        }
      require(cols.nonEmpty,
        s"$dir declares no stats_columns — pass the columns to analyze")
      require(pcol.nonEmpty,
        s"$dir has no partition spec — nothing to attach zone maps to")
      val m = graft.etl.AtomicTable.analyzeStats(spark, dir.toString,
        schema, pcol, cols, retain)
      Array[Any](m.version,
        m.fileStats.valuesIterator.map(_.size.toLong).sum)
    })

  /** `rebuild_blooms('db.t', 'cols')` — backfill bloom sidecars for a
    * table written before `bloom_columns` was declared (the
    * [[analyze]] analog for the bloom index): one column-pruned scan
    * builds each committed file's filter, and a properties-only commit
    * announces the covered columns to the scan. '' uses the declared
    * bloom_columns. */
  def rebuildBlooms(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "rebuild_blooms",
    "backfill per-file bloom sidecars for the given columns",
    Array(tableParam,
      ProcedureParameter.in("columns", StringType)
        .comment("comma-joined columns; '' = the declared bloom_columns").build()),
    StructType(Seq(
      StructField("version", LongType, nullable = false))),
    { input =>
      val spark = SparkSession.active
      val (dir, schema, _, retain, _) =
        catalog.resolveMaintenance(input.getUTF8String(0).toString)
      val cols = input.getUTF8String(1).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq match {
          case Nil => catalog.readBloomBy(dir)
          case cs => cs
        }
      require(cols.nonEmpty,
        s"$dir declares no bloom_columns — pass the columns to index")
      val m = graft.etl.AtomicTable.rebuildBlooms(spark, dir.toString,
        schema, cols, retain)
      Array[Any](m.version)
    })

  /** `tag('db.t', 'name', version)` — pin a retained snapshot under a
    * durable name (Iceberg tags): GC keeps the tagged version's
    * manifest and data alive until `untag`, and `VERSION AS OF 'name'`
    * resolves it — the reproducibility primitive for "the exact corpus
    * snapshot this training run read". version <= 0 tags the current. */
  def tag(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "tag",
    "pin a retained version under a durable snapshot name",
    Array(tableParam,
      ProcedureParameter.in("name", StringType)
        .comment("tag name; resolvable as VERSION AS OF '<name>'").build(),
      ProcedureParameter.in("version", LongType)
        .comment("retained version to pin; <= 0 pins the current").build()),
    StructType(Seq(
      StructField("tagged_version", LongType, nullable = false),
      StructField("current_version", LongType, nullable = false))),
    { input =>
      val (dir, _, _, retain, _) =
        catalog.resolveMaintenance(input.getUTF8String(0).toString)
      val v0 = input.getLong(2)
      val v = if (v0 <= 0)
        graft.etl.AtomicTable.currentVersion(dir).getOrElse(
          throw new IllegalArgumentException(s"$dir has no commits"))
      else v0
      val m = graft.etl.AtomicTable.tag(dir,
        input.getUTF8String(1).toString, v, retain)
      Array[Any](v, m.version)
    })

  /** `untag('db.t', 'name')` — remove a tag; the pinned version ages
    * out through normal retention at the next commit's GC. */
  def untag(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "untag",
    "remove a snapshot tag (the version then ages out normally)",
    Array(tableParam,
      ProcedureParameter.in("name", StringType).build()),
    StructType(Seq(
      StructField("current_version", LongType, nullable = false))),
    { input =>
      val (dir, _, _, retain, _) =
        catalog.resolveMaintenance(input.getUTF8String(0).toString)
      val m = graft.etl.AtomicTable.untag(dir,
        input.getUTF8String(1).toString, retain)
      Array[Any](m.version)
    })

  /** `clone('db.t', 'db.t2', version)` — materialize a retained
    * snapshot (≤0 = current) as a brand-new INDEPENDENT table: data
    * bytes hard-linked, declared meta copied, separate lifetime. */
  def clone(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "clone",
    "clone a retained snapshot as a new independent table",
    Array(tableParam,
      ProcedureParameter.in("target", StringType)
        .comment("new table identifier inside this catalog").build(),
      ProcedureParameter.in("version", LongType)
        .comment("source version to clone; <= 0 clones the current").build()),
    StructType(Seq(
      StructField("target_version", LongType, nullable = false),
      StructField("cloned_partitions", LongType, nullable = false))),
    { input =>
      val v = input.getLong(2)
      val m = catalog.cloneInto(input.getUTF8String(0).toString,
        input.getUTF8String(1).toString, if (v <= 0) None else Some(v))
      Array[Any](m.version, m.partitions.size.toLong)
    })
}

/** The incremental-materialized-view SQL surface — `CALL` twins of
  * [[graft.etl.IncrementalView]] (the Databricks/Materialize shape:
  * define an aggregate once, refresh it from the change stream, never
  * re-aggregate the source). The view lands as an ordinary graft table
  * inside this catalog, so `SELECT * FROM cat.db.mv` works directly;
  * `refresh_mv` can also register the RENDERED form (SQL SUM null
  * semantics) as a temp view, like `table_changes` does. */
private[sources] object GraftMvProcedures {

  private def tableParam = ProcedureParameter.in("table", StringType)
    .comment("view identifier inside this catalog, e.g. 'db.mv'").build()

  /** `create_mv('db.mv', 'db.src', 'g1,g2', 'a,b', 'e1;e2', 'part',
    * 'k1,k2')` — create view `db.mv` over source `db.src`: group by the
    * comma-joined `group_cols`, maintain one exact SUM per alias in
    * `sum_aliases` (comma-joined) of the matching `;`-joined SQL
    * expression in `sum_exprs`, partition the view by `partition_col`
    * (must be group columns), and classify source rewrites by the
    * comma-joined `key_cols` ('' = set semantics). */
  def createMv(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "create_mv",
    "create an incrementally-maintained aggregate view over a source table",
    Array(tableParam,
      ProcedureParameter.in("source", StringType)
        .comment("source table identifier inside this catalog").build(),
      ProcedureParameter.in("group_cols", StringType)
        .comment("comma-joined group-by columns").build(),
      ProcedureParameter.in("sum_aliases", StringType)
        .comment("comma-joined result column names, one per sum").build(),
      ProcedureParameter.in("sum_exprs", StringType)
        .comment("';'-joined SQL expressions aggregated per group, " +
          "positionally matching sum_aliases; a 'min:' or 'max:' prefix " +
          "maintains that extreme instead of a sum, 'avg:<sum_alias>' " +
          "renders sum/count of a declared sum, 'approx:<expr>' " +
          "maintains a mergeable HLL distinct sketch").build(),
      ProcedureParameter.in("partition_col", StringType)
        .comment("view partition spec (group columns), e.g. 'g1' or 'g1,g2'").build(),
      ProcedureParameter.in("key_cols", StringType)
        .comment("comma-joined source key columns for update " +
          "classification; '' degrades rewrites to set semantics").build()),
    StructType(Seq(
      StructField("mv_version", LongType, nullable = false),
      StructField("source_version", LongType, nullable = false))),
    { input =>
      val spark = SparkSession.active
      val mvDir = catalog.dirForNew(input.getUTF8String(0).toString)
      val (srcDir, srcSchema) =
        catalog.resolveForChanges(input.getUTF8String(1).toString)
      def csv(i: Int): Seq[String] = input.getUTF8String(i).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val aliases = csv(3)
      val exprs = input.getUTF8String(4).toString
        .split(";").map(_.trim).filter(_.nonEmpty).toSeq
      require(aliases.size == exprs.size,
        s"sum_aliases (${aliases.size}) and sum_exprs (${exprs.size}) " +
          "must pair positionally")
      val (special, sums) = aliases.zip(exprs).partition(p =>
        p._2.startsWith("min:") || p._2.startsWith("max:") ||
          p._2.startsWith("avg:") || p._2.startsWith("approx:"))
      val m = graft.etl.IncrementalView.create(spark, srcDir, srcSchema,
        mvDir.toString, csv(2), sums,
        input.getUTF8String(5).toString, csv(6),
        extremes = special.collect {
          case (a, e) if e.startsWith("min:") || e.startsWith("max:") =>
            (a, e.substring(4), e.take(3)) },
        avgs = special.collect { case (a, e) if e.startsWith("avg:") =>
          (a, e.stripPrefix("avg:").trim) },
        sketches = special.collect { case (a, e) if e.startsWith("approx:") =>
          (a, e.stripPrefix("approx:").trim) })
      Array[Any](m.version,
        m.properties(graft.etl.IncrementalView.SourceVersionProperty).toLong)
    })

  /** `refresh_mv('db.mv', 'view_name')` — fold every source commit
    * since the last refresh into the view (cost bounded by change
    * volume; exactly-once — the applied version rides the commit).
    * A non-empty `view_name` also registers the RENDERED read (SQL
    * SUM null semantics) as a temp view of that name. */
  def refreshMv(catalog: GraftCatalog): UnboundProcedure = new GraftSimpleProcedure(
    "refresh_mv",
    "fold source changes since the last refresh into the view",
    Array(tableParam,
      ProcedureParameter.in("view_name", StringType)
        .comment("temp view to register the rendered view under; '' skips").build()),
    StructType(Seq(
      StructField("mv_version", LongType, nullable = false),
      StructField("from_version", LongType, nullable = false),
      StructField("to_version", LongType, nullable = false))),
    { input =>
      val spark = SparkSession.active
      val (dir, _) = catalog.resolveForChanges(input.getUTF8String(0).toString)
      val (m, from, to) = graft.etl.IncrementalView.refresh(spark, dir)
      val viewName = input.getUTF8String(1).toString
      if (viewName.nonEmpty)
        graft.etl.IncrementalView.read(spark, dir)
          .createOrReplaceTempView(viewName)
      Array[Any](m.version, from, to)
    })
}
