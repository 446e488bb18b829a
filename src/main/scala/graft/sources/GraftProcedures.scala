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
