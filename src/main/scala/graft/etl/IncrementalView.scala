package graft.etl

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Incrementally-maintained materialized aggregate view over an
  * [[AtomicTable]] — the payoff of the row-level changefeed: a summary
  * table that stays exact under INSERT / MERGE / DELETE / compaction on
  * its source WITHOUT ever re-aggregating the source table.
  *
  * Classic self-maintainable IVM (SUM/COUNT algebra): every change row
  * of [[ChangeFeed.changes]] carries a sign (+1 for `insert` /
  * `update_postimage`, -1 for `delete` / `update_preimage`), the delta
  * aggregate is the signed SUM per group, and applying a delta is one
  * join against ONLY the view groups whose partitions the delta touches.
  * SUM/COUNT (and AVG = SUM/COUNT) are closed under this algebra.
  * MIN/MAX are not (a deleted extremum needs a source rescan) — they
  * are offered as a HYBRID instead ([[Definition.extremes]]): inserts
  * merge directly (monotone), deletes trigger a recompute bounded to
  * the affected groups by a broadcast semi-join, never the source.
  *
  * 100 TB shape: refresh cost is bounded by the CHANGE volume, never
  * source size — the feed diffs manifests (appended dirs scan-free,
  * rewrites one grouped join per commit), the delta aggregate shuffles
  * change rows only, and the view rewrite touches only the partitions
  * the delta's group keys land in (the view is partitioned by a group
  * column, so a one-day merge refreshes a one-day summary slice).
  *
  * Exactly-once: the applied source version rides the SAME manifest
  * commit as the refreshed rows (`graft.mv.source_version`), and the
  * commit is optimistic (`expectedVersion`) — a crashed refresh changes
  * nothing (re-run re-derives the same delta), a duplicate refresh
  * no-ops (version already applied), and concurrent refreshes cannot
  * double-apply (one loses the version claim).
  *
  * Exactness: SUM over double is order-dependent in IEEE arithmetic, so
  * an incrementally-maintained double sum can drift from a recompute by
  * last-ulp rounding. Callers who need bit-exactness use an exact
  * decimal expression (see [[graft.functions.Stable]]) — decimal
  * addition is associative and commutative, so delta application equals
  * recomputation exactly.
  *
  * Reference analog: the upsert-maintained summary the reference's
  * pipeline recomputes per run (`/root/reference/src/load.py:42-105`
  * re-derives load stats from scratch); here the summary is maintained
  * from the change stream instead. */
object IncrementalView {

  /** Manifest property holding the view definition (JSON). */
  val DefProperty = "graft.mv.def"

  /** Manifest property: the last SOURCE version folded into the view. */
  val SourceVersionProperty = "graft.mv.source_version"

  /** Internal liveness count: signed COUNT(*) per group — a group whose
    * count reaches zero leaves the view (and its partition, when it was
    * the last group, drops from the manifest in the same commit). */
  val RowsCol = "_mv_rows"

  /** Internal non-null contribution count of sum `alias` — what lets
    * the rendered sum return to SQL NULL when deletes remove every
    * non-null contributor (SUM over zero non-null rows is NULL). */
  def nCol(alias: String): String = s"${alias}__n"

  /** A view definition. `sums` are (alias, SQL expression) pairs summed
    * per group; `groupCols` must contain every partition column of
    * `partitionCol` (the view prunes its own rewrite by them);
    * `keyCols` upgrade the source feed's rewrite diffs from set
    * semantics to update classification (cheaper deltas, same algebra).
    * `mvSchema` is the view's materialized schema, fixed at create. */
  final case class Definition(source: String, sourceSchema: StructType,
      groupCols: Seq[String], sums: Seq[(String, String)],
      partitionCol: String, keyCols: Seq[String], retain: Int,
      mvSchema: StructType,
      extremes: Seq[(String, String, String)] = Nil,
      avgs: Seq[(String, String)] = Nil,
      sketches: Seq[(String, String)] = Nil)

  /** One extreme's aggregate function: "min" or "max" over its expr. */
  private def extremeAgg(f: String, e: Column): Column =
    if (f == "min") min(e) else max(e)

  /** `avgs` (alias -> SUM alias): AVG = SUM/COUNT is already CLOSED
    * under the signed-delta algebra — no new materialized state; the
    * avg renders at READ time from the maintained sum and its non-null
    * count, as a double (decimal→double conversion and IEEE division
    * are deterministic, so the rendered value is engine-stable).
    *
    * `sketches` (alias -> expr): APPROX_COUNT_DISTINCT as a mergeable
    * HLL sketch materialized as a BINARY view column. Inserts MERGE
    * (hll_union is the monoid); a sketch is not subtractable, so any
    * group a negative row touched recomputes from the source snapshot
    * — the SAME bounded broadcast-semi-join recompute path MIN/MAX
    * use. [[read]] exposes the estimate (long), never the bytes. */
  private def sketchAgg(e: Column): Column = hll_sketch_agg(e)

  /** The full aggregate of `df` in the view's materialized shape:
    * group columns, then per sum `alias` the zero-coalesced exact sum
    * and its non-null count `alias__n`, then each min/max `alias`
    * (nullable — NULL means no non-null contributor), then the group's
    * row count. */
  def aggregate(df: DataFrame, groupCols: Seq[String],
      sums: Seq[(String, String)],
      extremes: Seq[(String, String, String)] = Nil,
      sketches: Seq[(String, String)] = Nil): DataFrame = {
    val aggs = sums.flatMap { case (a, e) =>
      Seq(sum(expr(e)).as(a), count(expr(e)).as(nCol(a)))
    } ++ extremes.map { case (a, e, f) => extremeAgg(f, expr(e)).as(a) } ++
      sketches.map { case (a, e) => sketchAgg(expr(e)).as(a) } :+
      count(lit(1)).as(RowsCol)
    val agg0 = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    agg0.select(groupCols.map(col) ++ sums.flatMap { case (a, _) =>
      Seq(coalesce(col(a), lit(0).cast(agg0.schema(a).dataType)).as(a),
        col(nCol(a)))
    } ++ extremes.map { case (a, _, _) => col(a) } ++
      sketches.map { case (a, _) => col(a) } :+ col(RowsCol): _*)
  }

  /** Create the view: one full aggregate of the source's CURRENT
    * version (snapshot-pinned — a concurrent source commit lands after
    * the recorded version and is picked up by the next refresh), the
    * definition and applied version committed with the rows. */
  def create(spark: SparkSession, source: String, sourceSchema: StructType,
      mv: String, groupCols: Seq[String], sums: Seq[(String, String)],
      partitionCol: String, keyCols: Seq[String] = Nil,
      retain: Int = 3,
      extremes: Seq[(String, String, String)] = Nil,
      avgs: Seq[(String, String)] = Nil,
      sketches: Seq[(String, String)] = Nil): AtomicTable.Manifest = {
    val pcols = AtomicTable.partCols(partitionCol)
    require(pcols.nonEmpty && pcols.forall(groupCols.contains),
      s"view partition columns ${pcols.mkString(",")} must be group columns")
    extremes.foreach { case (a, _, f) => require(f == "min" || f == "max",
      s"extreme '$a' must be min or max, got '$f'") }
    avgs.foreach { case (a, s) => require(sums.exists(_._1 == s),
      s"avg '$a' must reference a declared sum alias, got '$s'") }
    val names = groupCols ++ sums.map(_._1) ++ sums.map(s => nCol(s._1)) ++
      extremes.map(_._1) ++ avgs.map(_._1) ++ sketches.map(_._1) :+ RowsCol
    require(names.distinct.size == names.size,
      s"group/sum names collide: ${names.mkString(", ")}")
    val srcHead = AtomicTable.currentVersion(Paths.get(source)).getOrElse(
      throw new IllegalArgumentException(s"$source has no commits"))
    val full = aggregate(
      MergeInto.readMergedAt(spark, source, sourceSchema, srcHead),
      groupCols, sums, extremes, sketches)
    val d = Definition(source, sourceSchema, groupCols, sums, partitionCol,
      keyCols, retain, full.schema, extremes, avgs, sketches)
    AtomicTable.replacePartitions(spark, mv, full, partitionCol,
      retain = retain, operation = "mv",
      properties = Map(DefProperty -> toJson(d),
        SourceVersionProperty -> srcHead.toString))
  }

  /** The stored definition and last-applied source version of `mv`. */
  def definitionOf(mv: String): (Definition, Long) = {
    val m = AtomicTable.manifest(Paths.get(mv)).getOrElse(
      throw new IllegalArgumentException(s"$mv has no commits"))
    val json = m.properties.getOrElse(DefProperty,
      throw new IllegalArgumentException(s"$mv is not an incremental view " +
        s"(no $DefProperty property)"))
    (fromJson(json), m.properties(SourceVersionProperty).toLong)
  }

  /** Fold every source commit since the last refresh into the view.
    * Returns (committed manifest, fromVersion, toVersion) — from ==
    * to + 1 encodes "already current, nothing committed". `beforeCommit`
    * runs after the delta is derived but before the manifest swap —
    * throwing there simulates a crash at the worst moment and must
    * leave the view (and its applied version) unchanged. */
  def refresh(spark: SparkSession, mv: String,
      beforeCommit: () => Unit = () => ())
      : (AtomicTable.Manifest, Long, Long) = {
    val root = Paths.get(mv)
    val m = AtomicTable.manifest(root).get
    val (d, last) = definitionOf(mv)
    val srcHead = AtomicTable.currentVersion(Paths.get(d.source)).getOrElse(0L)
    if (srcHead <= last) return (m, srcHead + 1L, srcHead)
    // a source column RENAMED since the view was defined makes the
    // stored sourceSchema stale — refuse loudly up front (the evolved
    // read would also throw, but only lazily and only when a
    // post-rename file lands in the diff)
    val srcProps = AtomicTable.rootOpt(Paths.get(d.source))
      .map(_.properties).getOrElse(Map.empty)
    // an alias whose OLD name is still in the source's declared schema
    // (and whose new name is not) is an inert orphan from a crashed
    // evolve — the properties commit landed but the meta flip did not,
    // so the rename never took effect and must not fail this check
    val declared = graft.sources.GraftCatalog
      .declaredFieldNames(Paths.get(d.source))
    val effectiveProps = declared match {
      case None => srcProps
      case Some(live) => srcProps.filterNot { case (k, v) =>
        k.startsWith(graft.sources.GraftSource.RenamePrefix) &&
          live.contains(v) &&
          !live.contains(k.stripPrefix(graft.sources.GraftSource.RenamePrefix))
      }
    }
    val renamedAway = graft.sources.GraftSource
      .renameAliases(effectiveProps).valuesIterator.flatten.toSet
    val stale = d.sourceSchema.fieldNames.filter(renamedAway).toSeq
    if (stale.nonEmpty) throw new IllegalStateException(
      s"source column(s) ${stale.mkString(", ")} of ${d.source} were " +
        s"renamed after view $mv was defined — recreate the view against " +
        "the current declared schema")

    val changes = ChangeFeed.changes(spark, d.source, d.sourceSchema,
      last + 1L, srcHead, d.keyCols)
    val sign = when(col(ChangeFeed.ChangeTypeCol)
      .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
    // the sign column must not shadow a SOURCE column: a cascaded view
    // (view over view) has the inner view's _mv_rows in its source
    // schema, and naming the sign after it would sum signs instead of
    // row counts
    val SignCol = Iterator.from(0).map(i => s"_mv_sign$i")
      .find(!d.sourceSchema.fieldNames.contains(_)).get
    val signed = changes.withColumn(SignCol, sign)
    // the signed delta aggregate — one shuffle over CHANGE rows only.
    // SUM/COUNT are self-maintainable; MIN/MAX are maintainable on the
    // INSERT side alone (least/greatest with the old value), and any
    // group touched by a negative row (delete / update preimage) is
    // flagged for a targeted per-group recompute below — the standard
    // IVM treatment (an extremum's successor is not derivable from the
    // deleted value).
    val NegTouch = "_mv_neg"
    val aggs = d.sums.flatMap { case (a, e) =>
      Seq(sum(expr(e) * col(SignCol)).as(a),
        sum(when(expr(e).isNotNull, col(SignCol)).otherwise(lit(0L)))
          .as(nCol(a)))
    } ++ d.extremes.map { case (a, e, f) =>
      extremeAgg(f, when(col(SignCol) > 0L, expr(e))).as(a)
    } ++ d.sketches.map { case (a, e) =>
      // insert-side sketch only: hll_union folds it into the view's;
      // negative rows flag the group for recompute (not subtractable)
      sketchAgg(when(col(SignCol) > 0L, expr(e))).as(a)
    } ++ (if (d.extremes.isEmpty && d.sketches.isEmpty) Nil else Seq(
      max(when(col(SignCol) < 0L, lit(1L)).otherwise(lit(0L))).as(NegTouch))
    ) :+ sum(col(SignCol)).as(RowsCol)
    val delta = signed.groupBy(d.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    val affected = partitionValues(delta, d.partitionCol)
    if (affected.isEmpty) {
      // maintenance-only source commits (compaction, vacuum, stats):
      // no change rows, but the applied version still advances — a
      // properties-only commit, zero data bytes moved
      val next = AtomicTable.commitManifest(root, Map.empty,
        properties = Map(SourceVersionProperty -> srcHead.toString),
        expectedVersion = Some(m.version), retain = d.retain,
        beforeCommit = beforeCommit, operation = "mv")
      return (next, last + 1L, srcHead)
    }

    // current view rows of ONLY the touched partitions; untouched view
    // partitions carry through the commit by reference
    val cur = AtomicTable.readPartitions(spark, mv, d.mvSchema, affected)
    val o = cur.select(d.mvSchema.fieldNames.map(c => col(c).as(s"_o_$c")): _*)
    val dl = delta.select(delta.columns.map(c => col(c).as(s"_d_$c")): _*)
    val on: Column = d.groupCols.map(k => col(s"_o_$k") <=> col(s"_d_$k"))
      .reduce(_ && _)
    val sumCols = d.sums.flatMap(s => Seq(s._1, nCol(s._1))) :+ RowsCol
    val joined0 = o.join(dl, on, "full_outer")
    // groups a negative row touched: their extremes recompute from the
    // SOURCE snapshot, bounded to exactly those groups by a broadcast
    // semi-join (change volume, not view size; the scan prunes further
    // when the group columns include source partition columns)
    val joined =
      if (d.extremes.isEmpty && d.sketches.isEmpty) joined0
      else {
        val negGroups = delta.filter(col(NegTouch) > 0L)
          .select(d.groupCols.map(c => col(c).as(s"_g_$c")): _*)
        val semiOn = d.groupCols
          .map(c => col(c) <=> col(s"_g_$c")).reduce(_ && _)
        val recAggs = d.extremes.map { case (a, e, f) =>
          extremeAgg(f, expr(e)).as(a) } ++
          d.sketches.map { case (a, e) => sketchAgg(expr(e)).as(a) }
        val rec = MergeInto
          .readMergedAt(spark, d.source, d.sourceSchema, srcHead)
          .join(broadcast(negGroups), semiOn, "left_semi")
          .groupBy(d.groupCols.map(col): _*)
          .agg(recAggs.head, recAggs.tail: _*)
        val r = rec.select(rec.columns.map(c => col(c).as(s"_r_$c")): _*)
        val recOn = d.groupCols.map(c =>
          coalesce(col(s"_o_$c"), col(s"_d_$c")) <=> col(s"_r_$c"))
          .reduce(_ && _)
        joined0.join(r, recOn, "left_outer")
      }
    val combined = joined.select(
      d.groupCols.map(c =>
        coalesce(col(s"_o_$c"), col(s"_d_$c"))
          .cast(d.mvSchema(c).dataType).as(c)) ++
      sumCols.map { c =>
        val zero = lit(0).cast(d.mvSchema(c).dataType)
        (coalesce(col(s"_o_$c"), zero) + coalesce(col(s"_d_$c"), zero))
          .cast(d.mvSchema(c).dataType).as(c)
      } ++
      d.extremes.map { case (a, _, f) =>
        // least/greatest skip nulls, so a group only in the view (no
        // delta) keeps its value and a brand-new group takes the
        // insert-side extreme; a neg-touched group takes the recompute
        val insertMerge =
          if (f == "min") least(col(s"_o_$a"), col(s"_d_$a"))
          else greatest(col(s"_o_$a"), col(s"_d_$a"))
        when(coalesce(col(s"_d_$NegTouch"), lit(0L)) > 0L, col(s"_r_$a"))
          .otherwise(insertMerge)
          .cast(d.mvSchema(a).dataType).as(a)
      } ++
      d.sketches.map { case (a, _) =>
        // hll_union is the sketch monoid; null-guard both sides so a
        // view-only group keeps its sketch and a new group takes the
        // insert-side one; a neg-touched group takes the recompute
        val merged = when(col(s"_o_$a").isNull, col(s"_d_$a"))
          .when(col(s"_d_$a").isNull, col(s"_o_$a"))
          .otherwise(hll_union(col(s"_o_$a"), col(s"_d_$a")))
        when(coalesce(col(s"_d_$NegTouch"), lit(0L)) > 0L, col(s"_r_$a"))
          .otherwise(merged).as(a)
      }: _*)
    // a negative group count means the feed and the view disagree
    // (e.g. the view was edited out-of-band) — fail loudly rather than
    // materialize a wrong summary. The guard rides the survivor filter
    // itself (raise_error fires only on a negative row), so the
    // delta pipeline runs ONCE, not once for a probe and once to write
    val survivors = combined.filter(
      when(col(RowsCol) < 0L, expr(
        s"raise_error(concat('inconsistent refresh of $mv: a group " +
          "reached a negative row count — view and changefeed " +
          "disagree'))")).otherwise(col(RowsCol) > 0L))
    val stillThere = partitionValues(survivors, d.partitionCol)
    val next = AtomicTable.replacePartitions(spark, mv, survivors,
      d.partitionCol, retain = d.retain,
      dropPartitions = affected -- stillThere,
      expectedVersion = Some(m.version), beforeCommit = beforeCommit,
      operation = "mv",
      properties = Map(SourceVersionProperty -> srcHead.toString))
    (next, last + 1L, srcHead)
  }

  /** The view in its QUERY shape: group columns, each sum rendered with
    * SQL SUM's null semantics (NULL when no non-null contributor
    * remains), min/max values, each avg rendered as sum/count in DOUBLE
    * (deterministic: decimal→double conversion + one IEEE division),
    * each sketch rendered as its ESTIMATE (the binary never surfaces),
    * and the group row count. */
  def read(spark: SparkSession, mv: String): DataFrame = {
    val (d, _) = definitionOf(mv)
    AtomicTable.read(spark, mv, d.mvSchema).select(
      d.groupCols.map(col) ++ d.sums.map { case (a, _) =>
        when(col(nCol(a)) === 0L, lit(null)).otherwise(col(a)).as(a)
      } ++ d.extremes.map { case (a, _, _) => col(a) } ++
      d.avgs.map { case (a, s) =>
        when(col(nCol(s)) === 0L, lit(null))
          .otherwise(col(s).cast("double") / col(nCol(s)).cast("double"))
          .as(a)
      } ++
      d.sketches.map { case (a, _) =>
        when(col(a).isNull, lit(0L))
          .otherwise(hll_sketch_estimate(col(a))).as(a)
      } :+
        col(RowsCol): _*)
  }

  /** Distinct partition keys of `rows` in the manifest's string form —
    * the same bounded collect [[MergeInto]] uses (values, not rows). */
  private def partitionValues(rows: DataFrame, partitionCol: String): Set[String] = {
    val pcols = AtomicTable.partCols(partitionCol)
    rows.select(pcols.map(c => col(c).cast("string")): _*).distinct()
      .collect()
      .map(r => AtomicTable.partKey(pcols.indices.map(r.getString)))
      .toSet
  }

  // ----------------------------------------------------------- (de)json

  private def toJson(d: Definition): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.createObjectNode()
    n.put("source", d.source)
    n.put("sourceSchema", d.sourceSchema.json)
    n.put("mvSchema", d.mvSchema.json)
    val g = n.putArray("group"); d.groupCols.foreach(g.add)
    val s = n.putArray("sums")
    d.sums.foreach { case (a, e) =>
      val p = s.addObject(); p.put("alias", a); p.put("expr", e); ()
    }
    n.put("partition", d.partitionCol)
    val k = n.putArray("keys"); d.keyCols.foreach(k.add)
    n.put("retain", d.retain)
    val x = n.putArray("extremes")
    d.extremes.foreach { case (a, e, f) =>
      val p = x.addObject(); p.put("alias", a); p.put("expr", e)
      p.put("func", f); ()
    }
    val av = n.putArray("avgs")
    d.avgs.foreach { case (a, s) =>
      val p = av.addObject(); p.put("alias", a); p.put("sum", s); ()
    }
    val sk = n.putArray("sketches")
    d.sketches.foreach { case (a, e) =>
      val p = sk.addObject(); p.put("alias", a); p.put("expr", e); ()
    }
    n.toString
  }

  private def fromJson(json: String): Definition = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = mapper.readTree(json)
    Definition(
      n.get("source").asText,
      DataType.fromJson(n.get("sourceSchema").asText).asInstanceOf[StructType],
      n.get("group").elements().asScala.map(_.asText).toSeq,
      n.get("sums").elements().asScala
        .map(p => (p.get("alias").asText, p.get("expr").asText)).toSeq,
      n.get("partition").asText,
      n.get("keys").elements().asScala.map(_.asText).toSeq,
      n.get("retain").asInt,
      DataType.fromJson(n.get("mvSchema").asText).asInstanceOf[StructType],
      Option(n.get("extremes")).map(_.elements().asScala.map(p =>
        (p.get("alias").asText, p.get("expr").asText, p.get("func").asText))
        .toSeq).getOrElse(Nil),
      Option(n.get("avgs")).map(_.elements().asScala.map(p =>
        (p.get("alias").asText, p.get("sum").asText)).toSeq).getOrElse(Nil),
      Option(n.get("sketches")).map(_.elements().asScala.map(p =>
        (p.get("alias").asText, p.get("expr").asText)).toSeq).getOrElse(Nil))
  }
}
