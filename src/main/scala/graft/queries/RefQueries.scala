package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.etl.{Merge, Transforms}
import graft.functions.Stable._
import graft.model.SeriesRegistry

/** Reference-parity query surface: one named query per operator family of
  * SURVEY.md §2, expressed over the harness tables (FIXTURES.md §B).
  * Every query ends in a total-order sort shared with its oracle so the
  * driver's hash compare is deterministic (SURVEY.md §7.4 risk #3).
  *
  * Scale notes are per-query: the guiding rule is that nothing here
  * collects to the driver, every aggregate has a map-side partial, small
  * sides are broadcast explicitly, and sort keys are the only global
  * exchanges.
  */
object RefQueries {

  /** T-group flagship (§2.3): scan → project → partial agg → final agg.
    * Decimal-routed sums keep results order-independent (see Stable). */
  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q1AggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlDsum("l_quantity", 2)} AS sum_qty,
       |  ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
       |  ${sqlDavg("l_quantity", 2)} AS avg_qty,
       |  count(*) AS count_order
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** T2+T3: string→typed casts with null-on-error, JSON field extraction,
    * timestamp→date. Narrow projection → parquet reads only the three
    * referenced columns.
    *
    * Expression choice is deliberate: `from_json` with a one-field schema
    * (malformed → null in PERMISSIVE mode) instead of
    * `try_cast(get_json_object(...))`, and a regex-guarded `cast` instead
    * of `try_cast(string AS double)`. The try_cast-over-json combination
    * cost 70-270 s of first-execution codegen in this ANSI-on build
    * (round-3 verdict #1: 7 s on re-run in the same JVM); the
    * restructured expressions compile in seconds and are
    * value-identical on any input (the regex accepts exactly the numeric
    * literals DuckDB's TRY_CAST does). */
  private def castJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      from_json(col("props"), "k double", Map.empty[String, String])
        .getField("k").as("k_val"),
      when(col("event_type").rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"),
        col("event_type").cast("double")).as("bogus"),
      col("ts").cast("date").as("event_date"))
      .orderBy("event_id")

  private val castJsonSql =
    """SELECT event_id,
      |  TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val,
      |  TRY_CAST(event_type AS DOUBLE) AS bogus,
      |  CAST(ts AS DATE) AS event_date
      |FROM events ORDER BY event_id""".stripMargin

  /** T7: date construction from parts (year/month → first-of-month), the
    * BLS "M01" pattern re-expressed on the events table. */
  private def makeDateQ(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(make_date(year(col("ts")), month(col("ts")), lit(1)).as("month_start"))
      .groupBy("month_start").agg(count(lit(1)).as("n"))
      .orderBy("month_start")

  private val makeDateSql =
    """SELECT make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), 1) AS month_start,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** T8: dimension lookup with fallback — broadcast join (region is tiny;
    * at 100 TB the dim side stays broadcast, no shuffle of the fact side). */
  private def dimLookup(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("n_nationkey"), col("n_name"),
        coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"))
      .orderBy("n_nationkey")

  private val dimLookupSql =
    """SELECT n_nationkey, n_name, COALESCE(r_name, 'UNKNOWN') AS region_name
      |FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin

  /** T9/T10/T12: union-all of tagged subsets + global total-order sort.
    * The union is plan-fused (no materialization); the sort is one range
    * exchange. */
  private def unionSort(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val hi = li.filter(col("l_discount") > 0.05)
      .select(lit("high").as("bucket"), col("l_orderkey"), col("l_linenumber"))
    val lo = li.filter(col("l_discount") <= 0.05)
      .select(lit("low").as("bucket"), col("l_orderkey"), col("l_linenumber"))
    hi.unionByName(lo).orderBy("bucket", "l_orderkey", "l_linenumber")
  }

  private val unionSortSql =
    """SELECT * FROM (
      |  SELECT 'high' AS bucket, l_orderkey, l_linenumber FROM lineitem WHERE l_discount > 0.05
      |  UNION ALL
      |  SELECT 'low' AS bucket, l_orderkey, l_linenumber FROM lineitem WHERE l_discount <= 0.05)
      |ORDER BY bucket, l_orderkey, l_linenumber""".stripMargin

  /** T11: literal-rows dim table from the series registry (config-as-data,
    * `/root/reference/src/config.py:28-52`). Ignores the sf dir. */
  private def literalDim(s: SparkSession, dir: String): DataFrame =
    Transforms.buildDimSeries(s, SeriesRegistry.fredSeries, SeriesRegistry.blsSeries)
      .orderBy("series_id")

  private val literalDimSql = {
    val rows = (SeriesRegistry.fredSeries.map { case (n, i) => (i, n, "FRED") } ++
      SeriesRegistry.blsSeries.map { case (n, i) => (i, n, "BLS") })
      .map { case (id, nm, src) => s"('$id', '$nm', '$src')" }
      .mkString(", ")
    s"""SELECT * FROM (VALUES $rows) AS t(series_id, series_name, source)
       |ORDER BY series_id""".stripMargin
  }

  /** L1: null-safe ε-equality classification (`src/load.py:27-35`):
    * both-null → unchanged, one-null → changed, |a−b|<1e-9 → unchanged. */
  private def nullsafeEq(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val pairs = o.select(
      col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("o_totalprice")).as("a"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
        .when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
        .when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1e-12)
        .otherwise(col("o_totalprice") + 1).as("b"))
    pairs
      .withColumn("cls",
        when(Merge.valueUnchanged(col("a"), col("b")), "unchanged").otherwise("changed"))
      .groupBy("cls").agg(count(lit(1)).as("n"))
      .orderBy("cls")
  }

  private val nullsafeEqSql =
    """SELECT cls, count(*) AS n FROM (
      |  SELECT CASE WHEN (a IS NULL AND b IS NULL) OR abs(a - b) < 1e-9
      |              THEN 'unchanged' ELSE 'changed' END AS cls
      |  FROM (
      |    SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS a,
      |           CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |                WHEN o_orderkey % 3 = 0 THEN NULL
      |                WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1e-12
      |                ELSE o_totalprice + 1 END AS b
      |    FROM orders))
      |GROUP BY cls ORDER BY cls""".stripMargin

  /** Existing/incoming fixtures for the merge queries: deterministic
    * subsets of orders with value perturbations covering every action. */
  private def mergeInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, dir)
    val existing = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice").as("value"))
    val incoming = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("double"))
          .when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("value"))
    (existing, incoming)
  }

  private val mergeInputsSql =
    """WITH existing AS (
      |  SELECT o_orderkey, o_totalprice AS value FROM orders WHERE o_orderkey % 2 = 0),
      |incoming AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |              WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
      |              ELSE o_totalprice END AS value
      |  FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin

  /** L3 classification: MERGE actions as one left-outer join + per-action
    * counts (vs the reference's full-table dict + row loop,
    * `src/load.py:42-105`). */
  private def mergeClassify(s: SparkSession, dir: String): DataFrame = {
    val (existing, incoming) = mergeInputs(s, dir)
    Merge.stats(Merge.classify(incoming, existing, Seq("o_orderkey"), "value"))
      .orderBy("action")
  }

  private val mergeClassifySql =
    s"""$mergeInputsSql
       |SELECT CASE WHEN e.o_orderkey IS NULL THEN 'insert'
       |            WHEN (i.value IS NULL AND e.value IS NULL)
       |                 OR abs(i.value - e.value) < 1e-9 THEN 'unchanged'
       |            ELSE 'update' END AS action,
       |       count(*) AS n
       |FROM incoming i LEFT JOIN existing e ON i.o_orderkey = e.o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** L3 new-state materialization: anti-join ∪ incoming (update-wins).
    * Both sides shuffle once on the merge key; at 100 TB both sides would
    * be bucketed on o_orderkey making this exchange-free. */
  private def mergeState(s: SparkSession, dir: String): DataFrame = {
    val (existing, incoming) = mergeInputs(s, dir)
    Merge.upsert(existing, incoming, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  private val mergeStateSql =
    s"""$mergeInputsSql
       |SELECT o_orderkey, value FROM (
       |  SELECT e.o_orderkey, e.value FROM existing e
       |  WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.o_orderkey = e.o_orderkey)
       |  UNION ALL
       |  SELECT o_orderkey, value FROM incoming)
       |ORDER BY o_orderkey""".stripMargin

  /** L4: insert-if-absent anti-join (`src/load.py:108-134`) — customers
    * with no finished ('F') order. The status filter keeps the result
    * non-empty at every sf (all customers have at least one order). */
  private def antiJoin(s: SparkSession, dir: String): DataFrame =
    Merge.insertIfAbsent(Tables.customer(s, dir), Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private val antiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** L5+L6: membership predicate + per-group counts/sums. */
  private def isinStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderstatus").isInCollection(Seq("F", "P")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))
      .orderBy("o_orderpriority")

  private val isinStatsSql =
    s"""SELECT o_orderpriority, count(*) AS n, ${sqlDsum("o_totalprice", 2)} AS total
       |FROM orders WHERE o_orderstatus IN ('F', 'P')
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** R4: watermark-style max-date-per-key state update
    * (`src/extract.py:108-119` as an aggregate). */
  private def maxWatermark(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(max(col("l_shipdate")).cast("date").as("last_ship"))
      .orderBy("l_suppkey")

  private val maxWatermarkSql =
    """SELECT l_suppkey, CAST(max(l_shipdate) AS DATE) AS last_ship
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** Window top-N per key with a total tiebreak (deterministic
    * row_number). Single shuffle on the partition key. */
  private def windowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  private val windowTopkSql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Running-frame window: exact (decimal) running sum + lag. The window
    * order (shipdate, orderkey, linenumber, quantity) makes ties
    * OUTPUT-interchangeable — (orderkey, linenumber) alone is NOT unique
    * in this data, and at sf0.1 even (shipdate, orderkey, linenumber)
    * collides within a suppkey; appending quantity means any remaining
    * tied rows contribute identical running/lag values in either order,
    * so the result is deterministic without requiring a true total order.
    * The final sort appends running_qty so the output order is total. */
  private def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    // Exact running sum via integer cents (quantities have 2 decimals):
    // long addition stays in whole-stage codegen, an order of magnitude
    // faster than a Decimal accumulator in the window frame, and remains
    // bit-identical cross-engine.
    Tables.lineitem(s, dir)
      .withColumn("running_qty",
        sum(round(col("l_quantity") * 100).cast("bigint"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty", "prev_qty")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
  }

  private val windowRunningSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  SUM(CAST(round(l_quantity * 100) AS BIGINT))
      |       OVER (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_qty,
      |  lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
      |                           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity) AS prev_qty
      |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin

  /** Multi-join + agg + top-k (TPC-H Q3 shape). customer is broadcast
    * (small dim); lineitem⋈orders shuffles on the order key once. */
  private def q3TopRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  private val q3TopRevenueSql =
    s"""SELECT o_orderkey,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** Star join over the full dimension chain (TPC-H Q5 shape): all dims
    * broadcast, single fact shuffle for the final aggregate. */
  private def q5RegionRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")

  private val q5RegionRevenueSql =
    s"""SELECT r_name, n_name,
       |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Global top-k with total tiebreak (TakeOrderedAndProject — no full
    * sort materialization; each partition keeps only k rows). */
  private def topkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val topkOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q1_agg" -> QueryDef(q1Agg, Some(q1AggSql)),
    "t2_cast_json" -> QueryDef(castJson, Some(castJsonSql)),
    "t7_make_date" -> QueryDef(makeDateQ, Some(makeDateSql)),
    "t8_dim_lookup" -> QueryDef(dimLookup, Some(dimLookupSql)),
    "t9_union_sort" -> QueryDef(unionSort, Some(unionSortSql)),
    "t11_literal_dim" -> QueryDef(literalDim, Some(literalDimSql)),
    "l1_nullsafe_eq" -> QueryDef(nullsafeEq, Some(nullsafeEqSql)),
    "l3_merge_classify" -> QueryDef(mergeClassify, Some(mergeClassifySql)),
    "l3_merge_state" -> QueryDef(mergeState, Some(mergeStateSql)),
    "l4_anti_join" -> QueryDef(antiJoin, Some(antiJoinSql)),
    "l5_isin_stats" -> QueryDef(isinStats, Some(isinStatsSql)),
    "r4_max_watermark" -> QueryDef(maxWatermark, Some(maxWatermarkSql)),
    "w1_window_topk" -> QueryDef(windowTopk, Some(windowTopkSql)),
    "w2_window_running" -> QueryDef(windowRunning, Some(windowRunningSql)),
    "q3_top_revenue" -> QueryDef(q3TopRevenue, Some(q3TopRevenueSql)),
    "q5_region_revenue" -> QueryDef(q5RegionRevenue, Some(q5RegionRevenueSql)),
    "topk_orders" -> QueryDef(topkOrders, Some(topkOrdersSql)))
}
