package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable._
import graft.ops.{AsOf, BloomPrune, Bucketed, IncrAgg, Layout, Scd2}

/** Coverage beyond the reference's own operator set (SURVEY.md §2.6 lists
  * what the reference lacks): as-of join, pivot/unpivot, rollup with
  * grouping flags, distinct aggregates, and set operations — capabilities
  * an analytics engine over this data model is expected to have.
  */
object MoreQueries {

  /** As-of join: each purchase event picks up the value of the user's
    * most recent prior click (union-merge + carry-forward — one shuffle
    * on user_id, no range join blowup). */
  private def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsOf.joinPrior(purchases, clicks, "user_id", "ts", "ts",
        payload = Seq("value" -> "prior_click_value"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("value"), col("prior_click_value"))
      .orderBy("user_id", "event_id")
  }

  /** Oracle mirrors the union-merge exactly (DuckDB also has a native
    * ASOF JOIN; the portable form is used so semantics match bit-for-bit,
    * including ties). */
  private val asofJoinSql =
    """WITH tagged AS (
      |  SELECT user_id, ts, -1 AS side, NULL::BIGINT AS event_id,
      |         NULL::DOUBLE AS pvalue, value AS cvalue
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, 1 AS side, event_id, value AS pvalue, NULL AS cvalue
      |  FROM events WHERE event_type = 'purchase'),
      |carried AS (
      |  SELECT *, last_value(cvalue IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, side
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prior_click_value
      |  FROM tagged)
      |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |       pvalue AS value, prior_click_value
      |FROM carried WHERE side = 1 ORDER BY user_id, event_id""".stripMargin

  /** The same as-of join through the custom Catalyst operator
    * (graft.plans.AsOfJoinExec — streaming merge, O(1) state per key
    * instead of WindowExec's per-key buffer). Shares asofJoinSql: the
    * custom exec must be result-identical to the union-merge form. */
  private def asofJoinExec(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsOf.joinPriorExec(purchases, clicks, "user_id", "ts", "ts",
        payload = Seq("value" -> "prior_click_value"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("value"), col("prior_click_value"))
      .orderBy("user_id", "event_id")
  }

  /** Bucketized range join (ops.RangeJoin): every distinct ship date
    * counted against the order "fulfillment windows"
    * [o_orderdate, o_orderdate + o_orderkey%30 days] containing it. The
    * oracle states the same join as a plain BETWEEN — bucketization must
    * be invisible in the result (like salting); the plan audit asserts it
    * is an equi-join, not a nested loop. */
  private def rangeJoinBuckets(s: SparkSession, dir: String): DataFrame = {
    val points = Tables.lineitem(s, dir)
      .select(col("l_shipdate").cast("date").as("d")).distinct()
    val intervals = Tables.orders(s, dir).select(
      col("o_orderdate").cast("date").as("s"),
      date_add(col("o_orderdate").cast("date"),
        pmod(col("o_orderkey"), lit(30)).cast("int")).as("e"))
    // bucketDays sized to the max interval span (30 days): a 7-day bucket
    // replicated each interval into up to 5 buckets — 4-5x candidate
    // inflation for zero pruning gain (round-2/3 verdict ask). With 30,
    // each interval lands in at most 2 buckets.
    graft.ops.RangeJoin.pointInInterval(points, "d", intervals, "s", "e",
        bucketDays = 30)
      .groupBy("d").agg(count(lit(1)).as("n_orders"))
      .orderBy("d")
  }

  private val rangeJoinBucketsSql =
    """WITH pts AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS d FROM lineitem),
      |     iv AS (SELECT CAST(o_orderdate AS DATE) AS s,
      |                   CAST(o_orderdate AS DATE)
      |                     + CAST(o_orderkey % 30 AS INTEGER) AS e
      |            FROM orders)
      |SELECT d, count(*) AS n_orders FROM pts JOIN iv ON d BETWEEN s AND e
      |GROUP BY d ORDER BY d""".stripMargin

  /** Pivot: long events → wide per-user columns, one per event type. */
  private def pivotWide(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(dsum(col("value"), 6))
      .orderBy("user_id")

  private val pivotWideSql = {
    val arms = Seq("click", "view", "purchase", "signup", "error").map { t =>
      s"""CAST(SUM(CAST(CASE WHEN event_type = '$t' THEN value END AS DECIMAL(18,6))) AS DOUBLE) AS "$t""""
    }.mkString(",\n  ")
    s"""SELECT user_id,
       |  $arms
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Unpivot: wide lineitem measures → long (measure, value) rows
    * (deterministic 1-in-10 sample — the operator is the point, not the
    * 3x row explosion of the full table). */
  private def unpivotLong(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 10 === 0)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber"), col("l_suppkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "measure_value")
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "measure")

  private val unpivotLongSql =
    """SELECT l_orderkey, l_linenumber, l_suppkey, measure, measure_value FROM (
      |  SELECT l_orderkey, l_linenumber, l_suppkey,
      |         'l_quantity' AS measure, l_quantity AS measure_value
      |  FROM lineitem WHERE l_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_suppkey,
      |         'l_extendedprice', l_extendedprice
      |  FROM lineitem WHERE l_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, l_suppkey,
      |         'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey % 10 = 0)
      |ORDER BY l_orderkey, l_linenumber, l_suppkey, measure""".stripMargin

  /** Rollup with grouping flags; group labels are coalesced so the output
    * carries no nulls (null sort order differs across engines). */
  private def rollupStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"), col("total"))
      .orderBy("g_status", "g_priority", "status", "priority")

  private val rollupStatsSql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       |  count(*) AS n, ${sqlDsum("o_totalprice", 2)} AS total
       |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** Arbitrary GROUPING SETS — an asymmetric set list ((status),
    * (priority), ()) that neither rollup nor cube can express; same
    * null-free label convention as the rollup query. */
  private def groupingSetsStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"), col("total"))
      .orderBy("g_status", "g_priority", "status", "priority")

  private val groupingSetsStatsSql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       |  count(*) AS n, ${sqlDsum("o_totalprice", 2)} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** Exact distinct aggregates per group. */
  private def distinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val distinctAggSql =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers,
      |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Set operations (both engines use distinct set semantics): customers
    * with both finished and open orders, and those with only finished. */
  private def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val both = f.intersect(open).withColumn("cls", lit("both"))
    val onlyF = f.except(open).withColumn("cls", lit("only_f"))
    both.unionByName(onlyF)
      .groupBy("cls").agg(count(lit(1)).as("n"))
      .orderBy("cls")
  }

  private val setOpsSql =
    """SELECT cls, count(*) AS n FROM (
      |  SELECT o_custkey, 'both' AS cls FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL
      |  SELECT o_custkey, 'only_f' FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'))
      |GROUP BY cls ORDER BY cls""".stripMargin

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share continuous-interpolation semantics;
    * rounded to absorb last-ulp interpolation differences). */
  private def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(min(col("o_totalprice")), 4).as("lo"),
        round(max(col("o_totalprice")), 4).as("hi"))
      .orderBy("o_orderstatus")

  private val percentilesSql =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  round(min(o_totalprice), 4) AS lo, round(max(o_totalprice), 4) AS hi
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** String-function family over customer names. */
  private def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      upper(col("c_name")).as("upper_name"),
      substring(col("c_name"), 1, 8).as("prefix"),
      length(col("c_name")).cast("bigint").as("name_len"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
      translate(col("c_name"), "#", "_").as("clean"))
      .orderBy("c_custkey")

  private val stringFuncsSql =
    """SELECT c_custkey, upper(c_name) AS upper_name,
      |  substring(c_name, 1, 8) AS prefix,
      |  length(c_name) AS name_len,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged,
      |  coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits,
      |  replace(c_name, '#', '_') AS clean
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Date-function family over order dates. */
  private def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_orderdate").cast("date").as("order_date"),
      trunc(col("o_orderdate"), "month").as("month_start"),
      last_day(col("o_orderdate")).as("month_end"),
      datediff(lit("1995-01-01").cast("date"), col("o_orderdate"))
        .cast("bigint").as("days_to_1995"),
      year(col("o_orderdate")).cast("bigint").as("yr"),
      quarter(col("o_orderdate")).cast("bigint").as("qtr"),
      dayofweek(col("o_orderdate")).cast("bigint").as("dow"))
      .orderBy("o_orderkey")

  private val dateFuncsSql =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_to_1995,
      |  year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |  dayofweek(o_orderdate) + 1 AS dow
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Semi-join (EXISTS): orders having at least one high-discount line. */
  private def semiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir).filter(col("l_discount") > 0.08)
          .select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  private val semiJoinSql =
    """SELECT o_orderstatus, count(*) AS n FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** TPC-H Q6 shape: pure filter + sum (scan-dominated; the filters reach
    * the parquet reader). */
  private def q6FilterSum(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_discount").between(0.03, 0.07) && col("l_quantity") < 10)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
        count(lit(1)).as("n"))

  private val q6FilterSumSql =
    s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 6)} AS revenue,
       |  count(*) AS n
       |FROM lineitem
       |WHERE l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 10""".stripMargin

  /** TPC-H Q12 shape: conditional aggregation (CASE inside SUM). */
  private def caseAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")

  private val caseAggSql =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Cube over two dims with grouping flags (the rollup query's sibling —
    * all four grouping combinations). */
  private def cubeStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_priority"), col("n"))
      .orderBy("g_status", "g_priority", "status", "priority")

  private val cubeStatsSql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |  count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_priority, status, priority""".stripMargin

  /** Range-frame window: per-supplier sum over a value range (all rows
    * whose totalprice is within ±1000 of the current row's). */
  private def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, 1000L)
    Tables.orders(s, dir)
      .withColumn("n_near", count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "o_totalprice", "n_near")
      .orderBy("o_custkey", "o_orderkey")
  }

  private val rangeFrameSql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
      |                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Skew-safe salted two-phase aggregation — identical results to the
    * direct group-by (exact decimal partials), skew-proof execution. */
  private def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Salting
    Salting.saltedSumCount(
        Tables.lineitem(s, dir), Seq("l_returnflag"),
        Seq(
          col("l_quantity").cast("decimal(18,2)") -> "sum_qty_dec",
          col("l_extendedprice").cast("decimal(18,2)") -> "sum_price_dec"),
        salts = 16)
      .select(col("l_returnflag"), col("n"),
        col("sum_qty_dec").cast("double").as("sum_qty"),
        col("sum_price_dec").cast("double").as("sum_price"))
      .orderBy("l_returnflag")
  }

  private val saltedAggSql =
    s"""SELECT l_returnflag, count(*) AS n,
       |  ${sqlDsum("l_quantity", 2)} AS sum_qty,
       |  ${sqlDsum("l_extendedprice", 2)} AS sum_price
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch aggregates (HLL++ cardinality, KLL-style quantiles) — outputs
    * approximate by contract, hence rows-only; accuracy bounds are
    * asserted in SketchesSpec against the exact answers. */
  private def sketches(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sketches.orderSketches(Tables.orders(s, dir))

  /** Oracle-checkable form of the sketches: the approximate values are
    * engine-specific, but their ERROR BOUNDS are not — HLL++ at rsd=0.02
    * must land within 5% of the exact distinct count, and the quantile
    * sketch's median must fall between the exact p40 and p60. The exact
    * sides run as SEPARATE aggregates (mixing exact percentile with
    * approx_percentile in one aggregate is the measured 100-500x
    * serialization trap) joined on the group key. */
  private def sketchBounds(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val approx = graft.ops.Sketches.orderSketches(orders)
    // The exact side runs as TWO aggregates, not one: a single
    // countDistinct + percentile aggregate triggers Spark's
    // distinct-agg rewrite, which regroups the FIRST phase by
    // (status, custkey) — every customer group then carries its own
    // serialized exact-percentile buffer pair across the exchange
    // (plans/r14/sketch_bounds_before.txt: 3 ObjectHashAggregate
    // levels, buffers keyed per customer). Split, the percentile
    // buffers shuffle once per STATUS (3 groups) and the distinct
    // count shuffles bare (status, custkey) pairs; the extra scan is
    // columnar and cheap at any scale. Same trap family as the
    // approx/exact split above (Sketches.orderSketches doc).
    val exactPct = orders.groupBy("o_orderstatus").agg(
      expr("percentile(o_totalprice, 0.4)").as("exact_p40"),
      expr("percentile(o_totalprice, 0.6)").as("exact_p60"))
    val exactCard = orders.groupBy("o_orderstatus").agg(
      countDistinct(col("o_custkey")).as("exact_customers"))
    approx.join(exactCard, "o_orderstatus").join(exactPct, "o_orderstatus")
      .select(col("o_orderstatus"),
        (abs(col("approx_customers") - col("exact_customers"))
          <= col("exact_customers") * 0.05).as("card_ok"),
        (col("approx_p50") >= col("exact_p40") &&
          col("approx_p50") <= col("exact_p60")).as("p50_ok"))
      .orderBy("o_orderstatus")
  }

  private val sketchBoundsSql =
    """SELECT o_orderstatus, CAST(1 AS BOOLEAN) AS card_ok,
      |  CAST(1 AS BOOLEAN) AS p50_ok
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Ranking-window family: ntile buckets, percent_rank, cume_dist,
    * dense_rank — deterministic under a total per-partition order. */
  private def rankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        dense_rank().over(w).cast("bigint").as("drank"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  private val rankFamilySql =
    """SELECT o_orderstatus, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  dense_rank() OVER w AS drank
      |FROM orders WHERE o_orderkey % 10 = 0
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** Array-function family over the embedding vectors (per-element double
    * ops — deterministic cross-engine). */
  private def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id"),
      size(col("embedding")).cast("bigint").as("dim"),
      round(element_at(col("embedding"), 1).cast("double"), 6).as("first_elem"),
      round(aggregate(slice(col("embedding"), 1, 8),
        lit(0.0), (acc, x) => acc + x.cast("double")), 6).as("head_sum"),
      round(array_max(transform(col("embedding"), x => x.cast("double"))), 6).as("max_elem"))
      .orderBy("vec_id")

  private val arrayFuncsSql =
    """SELECT vec_id, len(embedding) AS dim,
      |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
      |  round(list_reduce(list_prepend(0.0, CAST(embedding[1:8] AS DOUBLE[])),
      |                    (a, b) -> a + b), 6) AS head_sum,
      |  round(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_elem
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** SQL-text frontend: the engine's tables served to spark.sql with a
    * correlated scalar subquery (decorrelated by Catalyst into a join —
    * no per-row execution). */
  private def sqlFrontend(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT count(*) FROM v_orders WHERE o_custkey = c_custkey) AS n_orders,
        |  (SELECT max(o_totalprice) FROM v_orders WHERE o_custkey = c_custkey) AS max_order
        |FROM v_customer ORDER BY c_custkey""".stripMargin)
  }

  private val sqlFrontendSql =
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** SQL-text frontend, correlated EXISTS / NOT EXISTS — Catalyst
    * decorrelates both into semi/anti joins (no per-row subquery
    * execution). */
  private def sqlExists(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c_custkey, c_mktsegment
        |FROM v_customer c
        |WHERE EXISTS (SELECT 1 FROM v_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |  AND NOT EXISTS (SELECT 1 FROM v_orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  private val sqlExistsSql =
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** SQL-text frontend, correlated LATERAL subquery with LIMIT — top-3
    * orders per customer; Catalyst plans the correlation as a domain
    * join + window, not a per-customer re-execution. */
  private def sqlLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("v_customer")
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM v_customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM v_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  private val sqlLateralSql =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** SQL-text frontend, recursive CTE — a generated month spine LEFT
    * JOINed to the fact keeps empty months visible (the usual calendar
    * dimension without a stored table). */
  private def sqlRecursive(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("v_orders")
    s.sql(
      """WITH RECURSIVE m(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
        |SELECT n AS month_idx, count(o_orderkey) AS n_orders
        |FROM m LEFT JOIN v_orders ON month(o_orderdate) = n
        |GROUP BY n ORDER BY month_idx""".stripMargin)
  }

  private val sqlRecursiveSql =
    """WITH RECURSIVE m(n) AS (
      |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
      |SELECT n AS month_idx, count(o_orderkey) AS n_orders
      |FROM m LEFT JOIN orders ON month(o_orderdate) = n
      |GROUP BY n ORDER BY month_idx""".stripMargin

  /** Bloom-pruned semi join (ops.BloomPrune): a broadcast bitmap of the
    * selective key set drops non-matching fact rows before the join
    * exchange; the exact semi join removes false positives, so the oracle
    * is the plain IN-subquery aggregate. */
  private def bloomPruneJoin(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000.0)
      .select("o_orderkey")
    BloomPrune.semiJoinPruned(Tables.lineitem(s, dir), keys,
        "l_orderkey", "o_orderkey")
      .groupBy("l_returnflag")
      .agg(dsum(col("l_extendedprice"), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
  }

  private val bloomPruneJoinSql =
    s"""SELECT l_returnflag,
       |  ${sqlDsum("l_extendedprice", 2)} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_orderkey IN (
       |  SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Bucketed co-located join (ops.Bucketed): customer ⋈ orders with
    * BOTH sides pre-written `CLUSTERED BY custkey INTO 8 BUCKETS`, so
    * the fact-to-fact join plans with ZERO Exchange on either side
    * (BucketedSpec pins the plan); only the final 5-row per-segment
    * aggregate shuffles. The bucketed write is staged once per JVM —
    * the amortization bucketing exists for. */
  private def bucketedJoin(s: SparkSession, dir: String): DataFrame =
    Bucketed.customerOrdersJoined(s, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")

  private val bucketedJoinSql =
    s"""SELECT c_mktsegment, count(*) AS n_orders,
       |  count(DISTINCT c_custkey) AS n_customers,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** SCD Type 2 history (ops.Scd2): per-customer order-status runs
    * collapsed to validity intervals — gaps-and-islands over one shuffle. */
  private def scd2History(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderstatus"),
      col("o_orderdate").cast("date").as("o_date"), col("o_orderkey"))
    Scd2.intervals(ev, "o_custkey", "o_orderstatus", "o_date", "o_orderkey")
      .orderBy(col("o_custkey"), col("valid_from"), col("valid_to"),
        col("o_orderstatus"))
  }

  private val scd2HistorySql =
    """WITH e AS (
      |  SELECT o_custkey, o_orderstatus,
      |    CAST(o_orderdate AS DATE) AS o_date, o_orderkey
      |  FROM orders),
      |i AS (
      |  SELECT o_custkey, o_orderstatus, o_date,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_date, o_orderkey)
      |    - row_number() OVER (PARTITION BY o_custkey, o_orderstatus
      |      ORDER BY o_date, o_orderkey) AS island
      |  FROM e),
      |r AS (
      |  SELECT o_custkey, o_orderstatus,
      |    min(o_date) AS valid_from, max(o_date) AS valid_to,
      |    count(*) AS n_events
      |  FROM i GROUP BY o_custkey, o_orderstatus, island)
      |SELECT o_custkey, o_orderstatus, valid_from, valid_to, n_events,
      |  valid_to = max(valid_to) OVER (PARTITION BY o_custkey) AS is_current
      |FROM r
      |ORDER BY o_custkey, valid_from, valid_to, o_orderstatus""".stripMargin

  /** Incremental aggregate maintenance (ops.IncrAgg): a persisted moment
    * state plus a delta batch merge to the same result as a full recompute
    * — the oracle IS the full recompute. */
  private def incrAggMerge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val cutoff = lit("1999-01-01")
    val stored = IncrAgg.state(
      li.filter(col("l_shipdate") < cutoff), keys, "l_quantity", scale = 2)
    val delta = IncrAgg.state(
      li.filter(col("l_shipdate") >= cutoff), keys, "l_quantity", scale = 2)
    IncrAgg.merge(stored.unionByName(delta), keys)
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val incrAggMergeSql =
    """WITH m AS (
      |  SELECT l_returnflag, l_linestatus,
      |    count(l_quantity) AS n_total,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(19,2))
      |      * CAST(l_quantity AS DECIMAL(19,2))) AS DOUBLE) AS ss
      |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
      |SELECT l_returnflag, l_linestatus, n_total,
      |  s AS sum_v,
      |  s / CAST(n_total AS DOUBLE) AS avg_v,
      |  CASE WHEN n_total > 1 THEN
      |    (ss - s * s / CAST(n_total AS DOUBLE))
      |      / (CAST(n_total AS DOUBLE) - 1.0)
      |  ELSE NULL END AS var_v
      |FROM m ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Z-order (Morton) clustering value (ops.Layout): the bit-interleave is
    * engine-neutral integer arithmetic, so the layout key itself is
    * oracle-checked; the clustering effect is asserted in ScaleOpsSpec. */
  private def zorderValue(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        pmod(col("l_partkey"), lit(1024L)).as("px"),
        pmod(col("l_suppkey"), lit(1024L)).as("sx"))
      .withColumn("z", Layout.zValue("px", "sx", bits = 10))
      .orderBy("z", "l_orderkey", "l_linenumber")
  }

  private val zorderValueSql =
    s"""SELECT l_orderkey, l_linenumber,
       |  l_partkey % 1024 AS px, l_suppkey % 1024 AS sx,
       |  ${Layout.zValueSql("l_partkey % 1024", "l_suppkey % 1024", 10)} AS z
       |FROM lineitem
       |ORDER BY z, l_orderkey, l_linenumber""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "bloom_prune_join" -> QueryDef(bloomPruneJoin, Some(bloomPruneJoinSql)),
    "zorder_value" -> QueryDef(zorderValue, Some(zorderValueSql)),
    "bucketed_join" -> QueryDef(bucketedJoin, Some(bucketedJoinSql)),
    "scd2_history" -> QueryDef(scd2History, Some(scd2HistorySql)),
    "incr_agg_merge" -> QueryDef(incrAggMerge, Some(incrAggMergeSql)),
    "sql_scalar_subquery" -> QueryDef(sqlFrontend, Some(sqlFrontendSql)),
    "sql_exists" -> QueryDef(sqlExists, Some(sqlExistsSql)),
    "sql_lateral" -> QueryDef(sqlLateral, Some(sqlLateralSql)),
    "sql_recursive_cte" -> QueryDef(sqlRecursive, Some(sqlRecursiveSql)),
    "rank_family" -> QueryDef(rankFamily, Some(rankFamilySql)),
    "array_funcs" -> QueryDef(arrayFuncs, Some(arrayFuncsSql)),
    "sketch_agg" -> QueryDef(sketches, None),
    "sketch_bounds" -> QueryDef(sketchBounds, Some(sketchBoundsSql)),
    "semi_join" -> QueryDef(semiJoin, Some(semiJoinSql)),
    "q6_filter_sum" -> QueryDef(q6FilterSum, Some(q6FilterSumSql)),
    "q12_case_agg" -> QueryDef(caseAgg, Some(caseAggSql)),
    "cube_stats" -> QueryDef(cubeStats, Some(cubeStatsSql)),
    "w3_range_frame" -> QueryDef(rangeFrame, Some(rangeFrameSql)),
    "salted_agg" -> QueryDef(saltedAgg, Some(saltedAggSql)),
    "percentiles" -> QueryDef(percentiles, Some(percentilesSql)),
    "string_funcs" -> QueryDef(stringFuncs, Some(stringFuncsSql)),
    "date_funcs" -> QueryDef(dateFuncs, Some(dateFuncsSql)),
    "asof_join" -> QueryDef(asofJoin, Some(asofJoinSql)),
    "asof_join_exec" -> QueryDef(asofJoinExec, Some(asofJoinSql)),
    "range_join_buckets" -> QueryDef(rangeJoinBuckets, Some(rangeJoinBucketsSql)),
    "pivot_wide" -> QueryDef(pivotWide, Some(pivotWideSql)),
    "unpivot_long" -> QueryDef(unpivotLong, Some(unpivotLongSql)),
    "rollup_stats" -> QueryDef(rollupStats, Some(rollupStatsSql)),
    "grouping_sets_stats" -> QueryDef(groupingSetsStats, Some(groupingSetsStatsSql)),
    "distinct_agg" -> QueryDef(distinctAgg, Some(distinctAggSql)),
    "setops_customers" -> QueryDef(setOps, Some(setOpsSql)))
}
