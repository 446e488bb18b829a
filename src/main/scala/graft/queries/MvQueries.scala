package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.etl.{AtomicTable, IncrementalView, MergeInto}
import graft.functions.Stable.sqlDsum

/** Incrementally-maintained materialized views (etl/IncrementalView):
  * the changefeed's payoff — a summary table kept exact under
  * INSERT / MERGE / DELETE without ever re-aggregating the source.
  * Both queries run a full mutation history, refresh the view from the
  * change stream only, and are value-oracled against the equivalent
  * aggregate over the FINAL source state: a sign flipped, a preimage
  * lost, a group not dropped, or a change double-applied shifts a sum
  * and fails the compare. */
object MvQueries {

  private val staged = new ConcurrentHashMap[String, String]()

  private val ordSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_ym", StringType)))

  /** Scala-API path: seed the month-partitioned source (v1), CREATE the
    * view (one full aggregate at v1), then MERGE (v2 — update pre/post
    * images must cancel exactly, inserts must add) and DELETE (v3 —
    * deletes must subtract, groups emptied of rows must leave the
    * view), refresh ONCE across both commits, then refresh again (must
    * no-op: the applied version rode the first refresh's commit).
    * Exactness comes from the decimal sum expression — decimal addition
    * is associative, so delta application equals recomputation. */
  private[queries] def graftIncrMv(s: SparkSession, dir: String): DataFrame = {
    val mv = staged.computeIfAbsent("api:" + dir, { _ =>
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      val t = java.nio.file.Files.createTempDirectory("graft-mvsrc").toString
      AtomicTable.replacePartitions(s, t,
        base.repartition(col("o_ym")), "o_ym", retain = 10)          // v1
      val mvDir = java.nio.file.Files.createTempDirectory("graft-mv")
        .resolve("orders_mv").toString
      IncrementalView.create(s, t, ordSchema, mvDir,
        Seq("o_ym"),
        Seq("revenue" -> "CAST(o_totalprice AS DECIMAL(18,2))",
          "sum_okey" -> "o_orderkey"),
        "o_ym", keyCols = Seq("o_orderkey"),
        extremes = Seq(("min_price", "o_totalprice", "min"),
          ("max_okey", "o_orderkey", "max")))
      val upd = base.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("o_orderstatus", lit("U"))
      val ins = base.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("o_orderstatus", lit("N"))
      MergeInto.upsert(s, t, ordSchema,
        upd.unionByName(ins).repartition(col("o_ym")),
        Seq("o_orderkey"), "o_ym", retain = 10)                      // v2
      val gone = AtomicTable.read(s, t, ordSchema)
        .filter(col("o_custkey") % 991 === 0)
        .select("o_orderkey", "o_ym")
      MergeInto.deleteKeys(s, t, ordSchema, gone,
        Seq("o_orderkey"), "o_ym", retain = 10)                      // v3
      val (m1, from, to) = IncrementalView.refresh(s, mvDir)
      require(from == 2L && to == 3L, s"refresh range was [$from,$to]")
      val (m2, f2, t2) = IncrementalView.refresh(s, mvDir)
      require(m2.version == m1.version && f2 == t2 + 1,
        "a second refresh with no new source commits must no-op")
      mvDir
    })
    IncrementalView.read(s, mv).select(
      col("o_ym"), col(IncrementalView.RowsCol).as("n_rows"),
      col("sum_okey"), col("revenue").cast("double").as("revenue"),
      col("min_price"), col("max_okey"))
      .orderBy("o_ym")
  }

  private[queries] val graftIncrMvSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |upd AS (
       |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice,
       |         o_ym
       |  FROM base WHERE o_orderkey % 97 = 0),
       |ins AS (
       |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
       |         o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 101 = 0),
       |merged AS (
       |  SELECT * FROM base
       |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
       |  UNION ALL SELECT * FROM upd
       |  UNION ALL SELECT * FROM ins),
       |final AS (SELECT * FROM merged WHERE o_custkey % 991 <> 0)
       |SELECT o_ym, count(*) AS n_rows,
       |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue,
       |  min(o_totalprice) AS min_price,
       |  CAST(max(o_orderkey) AS BIGINT) AS max_okey
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** AVG + APPROX_COUNT_DISTINCT in the maintained view: AVG renders
    * from the maintained sum/count (closed under the delta algebra, no
    * new state), and the distinct-customer count is a mergeable HLL
    * sketch stored as a binary view column — inserts fold by
    * hll_union, the delete commit forces the bounded per-group
    * recompute. The sketch ESTIMATE is engine-bound (Spark's HLL), so
    * the oracled columns are the EXACT aggregates; the estimate is
    * verified IN-QUERY against the HLL error envelope and surfaces as
    * a boolean the oracle states as literal TRUE — a sketch that lost
    * the delete, double-merged, or drifted past the envelope flips the
    * flag and fails the value compare (the sketch_bounds pattern). */
  private[queries] def graftMvApprox(s: SparkSession, dir: String): DataFrame = {
    val state = staged.computeIfAbsent("approx:" + dir, { _ =>
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      val t = java.nio.file.Files.createTempDirectory("graft-mvapx").toString
      AtomicTable.replacePartitions(s, t,
        base.repartition(col("o_ym")), "o_ym", retain = 10)          // v1
      val mvDir = java.nio.file.Files.createTempDirectory("graft-mvap")
        .resolve("orders_apx").toString
      IncrementalView.create(s, t, ordSchema, mvDir,
        Seq("o_ym"),
        Seq("revenue" -> "CAST(o_totalprice AS DECIMAL(18,2))"),
        "o_ym", keyCols = Seq("o_orderkey"),
        avgs = Seq("avg_price" -> "revenue"),
        sketches = Seq("cust_est" -> "o_custkey"))
      // v2: inserts only — the sketch path must MERGE, never recompute
      val ins = base.filter(col("o_orderkey") % 89 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
      AtomicTable.appendPartitions(s, t, ins.repartition(col("o_ym")),
        "o_ym", retain = 10)
      // v3: a keyed delete — negative rows force the bounded per-group
      // sketch recompute (an unsubtracted sketch would overcount)
      val gone = AtomicTable.read(s, t, ordSchema)
        .filter(col("o_custkey") % 113 === 0)
        .select("o_orderkey", "o_ym")
      MergeInto.deleteKeys(s, t, ordSchema, gone,
        Seq("o_orderkey"), "o_ym", retain = 10)
      IncrementalView.refresh(s, mvDir)
      s"$t|$mvDir"
    })
    val Array(t, mv) = state.split('|')
    val exact = AtomicTable.read(s, t, ordSchema)
      .groupBy("o_ym")
      .agg(count_distinct(col("o_custkey")).as("cust_exact"))
    IncrementalView.read(s, mv).join(exact, Seq("o_ym"))
      .select(col("o_ym"), col(IncrementalView.RowsCol).as("n_rows"),
        col("revenue").cast("double").as("revenue"),
        col("avg_price"), col("cust_exact"),
        (abs(col("cust_est").cast("double") - col("cust_exact").cast("double"))
          <= greatest(lit(2.0), col("cust_exact").cast("double") * lit(0.05)))
          .as("est_in_bounds"))
      .orderBy("o_ym")
  }

  private[queries] val graftMvApproxSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |ins AS (
       |  SELECT o_orderkey + 200000000 AS o_orderkey, o_custkey,
       |         o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 89 = 0),
       |merged AS (
       |  SELECT * FROM base UNION ALL SELECT * FROM ins),
       |final AS (SELECT * FROM merged WHERE o_custkey % 113 <> 0)
       |SELECT o_ym, count(*) AS n_rows,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |    / CAST(count(o_totalprice) AS DOUBLE) AS avg_price,
       |  count(DISTINCT o_custkey) AS cust_exact,
       |  TRUE AS est_in_bounds
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  /** SQL-ONLY twin: the source is a catalog table mutated by SQL UPDATE
    * and DELETE, the view is created and refreshed through
    * `CALL system.create_mv / refresh_mv`, and the result reads the
    * RENDERED temp view `refresh_mv` registers — no Scala API anywhere
    * on the user path. */
  private[queries] def graftSqlMv(s: SparkSession, dir: String): DataFrame = {
    val cat = staged.computeIfAbsent("sql:" + dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-sqlmv").toString
      val cat = "gv" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
        .createOrReplaceTempView(s"orders_mvsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
        "o_ym STRING) PARTITIONED BY (o_ym) TBLPROPERTIES ('retain'='10')")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_mvsrc_$cat") // v1
      s.sql(s"CALL $cat.system.create_mv('wh.orders_mv', 'wh.orders', " +
        "'o_ym', 'revenue,sum_okey,min_price,max_okey', " +
        "'CAST(o_totalprice AS DECIMAL(18,2));o_orderkey;" +
        "min:o_totalprice;max:o_orderkey', " +
        "'o_ym', 'o_orderkey')")
      s.sql(s"UPDATE $cat.wh.orders SET o_totalprice = o_totalprice + " +
        "1000.0 WHERE o_orderkey % 97 = 0")                                // v2
      s.sql(s"DELETE FROM $cat.wh.orders WHERE o_custkey % 991 = 0")       // v3
      s.sql(s"CALL $cat.system.refresh_mv('wh.orders_mv', 'mv_read_$cat')")
      cat
    })
    s.sql(s"SELECT o_ym, ${IncrementalView.RowsCol} AS n_rows, sum_okey, " +
      "CAST(revenue AS DOUBLE) AS revenue, min_price, max_okey " +
      s"FROM mv_read_$cat ORDER BY o_ym")
  }

  private[queries] val graftSqlMvSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey,
       |         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
       |              ELSE o_totalprice END AS o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |final AS (SELECT * FROM base WHERE o_custkey % 991 <> 0)
       |SELECT o_ym, count(*) AS n_rows,
       |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue,
       |  min(o_totalprice) AS min_price,
       |  CAST(max(o_orderkey) AS BIGINT) AS max_okey
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin
}
