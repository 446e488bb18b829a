package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.etl.{AtomicTable, MergeInto}
import graft.functions.Stable.{dsum, sqlDsum}

/** Warehouse-lifecycle queries: operators that mutate an AtomicTable
  * through its commit protocol and are then value-oracled from the
  * final table state. */
object WarehouseQueries {

  /** dir → staged merged/deleted table root (the mutation sequence runs
    * once per JVM; every pass re-reads the committed final state). */
  private val staged = new ConcurrentHashMap[String, String]()

  private val ordSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_ym", StringType)))

  /** Row-level MERGE + right-to-be-forgotten DELETE driven END-TO-END
    * through the AtomicTable commit protocol (etl/MergeInto): seed a
    * month-partitioned orders table, upsert (reprice every 97th order,
    * insert an expedited copy of every 101st), then delete every order
    * of each 991-divisible customer — keys located from the table
    * itself, so the inserted copies die with their customer. The result
    * aggregates the FINAL committed state per month; a defect anywhere
    * in the read-anti-join-union-swap chain (lost update, duplicated
    * key, resurrected delete, partition dropped or doubled) shifts a
    * count or sum and fails the value oracle, which replays the same
    * algebra over the raw parquet. */
  private[queries] def whMergeDelete(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent(dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-mergetbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      // co-locate each month before the partitioned write: file count
      // stays one-per-(month, owning task), not months x tasks
      AtomicTable.replacePartitions(s, t, base.repartition(col("o_ym")), "o_ym")
      val upd = base.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("o_orderstatus", lit("U"))
      val ins = base.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("o_orderstatus", lit("N"))
      MergeInto.upsert(s, t, ordSchema,
        upd.unionByName(ins).repartition(col("o_ym")), Seq("o_orderkey"), "o_ym")
      val gone = AtomicTable.read(s, t, ordSchema)
        .filter(col("o_custkey") % 991 === 0)
        .select("o_orderkey", "o_ym") // fast path: keys carry their month
      MergeInto.deleteKeys(s, t, ordSchema, gone, Seq("o_orderkey"), "o_ym")
      t
    })
    AtomicTable.read(s, table, ordSchema)
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_ym")
  }

  /** Merge-on-read deletion vectors driven END-TO-END (etl/MergeInto
    * deleteKeysMor / readMerged): seed the month-partitioned orders
    * table, vector-delete every 191st order (no partition rewritten —
    * the commit is a key list + manifest swap), upsert a repriced copy
    * of every 97th (each rewritten month FOLDS its outstanding vector,
    * and an upserted key that was vector-deleted is legitimately
    * resurrected — lcm(191,97) keys exercise exactly that), then
    * vector-delete every 499-divisible customer's orders through the
    * locate path (keys without partitions). The final aggregate reads
    * THROUGH live vectors — the broadcast anti-join subtract is inside
    * the oracle gate, and the oracle replays the same delete/upsert/
    * delete algebra over the raw parquet. */
  private[queries] def whDeleteMor(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("mor:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-mortbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      AtomicTable.replacePartitions(s, t, base.repartition(col("o_ym")), "o_ym")
      MergeInto.deleteKeysMor(s, t, ordSchema,
        base.filter(col("o_orderkey") % 191 === 0).select("o_orderkey", "o_ym"),
        Seq("o_orderkey"), "o_ym")
      val upd = base.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("o_orderstatus", lit("U"))
      MergeInto.upsert(s, t, ordSchema,
        upd.repartition(col("o_ym")), Seq("o_orderkey"), "o_ym")
      MergeInto.deleteKeysMor(s, t, ordSchema,
        MergeInto.readMerged(s, t, ordSchema)
          .filter(col("o_custkey") % 499 === 0).select("o_orderkey"),
        Seq("o_orderkey"), "o_ym")
      t
    })
    MergeInto.readMerged(s, table, ordSchema)
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_ym")
  }

  private[queries] val whDeleteMorSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |after_a AS (SELECT * FROM base WHERE o_orderkey % 191 <> 0),
       |upd AS (
       |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
       |         o_totalprice + 1000.0 AS o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 97 = 0),
       |merged AS (
       |  SELECT * FROM after_a
       |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
       |  UNION ALL SELECT * FROM upd),
       |final AS (SELECT * FROM merged WHERE o_custkey % 499 <> 0)
       |SELECT o_ym, count(*) AS n_rows,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM final GROUP BY o_ym ORDER BY o_ym""".stripMargin

  /** UPDATE ... SET driven END-TO-END (MergeInto.updateWhere): flag and
    * reprice every order above a total-price threshold in one
    * copy-on-write statement — both SET expressions read the ORIGINAL
    * row (simultaneous assignment, standard UPDATE semantics), months
    * with no match keep their data dirs by reference. The oracle
    * replays the CASE algebra over the raw parquet. */
  private[queries] def whUpdateWhere(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("upd:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-updtbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      AtomicTable.replacePartitions(s, t, base.repartition(col("o_ym")), "o_ym")
      MergeInto.updateWhere(s, t, ordSchema,
        col("o_totalprice") >= 200000.0,
        Map("o_orderstatus" -> lit("H"),
          "o_totalprice" -> (col("o_totalprice") + 5000.0)), "o_ym")
      t
    })
    AtomicTable.read(s, table, ordSchema)
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_orderstatus") === "H", 1L).otherwise(0L)).as("n_high"),
        dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_ym")
  }

  private[queries] val whUpdateWhereSql =
    s"""WITH base AS (
       |  SELECT o_orderkey,
       |         CASE WHEN o_totalprice >= 200000.0 THEN 'H'
       |              ELSE o_orderstatus END AS o_orderstatus,
       |         CASE WHEN o_totalprice >= 200000.0 THEN o_totalprice + 5000.0
       |              ELSE o_totalprice END AS o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders)
       |SELECT o_ym, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN o_orderstatus = 'H' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM base GROUP BY o_ym ORDER BY o_ym""".stripMargin

  private val evoSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_seg", StringType),
    StructField("o_ym", StringType)))

  /** Schema evolution driven END-TO-END (AtomicTable.readEvolved):
    * the table is written pre-evolution (no `o_seg`), then only the
    * 1997+ months are re-committed in the EVOLVED five-column shape —
    * earlier months' files are never rewritten (their data dirs are
    * asserted byte-identical in WarehouseLifecycleSpec) and the evolved
    * read fills their missing column with NULL. The aggregate counts
    * tagged rows per month; the oracle derives the same
    * null-before-evolution column from the raw parquet. */
  private[queries] def whSchemaEvolve(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("evo:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-evotbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      AtomicTable.replacePartitions(s, t, base.repartition(col("o_ym")), "o_ym")
      val upgraded = base.filter(col("o_ym") >= "1997-01")
        .withColumn("o_seg", concat(lit("S"), col("o_orderstatus")))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_seg", "o_ym")
      AtomicTable.replacePartitions(s, t, upgraded.repartition(col("o_ym")), "o_ym")
      t
    })
    AtomicTable.readEvolved(s, table, evoSchema)
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_seg").isNotNull, 1L).otherwise(0L)).as("n_tagged"),
        count_distinct(col("o_seg")).as("n_segs"))
      .orderBy("o_ym")
  }

  private[queries] val whSchemaEvolveSql =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |         strftime(o_orderdate, '%Y-%m') AS o_ym
      |  FROM orders),
      |evolved AS (
      |  SELECT o_ym,
      |         CASE WHEN o_ym >= '1997-01' THEN 'S' || o_orderstatus
      |              ELSE NULL END AS o_seg
      |  FROM base)
      |SELECT o_ym, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tagged,
      |  count(DISTINCT o_seg) AS n_segs
      |FROM evolved GROUP BY o_ym ORDER BY o_ym""".stripMargin

  /** Drop-mode expectations over the events stream (etl/Expectations):
    * CHECK tri-state end-to-end — a NULL expectation result passes
    * (ANSI CHECK), a definite FALSE drops the row. The oracle states
    * the same tri-state predicate directly. */
  private[queries] def whExpectDrop(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    graft.etl.Expectations.dropInvalid(ev, Map(
      "value_nonneg" -> (col("value") >= 0.0),
      "known_type" -> col("event_type").isin("click", "view", "purchase", "error")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"), dsum(col("value"), 6).as("total_value"))
      .orderBy("event_type")
  }

  private[queries] val whExpectDropSql =
    s"""SELECT event_type, count(*) AS n_rows,
       |  ${sqlDsum("value", 6)} AS total_value
       |FROM events
       |WHERE (value >= 0 OR value IS NULL)
       |  AND (event_type IN ('click','view','purchase','error')
       |       OR event_type IS NULL)
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The `graft` DataSource V2 format driven END-TO-END: stage a
    * month-partitioned zone-mapped orders table, vector-delete every
    * 83rd order, then read it back THROUGH `spark.read.format("graft")`
    * — partition-key and zone-map pruning pushed into the scan,
    * deletion vectors applied inside the partition reader (no join in
    * the plan), the partition column surfacing as the manifest's
    * string key. The oracle replays the filter + delete algebra over
    * the raw parquet, so a defect in the reader's type materialization
    * (timestamps included), its vector subtract, or over-eager pruning
    * fails the value compare. */
  private[queries] def graftSourceScan(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("dsv2:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-dsv2tbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      AtomicTable.replacePartitions(s, t, base.repartition(col("o_ym")), "o_ym",
        statsColumns = Seq("o_orderkey"))
      MergeInto.deleteKeysMor(s, t, ordSchema,
        base.filter(col("o_orderkey") % 83 === 0).select("o_orderkey", "o_ym"),
        Seq("o_orderkey"), "o_ym")
      t
    })
    s.read.format("graft").load(table)
      .filter(col("o_ym") >= "1995-01" && col("o_ym") <= "1996-12")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_okey"),
        dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_orderstatus")
  }

  private[queries] val graftSourceScanSql =
    s"""SELECT o_orderstatus, count(*) AS n_rows,
       |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM orders
       |WHERE o_orderkey % 83 <> 0
       |  AND strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1996-12'
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** The graft CHANGEFEED driven END-TO-END: the events table is
    * committed to an AtomicTable as three epoch commits, then read back
    * as a STREAM (`spark.readStream.format("graft")`, offsets =
    * table versions, Trigger.AvailableNow) through the micro-batch
    * manifest diff, drained to a buffer, and aggregated. Every pass
    * uses a fresh checkpoint, so the drain deterministically replays
    * the full feed — which for the append-only epoch commits is
    * exactly the table — and the oracle replays the same aggregate
    * over the raw parquet. A defect in offset bookkeeping, the diff,
    * or the streaming reader path drops or doubles an epoch and fails
    * the value compare. */
  private[queries] def graftChangefeed(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("cdf:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-cdftbl").toString
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        concat(lit("e"), (col("user_id") % 3).cast("string")).as("epoch"))
      for (i <- 0 until 3)
        AtomicTable.replacePartitions(s, t,
          ev.filter(col("user_id") % 3 === i).repartition(col("epoch")),
          "epoch", retain = 10)
      t
    })
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String, Double)]()
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-cdfq-ckpt").toString
    val q = s.readStream.format("graft").load(table)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("user_id", "event_id", "event_type", "value").collect()
          .foreach { r =>
            buf.add((r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
            ()
          }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    import scala.jdk.CollectionConverters._
    import s.implicits._
    buf.asScala.toSeq.toDF("user_id", "event_id", "event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("event_id")).as("sum_eid"),
        dsum(col("value"), 6).as("total_value"))
      .orderBy("event_type")
  }

  private[queries] val graftChangefeedSql =
    s"""SELECT event_type, count(*) AS n_rows,
       |  CAST(sum(event_id) AS BIGINT) AS sum_eid,
       |  ${sqlDsum("value", 6)} AS total_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** The STREAMING change feed with row-level attribution
    * (`readStream` + `readChangeFeed=true`): the same three-epoch
    * staged table as [[graftChangefeed]], drained through the CDF
    * micro-batch source, where every row carries the `_commit_version`
    * of the commit that inserted it. Epoch i was committed as version
    * i+1 with rows `user_id % 3 = i`, so the oracle derives each row's
    * commit version arithmetically from the raw parquet — an
    * off-by-one in offset bookkeeping, a version mis-attributed, or a
    * dropped/doubled epoch shifts a group and fails the compare. */
  private[queries] def graftStreamCdf(s: SparkSession, dir: String): DataFrame = {
    graftChangefeed(s, dir) // ensure the staged epoch table exists
    val table = staged.get("cdf:" + dir)
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-scdf-ckpt").toString
    val q = s.readStream.format("graft").option("readChangeFeed", "true")
      .load(table)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.select("event_id", "_commit_version", "_change_type").collect()
          .foreach { r => buf.add((r.getLong(0), r.getLong(1), r.getString(2))); () }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    import scala.jdk.CollectionConverters._
    import s.implicits._
    buf.asScala.toSeq.toDF("event_id", "commit_version", "change_type")
      .groupBy("commit_version", "change_type")
      .agg(count(lit(1)).as("n_rows"), sum(col("event_id")).as("sum_eid"))
      .orderBy("commit_version")
  }

  private[queries] val graftStreamCdfSql =
    """SELECT CAST(user_id % 3 + 1 AS BIGINT) AS commit_version,
      |  'insert' AS change_type, count(*) AS n_rows,
      |  CAST(sum(event_id) AS BIGINT) AS sum_eid
      |FROM events GROUP BY 1, 2 ORDER BY commit_version""".stripMargin

  /** The graft WRITE path driven END-TO-END: orders written through
    * `df.write.format("graft")` (task-side parquet staging into a
    * fresh txn dir, driver-side manifest commit through the claim
    * loop), then read back through `spark.read.format("graft")` and
    * aggregated per month. Covers the writer's type encoding
    * (timestamps as INT64 micros among them), the dynamic-partition
    * commit, and the scan — any loss, duplication, or type skew fails
    * the value oracle over the raw parquet. */
  private[queries] def graftWriteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("w:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-wtbl")
        .resolve("orders").toString
      Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"),
          date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
        .repartition(col("o_ym"))
        .write.format("graft").option("partition", "o_ym")
        .mode("append").save(t)
      t
    })
    s.read.format("graft").load(table)
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_okey"),
        countDistinct(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("n_days"),
        dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_ym")
  }

  private[queries] val graftWriteRoundtripSql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS o_ym,
       |  count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  count(DISTINCT strftime(o_orderdate, '%Y-%m-%d')) AS n_days,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** The graft STREAMING SINK driven END-TO-END: the events table
    * flows as a file-source stream (3 micro-batches by event-id
    * residue) through `writeStream.format("graft")` — each epoch one
    * atomic dynamic-partition commit with the epoch riding the same
    * manifest swap — then the sunk table is read back through the
    * format and aggregated. The oracle replays the aggregate over the
    * raw events: a lost epoch, a doubled replay, or a writer type skew
    * fails the value compare. */
  private[queries] def graftStreamSink(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("sink:" + dir, { _ =>
      val base = java.nio.file.Files.createTempDirectory("graft-sinkq")
      val src = base.resolve("src")
      val t = base.resolve("t").toString
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        concat(lit("r"), (col("event_id") % 3).cast("string")).as("p"))
      for (i <- 0 until 3) {
        ev.filter(col("event_id") % 3 === i).coalesce(1)
          .write.parquet(src.resolve(s"b$i").toString)
        Thread.sleep(20)
      }
      val q = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString + "/*")
        .writeStream.format("graft")
        .option("partition", "p")
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(t)
      try q.awaitTermination() finally q.stop()
      t
    })
    s.read.format("graft").load(table)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("event_id")).as("sum_eid"),
        count_distinct(col("p")).as("n_parts"),
        dsum(col("value"), 6).as("total_value"))
      .orderBy("event_type")
  }

  private[queries] val graftStreamSinkSql =
    s"""SELECT event_type, count(*) AS n_rows,
       |  CAST(sum(event_id) AS BIGINT) AS sum_eid,
       |  count(DISTINCT event_id % 3) AS n_parts,
       |  ${sqlDsum("value", 6)} AS total_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  private val cdcSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", TimestampType),
    StructField("p", StringType)))

  /** CDC apply driven END-TO-END (etl/MergeInto.applyChanges — the
    * streaming-MERGE batch kernel): the events table becomes a change
    * stream keyed by user (op 'd' on error events, upsert otherwise,
    * per-key order by (ts, event_id)), split into two change batches by
    * event parity and applied sequentially to a user-bucketed
    * AtomicTable. Batch boundaries matter — a user's state after batch
    * 2 is batch 2's winner even when batch 1 held a later timestamp —
    * and the oracle replays exactly that two-level (batch, seq)
    * resolution. A defect in the last-writer pick, the anti-join, the
    * single-commit delete path, or partition bookkeeping changes the
    * surviving row set and fails the value oracle. */
  private[queries] def whCdcApply(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("cdc:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-cdctbl").toString
      val ch = Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts"), (col("user_id") % 8).cast("string").as("p"),
        when(col("event_type") === "error", lit("d")).otherwise(lit("u")).as("op"))
      MergeInto.applyChanges(s, t, cdcSchema,
        ch.filter(col("event_id") % 2 === 0),
        Seq("user_id"), "p", "op", Seq("ts", "event_id"))
      MergeInto.applyChanges(s, t, cdcSchema,
        ch.filter(col("event_id") % 2 === 1),
        Seq("user_id"), "p", "op", Seq("ts", "event_id"))
      t
    })
    AtomicTable.read(s, table, cdcSchema)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("p"))
      .orderBy("user_id")
  }

  private[queries] val whCdcApplySql =
    """WITH c AS (
      |  SELECT user_id, event_id, event_type, value, ts,
      |         CAST(user_id % 8 AS VARCHAR) AS p,
      |         CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
      |         event_id % 2 AS batch
      |  FROM events),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY batch DESC, ts DESC, event_id DESC) AS rn
      |  FROM c),
      |final AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'd')
      |SELECT user_id, event_id, event_type, value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, p
      |FROM final ORDER BY user_id""".stripMargin

  private[queries] val whMergeDeleteSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |upd AS (
       |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
       |         o_totalprice + 1000.0 AS o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 97 = 0),
       |ins AS (
       |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
       |         'N' AS o_orderstatus, o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 101 = 0),
       |merged AS (
       |  SELECT * FROM base
       |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
       |  UNION ALL SELECT * FROM upd
       |  UNION ALL SELECT * FROM ins),
       |final AS (SELECT * FROM merged WHERE o_custkey % 991 <> 0)
       |SELECT o_ym, count(*) AS n_rows,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM final GROUP BY o_ym ORDER BY o_ym""".stripMargin

  private val ttSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_totalprice", DoubleType),
    StructField("o_year", StringType)))

  private val ttStaged = new ConcurrentHashMap[String, String]()

  /** Time travel + RESTORE driven end-to-end through the commit log:
    * seed a year-partitioned orders table over three commits (years up
    * to 1997; then 1998-1999; then a bad reprice of 1996 — a ONE-partition
    * revision, everything else carried in the manifest by reference),
    * RESTORE to the pre-reprice version, and aggregate four snapshots:
    * `readAt` v1, TIMESTAMP AS OF v2's commit instant (strict
    * commit-time monotonicity makes the resolution unambiguous), `readAt`
    * the bad v3 (history is never rewound — the bad commit stays
    * auditable inside retention), and the restored current. The oracle
    * replays each snapshot's algebra over the raw parquet, so a defect
    * anywhere — timestamp resolution off by one version, restore losing
    * or doubling a partition, the v3 reprice leaking into the restored
    * head — shifts a count or sum and fails the value gate. */
  private[queries] def whTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val table = ttStaged.computeIfAbsent(dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-tttbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
      def commit(rows: DataFrame): Unit = {
        AtomicTable.replacePartitions(s, t, rows.repartition(col("o_year")),
          "o_year", retain = 10, statsColumns = Seq("o_orderkey"))
        ()
      }
      commit(base.filter(col("o_year") <= "1997"))            // v1
      commit(base.filter(col("o_year").isin("1998", "1999"))) // v2
      commit(base.filter(col("o_year") === "1996")            // v3: bad reprice
        .withColumn("o_totalprice", col("o_totalprice") + lit(100.0)))
      AtomicTable.restore(java.nio.file.Paths.get(t), 2L, retain = 10) // v4
      t
    })
    val root = java.nio.file.Paths.get(table)
    def snap(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("revenue"))
        .select(lit(label).as("snap"), col("n_rows"), col("revenue"))
    snap("v1", AtomicTable.readAt(s, table, ttSchema, 1L))
      .unionByName(snap("v2_ts", AtomicTable.readAsOf(s, table, ttSchema,
        AtomicTable.commitTimeMs(root, 2L))))
      .unionByName(snap("v3", AtomicTable.readAt(s, table, ttSchema, 3L)))
      .unionByName(snap("current", AtomicTable.read(s, table, ttSchema)))
      .orderBy("snap")
  }

  /** warehouse dir → (catalog name, warehouse root) — one SQL-DDL'd
    * catalog per input dir per JVM. */
  private val catStaged = new ConcurrentHashMap[String, (String, String)]()

  /** The SQL catalog driven END-TO-END from pure SQL: register a
    * [[graft.sources.GraftCatalog]], CREATE TABLE ... PARTITIONED BY
    * with a retention TBLPROPERTY, fill it over three commits
    * (years to 1997; 1998-1999; a bad reprice of 1996 via INSERT
    * OVERWRITE PARTITION — plain INSERT appends), then aggregate three
    * snapshots resolved by Spark's OWN time-travel syntax: VERSION AS
    * OF 1, TIMESTAMP AS OF v2's commit instant, and the head. The
    * oracle replays each snapshot's algebra over the raw parquet; a
    * defect in catalog resolution, the declared-schema insert path, the
    * retention plumbing, or version/timestamp resolution shifts a count
    * or sum and fails the value gate. */
  private[queries] def whSqlCatalog(s: SparkSession, dir: String): DataFrame = {
    val (cat, w) = catStaged.computeIfAbsent(dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-catq").toString
      val cat = "gq" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_src_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) " +
        "TBLPROPERTIES ('retain'='10', 'stats_columns'='o_orderkey')")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_src_$cat " +
        "WHERE o_year <= '1997'")                                      // v1
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_src_$cat " +
        "WHERE o_year IN ('1998', '1999')")                            // v2
      s.sql(s"INSERT OVERWRITE $cat.wh.orders PARTITION (o_year = '1996') " + // v3
        s"SELECT o_orderkey, o_totalprice + 100.0 " +
        s"FROM orders_src_$cat WHERE o_year = '1996'")
      (cat, w)
    })
    val t2 = AtomicTable.commitTimeMs(
      java.nio.file.Paths.get(w, "wh", "orders"), 2L)
    def snap(label: String, from: String): DataFrame =
      s.sql(s"SELECT o_totalprice FROM $from")
        .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("revenue"))
        .select(lit(label).as("snap"), col("n_rows"), col("revenue"))
    snap("v1", s"$cat.wh.orders VERSION AS OF 1")
      .unionByName(snap("v2_ts", s"$cat.wh.orders TIMESTAMP AS OF timestamp_millis($t2)"))
      .unionByName(snap("current", s"$cat.wh.orders"))
      .orderBy("snap")
  }

  private[queries] val whSqlCatalogSql =
    s"""WITH o AS (
       |  SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y') AS y
       |  FROM orders),
       |upto97 AS (SELECT * FROM o WHERE y <= '1997'),
       |upto99 AS (SELECT * FROM o WHERE y <= '1999')
       |SELECT * FROM (
       |  SELECT 'v1' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("o_totalprice", 2)} AS revenue FROM upto97
       |  UNION ALL
       |  SELECT 'v2_ts' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("o_totalprice", 2)} AS revenue FROM upto99
       |  UNION ALL
       |  SELECT 'current' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("CASE WHEN y = '1996' THEN o_totalprice + 100.0 " +
            "ELSE o_totalprice END", 2)} AS revenue FROM upto99
       |) ORDER BY snap""".stripMargin

  private val mergeStaged = new ConcurrentHashMap[String, String]()

  /** SQL row-level operations driven END-TO-END: seed a year-partitioned
    * catalog table from orders, then mutate it purely in SQL — MERGE
    * INTO (reprice every 97th order, insert a year-2000 copy of every
    * 101st under key+3e6), row-level DELETE (every 991-divisible key,
    * inserted copies included), metadata-only DELETE (year 1992 — one
    * manifest commit, zero bytes scanned), and UPDATE (+1 on every
    * 500-divisible key). The oracle replays the same four steps as
    * relational algebra over the raw parquet, so a defect in the MERGE
    * rewrite, the group-replace commit, partition-granular runtime
    * filtering, or the metadata-delete short-circuit shifts a per-year
    * count or sum and fails the value gate. */
  private[queries] def whSqlMerge(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir, { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-mrgq").toString
      val cat = "gm" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_msrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) TBLPROPERTIES ('stats_columns'='o_orderkey')")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_msrc_$cat")
      s.sql(s"""MERGE INTO $cat.wh.orders t USING (
        SELECT o_orderkey AS k, o_totalprice AS tp, o_year AS y
        FROM orders_msrc_$cat WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey + 3000000 AS k, o_totalprice AS tp, '2000' AS y
        FROM orders_msrc_$cat WHERE o_orderkey % 101 = 0
      ) s ON t.o_orderkey = s.k
      WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + 10.0
      WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice, o_year)
        VALUES (s.k, s.tp, s.y)""")
      s.sql(s"DELETE FROM $cat.wh.orders WHERE o_orderkey % 991 = 0")
      s.sql(s"DELETE FROM $cat.wh.orders WHERE o_year = '1992'")
      s.sql(s"UPDATE $cat.wh.orders SET o_totalprice = o_totalprice + 1.0 " +
        "WHERE o_orderkey % 500 = 0")
      // cross-partition row move: the UPDATE changes the partition key,
      // so matched rows DELETE from their year and APPEND into the
      // existing '2000' partition (whose prior rows must survive) in
      // one atomic commit — the delete+insert rewrite path
      s.sql(s"UPDATE $cat.wh.orders SET o_year = '2000' " +
        "WHERE o_orderkey % 499 = 0")
      cat
    })
    s.sql(s"SELECT o_year, o_totalprice FROM $cat.wh.orders")
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_year")
  }

  /** Partition-BOUNDED SQL MERGE: the source's matched keys all live in
    * year 1994, so runtime group filtering narrows the copy-on-write
    * rewrite to that single partition, while the NOT MATCHED inserts
    * land in the EXISTING year-1997 partition — which the narrowed scan
    * never read, so they append a dir to it rather than replacing it —
    * all in one atomic commit. At 100 TB this is the difference between
    * merging a day and rewriting the table. The oracle replays both arms
    * relationally; clobbering 1997's prior rows, losing the inserts, or
    * rewriting unmatched years all shift a per-year count/sum. The
    * structural pin (exactly one partition rewritten, insert target
    * appended) is GraftRowLevelSpec's keyed-MERGE tests. */
  private[queries] def whSqlMergeBounded(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#bounded", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-mrgb").toString
      val cat = "gb" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_bsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year)")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_bsrc_$cat")
      s.sql(s"""MERGE INTO $cat.wh.orders t USING (
        SELECT o_orderkey AS k, o_totalprice AS tp
        FROM orders_bsrc_$cat WHERE o_year = '1994' AND o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 3000000 AS k, o_totalprice AS tp
        FROM orders_bsrc_$cat WHERE o_year = '1994' AND o_orderkey % 11 = 0
      ) s ON t.o_orderkey = s.k
      WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + 5.0
      WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice, o_year)
        VALUES (s.k, s.tp, '1997')""")
      cat
    })
    s.sql(s"SELECT o_year, o_totalprice FROM $cat.wh.orders")
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_rows"), dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_year")
  }

  private[queries] val whSqlMergeBoundedSql =
    s"""WITH o AS (
       |  SELECT o_orderkey AS k, o_totalprice AS tp,
       |    strftime(o_orderdate, '%Y') AS y FROM orders),
       |merged AS (
       |  SELECT k, CASE WHEN y = '1994' AND k % 7 = 0 THEN tp + 5.0 ELSE tp END
       |    AS tp, y FROM o
       |  UNION ALL
       |  SELECT k + 3000000 AS k, tp, '1997' AS y FROM o
       |  WHERE y = '1994' AND k % 11 = 0)
       |SELECT y AS o_year, count(*) AS n_rows, ${sqlDsum("tp", 2)} AS revenue
       |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  private[queries] val whSqlMergeSql =
    s"""WITH o AS (
       |  SELECT o_orderkey AS k, o_totalprice AS tp,
       |    strftime(o_orderdate, '%Y') AS y FROM orders),
       |merged AS (
       |  SELECT k, CASE WHEN k % 97 = 0 THEN tp + 10.0 ELSE tp END AS tp, y FROM o
       |  UNION ALL
       |  SELECT k + 3000000 AS k, tp, '2000' AS y FROM o WHERE k % 101 = 0),
       |d1 AS (SELECT * FROM merged WHERE k % 991 <> 0),
       |d2 AS (SELECT * FROM d1 WHERE y <> '1992'),
       |u AS (SELECT k, CASE WHEN k % 500 = 0 THEN tp + 1.0 ELSE tp END AS tp, y
       |  FROM d2),
       |mv AS (SELECT k, tp,
       |  CASE WHEN k % 499 = 0 THEN '2000' ELSE y END AS y FROM u)
       |SELECT y AS o_year, count(*) AS n_rows, ${sqlDsum("tp", 2)} AS revenue
       |FROM mv GROUP BY 1 ORDER BY 1""".stripMargin

  private[queries] val whTimeTravelSql =
    s"""WITH o AS (
       |  SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y') AS y
       |  FROM orders),
       |upto97 AS (SELECT * FROM o WHERE y <= '1997'),
       |upto99 AS (SELECT * FROM o WHERE y <= '1999')
       |SELECT * FROM (
       |  SELECT 'v1' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("o_totalprice", 2)} AS revenue FROM upto97
       |  UNION ALL
       |  SELECT 'v2_ts' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("o_totalprice", 2)} AS revenue FROM upto99
       |  UNION ALL
       |  SELECT 'v3' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("CASE WHEN y = '1996' THEN o_totalprice + 100.0 " +
            "ELSE o_totalprice END", 2)} AS revenue FROM upto99
       |  UNION ALL
       |  SELECT 'current' AS snap, count(*) AS n_rows,
       |    ${sqlDsum("o_totalprice", 2)} AS revenue FROM upto99
       |) ORDER BY snap""".stripMargin

  /** Row-level CHANGE-DATA-CAPTURE over a MERGE + DELETE history
    * (etl/ChangeFeed): seed the month-partitioned orders table (v1),
    * MERGE-upsert a repriced copy of every 97th order plus a brand-new
    * copy of every 101st (v2 — a partition REWRITE the feed must diff
    * by key into update_preimage/update_postimage/insert, with
    * untouched rows emitting NOTHING), then DELETE every 991-divisible
    * customer's orders (v3 — copy-on-write rewrites plus same-commit
    * drops of emptied partitions, both classifying as delete with the
    * POST-MERGE preimage). The feed is derived purely from retained
    * manifests — no change files exist — and the oracle replays the
    * same change algebra over the raw parquet; a mislabeled class,
    * lost preimage, doubled row, or a spurious row from an untouched
    * partition shifts a group and fails the value compare. */
  private[queries] def graftCdfMerge(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("cdfm:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-cdfmtbl").toString
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
      AtomicTable.replacePartitions(s, t,
        base.repartition(col("o_ym")), "o_ym", retain = 10)          // v1
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
      t
    })
    val head = AtomicTable.currentVersion(java.nio.file.Paths.get(table)).get
    graft.etl.ChangeFeed
      .changes(s, table, ordSchema, 2L, head, keyCols = Seq("o_orderkey"))
      .groupBy(col(graft.etl.ChangeFeed.ChangeTypeCol).as("change_type"),
        col(graft.etl.ChangeFeed.CommitVersionCol).as("commit_version"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_okey"),
        dsum(col("o_totalprice"), 2).as("price_sum"))
      .orderBy("change_type", "commit_version")
  }

  /** Multi-level partitioning driven END-TO-END through the DSv2
    * writer and scan: orders land in a TWO-LEVEL (month, status)
    * graft table (`.option("partition", "o_ym,o_orderstatus")` —
    * nested `o_ym=…/o_orderstatus=…` dirs, composite manifest keys),
    * then the read filters on BOTH levels (a month range plus a
    * status equality — each prunes its own level of the composite key
    * from metadata) and aggregates per month. The oracle replays the
    * same filter over the raw parquet: a mis-parsed composite key, a
    * level swapped or dropped in the scan's restore, or over-pruning
    * on either level shifts a group and fails the value compare. */
  private[queries] def graftTwoLevel(s: SparkSession, dir: String): DataFrame = {
    val table = staged.computeIfAbsent("2lvl:" + dir, { _ =>
      val t = java.nio.file.Files.createTempDirectory("graft-2lvl")
        .resolve("orders").toString
      Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"),
          col("o_orderstatus"))
        .repartition(col("o_ym"), col("o_orderstatus"))
        .write.format("graft").mode("append")
        .option("partition", "o_ym,o_orderstatus").save(t)
      t
    })
    s.read.format("graft").load(table)
      .filter(col("o_ym") >= "1995-01" && col("o_ym") <= "1995-12" &&
        col("o_orderstatus") === "F")
      .groupBy("o_ym")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_okey"),
        dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_ym")
  }

  private[queries] val graftTwoLevelSql =
    s"""SELECT strftime(o_orderdate, '%Y-%m') AS o_ym, count(*) AS n_rows,
       |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM orders
       |WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '1995-01' AND '1995-12'
       |  AND o_orderstatus = 'F'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** SQL-ONLY row-level CDC: the same change classes as
    * `graft_cdf_merge`, but with every step in SQL — the table is a
    * catalog table mutated by SQL UPDATE (v2, a copy-on-write rewrite
    * whose unchanged rows must emit nothing) and SQL DELETE (v3), and
    * the changefeed comes through `CALL system.table_changes(...)`,
    * which registers the lazy distributed change frame as a temp view
    * (the Iceberg `create_changelog_view` contract — a LocalScan
    * result can only carry metadata, so the rows stay on the
    * executors). The oracle replays the same change algebra
    * relationally. */
  private[queries] def graftSqlChanges(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#sqlchanges", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-sqlch").toString
      val cat = "gf" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_ym"))
        .createOrReplaceTempView(s"orders_csrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
        "o_ym STRING) PARTITIONED BY (o_ym) TBLPROPERTIES ('retain'='10')")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_csrc_$cat") // v1
      s.sql(s"UPDATE $cat.wh.orders SET o_totalprice = o_totalprice + " +
        "1000.0 WHERE o_orderkey % 97 = 0")                               // v2
      s.sql(s"DELETE FROM $cat.wh.orders WHERE o_custkey % 991 = 0")      // v3
      s.sql(s"CALL $cat.system.table_changes(" +
        s"'wh.orders', 2, 3, 'o_orderkey', 'changes_$cat')")
      cat
    })
    s.table(s"changes_$cat")
      .groupBy(col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_okey"),
        dsum(col("o_totalprice"), 2).as("price_sum"))
      .orderBy("change_type", "commit_version")
  }

  private[queries] val graftSqlChangesSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |upd AS (SELECT * FROM base WHERE o_orderkey % 97 = 0),
       |merged AS (
       |  SELECT o_orderkey, o_custkey,
       |    CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
       |         ELSE o_totalprice END AS o_totalprice, o_ym
       |  FROM base),
       |chg AS (
       |  SELECT 'update_preimage' AS change_type, 2 AS commit_version,
       |         o_orderkey, o_totalprice FROM upd
       |  UNION ALL
       |  SELECT 'update_postimage', 2, o_orderkey, o_totalprice + 1000.0
       |  FROM upd
       |  UNION ALL
       |  SELECT 'delete', 3, o_orderkey, o_totalprice
       |  FROM merged WHERE o_custkey % 991 = 0)
       |SELECT change_type, CAST(commit_version AS BIGINT) AS commit_version,
       |  count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS price_sum
       |FROM chg GROUP BY change_type, commit_version
       |ORDER BY change_type, commit_version""".stripMargin

  /** SQL maintenance lifecycle: fragment with three appends → `CALL
    * system.compact` (targeted small-file fold) → a bad DELETE → `CALL
    * system.rollback` (restore the pre-delete snapshot as a new commit)
    * → `CALL system.vacuum`. Every maintenance operation is
    * metadata/layout-plane — none may change the table's LOGICAL
    * content, and the rollback must undo the delete exactly — so the
    * oracle is simply the staged input aggregated: any compaction row
    * loss, partial rollback, or vacuum eating referenced bytes shifts a
    * per-year count/sum. The structural pins (only fragmented
    * partitions rewrite; vacuum only reclaims unreferenced dirs;
    * history stays readable) are GraftCatalogSpec's. At 100 TB the
    * compaction cost is ∝ fragmented partitions, never table size. */
  private[queries] def graftSqlMaintain(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#maint", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-mnt").toString
      val cat = "gn" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_mntsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) TBLPROPERTIES ('retain'='10', " +
        "'stats_columns'='o_orderkey', 'cluster_by'='o_orderkey')")
      // three appends leave every year with >=3 files: small-file debt
      // (cluster_by makes the CALL compact below range-cluster the
      // rewrite — oracle-neutral: clustering never changes content)
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_mntsrc_$cat " +
        "WHERE o_orderkey % 3 = 0")                                    // v1
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_mntsrc_$cat " +
        "WHERE o_orderkey % 3 = 1")                                    // v2
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_mntsrc_$cat " +
        "WHERE o_orderkey % 3 = 2")                                    // v3
      s.sql(s"CALL $cat.system.compact('wh.orders', 2)")               // v4
      s.sql(s"DELETE FROM $cat.wh.orders WHERE o_orderkey % 7 = 0")    // v5: bad
      s.sql(s"CALL $cat.system.rollback('wh.orders', 4)")              // v6 = v4
      s.sql(s"CALL $cat.system.vacuum('wh.orders', 0)")
      cat
    })
    s.sql(s"SELECT o_year, o_orderkey, o_totalprice FROM $cat.wh.orders")
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_okey"),
        dsum(col("o_totalprice"), 2).as("revenue"))
      .orderBy("o_year")
  }

  private[queries] val graftSqlMaintainSql =
    s"""SELECT strftime(o_orderdate, '%Y') AS o_year, count(*) AS n_rows,
       |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS revenue
       |FROM orders
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** FILE-level data skipping end-to-end: three range-disjoint INSERTs
    * leave every year partition with three files whose recorded
    * o_orderkey bounds don't overlap, and the middle-third range read
    * must plan ONE file per partition (GraftFileSkipSpec pins the
    * planned-file count; this query oracles the VALUES — any file
    * wrongly skipped drops a year's count/sum, any boundary slip
    * double-counts). The partition zone maps can't help here (every
    * year spans the full key range); only per-file bounds prune. At
    * 100 TB this is Iceberg's per-data-file column bounds: the
    * difference between reading a day and reading the two files in it
    * whose range matches. */
  private[queries] def graftFileSkip(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#fskip", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-fsk").toString
      val cat = "gk" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_fsksrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) TBLPROPERTIES " +
        "('retain'='5', 'stats_columns'='o_orderkey')")
      // three RANGE-disjoint appends: every year partition ends with
      // three files of non-overlapping o_orderkey bounds
      val t1 = s"(SELECT max(o_orderkey) DIV 3 FROM orders_fsksrc_$cat)"
      val t2 = s"(SELECT 2 * (max(o_orderkey) DIV 3) FROM orders_fsksrc_$cat)"
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_fsksrc_$cat " +
        s"WHERE o_orderkey <= $t1")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_fsksrc_$cat " +
        s"WHERE o_orderkey > $t1 AND o_orderkey <= $t2")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_fsksrc_$cat " +
        s"WHERE o_orderkey > $t2")
      cat
    })
    // middle-third read: per partition, bounds refute files 1 and 3
    s.sql(s"""SELECT o_year, count(*) AS n_rows,
      sum(o_orderkey) AS sum_okey
      FROM $cat.wh.orders
      WHERE o_orderkey > (SELECT max(o_orderkey) DIV 3
                          FROM orders_fsksrc_$cat)
        AND o_orderkey <= (SELECT 2 * (max(o_orderkey) DIV 3)
                           FROM orders_fsksrc_$cat)
      GROUP BY o_year ORDER BY o_year""")
  }

  /** ANALYZE-then-skip: the same range-disjoint staging as
    * `graft_file_skip` but with NO declared stats — the writer records
    * nothing, and `CALL system.analyze` backfills both zone-map levels
    * from one column-pruned scan (a stats-only commit; zero data bytes
    * move). The same middle-third read then prunes per file. Shares
    * [[graftFileSkipSql]]: analyze must never change logical content,
    * and a backfilled bound that is too narrow drops a year's rows. */
  private[queries] def graftAnalyze(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#analyze", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-anl").toString
      val cat = "ga" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_anlsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) TBLPROPERTIES ('retain'='5')")
      val t1 = s"(SELECT max(o_orderkey) DIV 3 FROM orders_anlsrc_$cat)"
      val t2 = s"(SELECT 2 * (max(o_orderkey) DIV 3) FROM orders_anlsrc_$cat)"
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_anlsrc_$cat " +
        s"WHERE o_orderkey <= $t1")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_anlsrc_$cat " +
        s"WHERE o_orderkey > $t1 AND o_orderkey <= $t2")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_anlsrc_$cat " +
        s"WHERE o_orderkey > $t2")
      s.sql(s"CALL $cat.system.analyze('wh.orders', 'o_orderkey')")
      cat
    })
    s.sql(s"""SELECT o_year, count(*) AS n_rows,
      sum(o_orderkey) AS sum_okey
      FROM $cat.wh.orders
      WHERE o_orderkey > (SELECT max(o_orderkey) DIV 3
                          FROM orders_anlsrc_$cat)
        AND o_orderkey <= (SELECT 2 * (max(o_orderkey) DIV 3)
                           FROM orders_anlsrc_$cat)
      GROUP BY o_year ORDER BY o_year""")
  }

  /** Metadata-only aggregation: COUNT(*)/MIN/MAX grouped by the
    * partition column, answered ENTIRELY from the manifest (complete
    * DSv2 aggregate pushdown — GraftAggPushSpec pins that this plan
    * survives physically deleting every data file). At 100 TB this is
    * "count the table" as a metadata lookup instead of a full scan.
    * Value-oracled against the same algebra over the raw parquet. */
  private[queries] def graftAggPush(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#aggpush", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-agg").toString
      val cat = "gg" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_aggsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.orders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) TBLPROPERTIES " +
        "('retain'='5', 'stats_columns'='o_orderkey,o_totalprice')")
      // two appends per year: the manifest folds each partition's
      // bounds across dirs, which is what the pushdown answers from
      val mid = s"(SELECT max(o_orderkey) DIV 2 FROM orders_aggsrc_$cat)"
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_aggsrc_$cat " +
        s"WHERE o_orderkey <= $mid")
      s.sql(s"INSERT INTO $cat.wh.orders SELECT * FROM orders_aggsrc_$cat " +
        s"WHERE o_orderkey > $mid")
      cat
    })
    s.sql(s"""SELECT o_year, count(*) AS n_rows,
      min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey,
      min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM $cat.wh.orders
      GROUP BY o_year ORDER BY o_year""")
  }

  /** LIMIT / TopN pushdown over the same staged year-partitioned table:
    * `ORDER BY o_year DESC LIMIT 50` keeps only the newest partition's
    * files (whole-partition ordering is exact — the key is constant
    * within a partition), `LIMIT 500` stops planning files once the
    * manifest's file-level row counts cover 500 (GraftLimitPushSpec pins
    * the plan shapes). Both wrapped in aggregates so the row set is
    * deterministic and value-oracled: the top-50 by year DESC all fall
    * in the max year (>= 50 rows there at every tested SF), and the
    * bare-limit row COUNT is limit-exact regardless of which rows. */
  private[queries] def graftLimitPush(s: SparkSession, dir: String): DataFrame = {
    graftAggPush(s, dir).collect() // ensure the shared staged table exists
    val cat = mergeStaged.get(dir + "#aggpush")
    s.sql(s"""SELECT probe, o_year, n FROM (
      SELECT 'topn' AS probe, o_year, count(*) AS n
      FROM (SELECT o_year FROM $cat.wh.orders ORDER BY o_year DESC LIMIT 50)
      GROUP BY o_year
      UNION ALL
      SELECT 'limit' AS probe, CAST(NULL AS STRING) AS o_year, count(*) AS n
      FROM (SELECT o_orderkey FROM $cat.wh.orders LIMIT 500))
      ORDER BY probe""")
  }

  /** Bucketed fact-to-fact join: orders and customer both
    * `PARTITIONED BY (bucket(16, custkey))` in the graft catalog, joined
    * on the key and aggregated by market segment. GraftBucketSpec pins
    * the plan claims (one file per bucket per commit, one-of-N point
    * pruning, ZERO-exchange storage-partitioned join under
    * `spark.sql.sources.v2.bucketing.enabled`); this query value-oracles
    * the layout — a wrong bucket id on either side silently drops or
    * duplicates join rows, which the per-segment counts and decimal sums
    * catch. At 100 TB this layout is "join two facts on the key without
    * shuffling either side". */
  private[queries] def graftBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#bucket", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-bktq").toString
      val cat = "gb" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView(s"orders_bsrc_$cat")
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
        .createOrReplaceTempView(s"cust_bsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.borders " +
        "(o_custkey BIGINT, o_totalprice DOUBLE) " +
        "PARTITIONED BY (bucket(16, o_custkey)) " +
        "TBLPROPERTIES ('stats_columns'='o_custkey')")
      s.sql(s"CREATE TABLE $cat.wh.bcust " +
        "(c_custkey BIGINT, c_mktsegment STRING) " +
        "PARTITIONED BY (bucket(16, c_custkey))")
      s.sql(s"INSERT INTO $cat.wh.borders SELECT * FROM orders_bsrc_$cat")
      s.sql(s"INSERT INTO $cat.wh.bcust SELECT * FROM cust_bsrc_$cat")
      cat
    })
    s.sql(s"""SELECT c.c_mktsegment, count(*) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM $cat.wh.borders o JOIN $cat.wh.bcust c
        ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
  }

  private[queries] val graftBucketJoinSql =
    """SELECT c.c_mktsegment, count(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  /** Monotone time-transform layout: orders staged
    * `PARTITIONED BY (months(o_orderdate))` and range-queried on the
    * SOURCE date — the scan prunes every month before the literal's
    * (GraftTimePartSpec pins the planned partitions; hashing cannot do
    * this). Value-oracled: a wrong month boundary on either the write
    * or the prune side shifts a per-month count/sum. */
  private[queries] def graftTimePart(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#timepart", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-tpq").toString
      val cat = "gt" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .createOrReplaceTempView(s"orders_tsrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.torders " +
        "(o_orderkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE) " +
        "PARTITIONED BY (months(o_orderdate))")
      s.sql(s"INSERT INTO $cat.wh.torders SELECT * FROM orders_tsrc_$cat")
      cat
    })
    s.sql(s"""SELECT date_format(o_orderdate, 'yyyy-MM') AS o_month,
      count(*) AS n_rows,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM $cat.wh.torders
      WHERE o_orderdate >= DATE'1997-06-15'
      GROUP BY 1 ORDER BY 1""")
  }

  private[queries] val graftTimePartSql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
      |  count(*) AS n_rows,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderdate >= DATE'1997-06-15'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Range-clustered ingestion: orders staged with
    * `write_order='o_orderkey'` on year partitions — every INSERT
    * range-sorts, so each year's files are key-disjoint AT WRITE TIME
    * and the mid-range read below prunes to the files whose bounds
    * admit (GraftWriteOrderSpec pins disjointness and the one-file
    * point read; partition maps can't help here — every year spans the
    * key range, only per-file bounds prune). Value-oracled. */
  private[queries] def graftWriteOrder(s: SparkSession, dir: String): DataFrame = {
    val cat = mergeStaged.computeIfAbsent(dir + "#worder", { _ =>
      val w = java.nio.file.Files.createTempDirectory("graft-woq").toString
      val cat = "gw" + (dir.hashCode.toLong & 0xffffffL).toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", w)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.wh")
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy").as("o_year"))
        .createOrReplaceTempView(s"orders_wosrc_$cat")
      s.sql(s"CREATE TABLE $cat.wh.worders " +
        "(o_orderkey BIGINT, o_totalprice DOUBLE, o_year STRING) " +
        "PARTITIONED BY (o_year) TBLPROPERTIES ('retain'='5', " +
        "'write_order'='o_orderkey', 'stats_columns'='o_orderkey')")
      s.sql(s"INSERT INTO $cat.wh.worders SELECT * FROM orders_wosrc_$cat")
      cat
    })
    s.sql(s"""SELECT o_year, count(*) AS n_rows,
      CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM $cat.wh.worders
      WHERE o_orderkey BETWEEN
        (SELECT max(o_orderkey) DIV 4 FROM $cat.wh.worders) AND
        (SELECT max(o_orderkey) DIV 2 FROM $cat.wh.worders)
      GROUP BY o_year ORDER BY o_year""")
  }

  private[queries] val graftWriteOrderSql =
    """SELECT strftime(o_orderdate, '%Y') AS o_year, count(*) AS n_rows,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderkey BETWEEN
      |  (SELECT max(o_orderkey) // 4 FROM orders) AND
      |  (SELECT max(o_orderkey) // 2 FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private[queries] val graftLimitPushSql =
    """SELECT probe, o_year, n FROM (
      |  SELECT 'topn' AS probe, o_year, count(*) AS n
      |  FROM (SELECT strftime(o_orderdate, '%Y') AS o_year FROM orders
      |        ORDER BY o_year DESC LIMIT 50)
      |  GROUP BY o_year
      |  UNION ALL
      |  SELECT 'limit' AS probe, CAST(NULL AS VARCHAR) AS o_year, count(*) AS n
      |  FROM (SELECT o_orderkey FROM orders LIMIT 500))
      |ORDER BY probe""".stripMargin

  private[queries] val graftAggPushSql =
    """SELECT strftime(o_orderdate, '%Y') AS o_year,
      |  count(*) AS n_rows,
      |  CAST(min(o_orderkey) AS BIGINT) AS min_okey,
      |  CAST(max(o_orderkey) AS BIGINT) AS max_okey,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  private[queries] val graftFileSkipSql =
    """SELECT strftime(o_orderdate, '%Y') AS o_year, count(*) AS n_rows,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
      |FROM orders
      |WHERE o_orderkey > (SELECT max(o_orderkey) // 3 FROM orders)
      |  AND o_orderkey <= (SELECT 2 * (max(o_orderkey) // 3) FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private[queries] val graftCdfMergeSql =
    s"""WITH base AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         strftime(o_orderdate, '%Y-%m') AS o_ym
       |  FROM orders),
       |upd AS (
       |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
       |         o_totalprice + 1000.0 AS o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 97 = 0),
       |ins AS (
       |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
       |         'N' AS o_orderstatus, o_totalprice, o_ym
       |  FROM base WHERE o_orderkey % 101 = 0),
       |merged AS (
       |  SELECT * FROM base
       |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
       |  UNION ALL SELECT * FROM upd
       |  UNION ALL SELECT * FROM ins),
       |chg AS (
       |  SELECT 'update_preimage' AS change_type, 2 AS commit_version,
       |         o_orderkey, o_totalprice
       |  FROM base WHERE o_orderkey % 97 = 0
       |  UNION ALL
       |  SELECT 'update_postimage', 2, o_orderkey, o_totalprice FROM upd
       |  UNION ALL
       |  SELECT 'insert', 2, o_orderkey, o_totalprice FROM ins
       |  UNION ALL
       |  SELECT 'delete', 3, o_orderkey, o_totalprice
       |  FROM merged WHERE o_custkey % 991 = 0)
       |SELECT change_type, CAST(commit_version AS BIGINT) AS commit_version,
       |  count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
       |  ${sqlDsum("o_totalprice", 2)} AS price_sum
       |FROM chg GROUP BY change_type, commit_version
       |ORDER BY change_type, commit_version""".stripMargin
}
