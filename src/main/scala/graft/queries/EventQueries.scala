package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats}
import graft.streaming.Streams

/** Skew-handling and event-time window query builders, batch and streaming twins (registry order lives in [[ExtQueries]]). */
object EventQueries {
  // ---------------------------------------------------------------- skew

  /** Salted join on a deliberately skewed key (~90% of lineitem lands on
    * nation 1): the salt spreads the hot key across reducers, and the
    * oracle is the PLAIN SQL join — salting must be invisible in the
    * result. SaltingSpec additionally proves the straggler spread with
    * per-task shuffle-read metrics. */
  private[queries] def skewJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).withColumn("skew_key",
      when(col("l_orderkey") % 10 < 9, lit(1L))
        .otherwise(pmod(col("l_orderkey"), lit(25)).cast("long")))
    val nat = Tables.nation(s, dir)
      .select(col("n_nationkey").cast("long").as("skew_key"), col("n_name"))
    Salting.saltedJoin(li, nat, Seq("skew_key"), salts = 16)
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy("n_name")
  }

  private[queries] val skewJoinSaltedSql =
    s"""SELECT n_name, count(*) AS n, ${sqlDsum("l_quantity", 2)} AS sum_qty
       |FROM lineitem JOIN nation
       |  ON n_nationkey = CASE WHEN l_orderkey % 10 < 9 THEN 1
       |                        ELSE l_orderkey % 25 END
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------- events

  private[queries] def evTumbling(s: SparkSession, dir: String): DataFrame =
    EventWindows.tumbling(Tables.events(s, dir))

  private[queries] val evTumblingSql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming twin of `ev_tumbling`, run end-to-end through Structured
    * Streaming (file source → watermarked stateful aggregation →
    * AvailableNow termination) and checked against the SAME batch oracle:
    * the driver row proves the streaming path computes the batch answer.
    * The nanos→µs staging copy exists because streaming file sources need
    * a schema-stable directory (raw testdata is TIMESTAMP(NANOS)). */
  private[queries] val stagedEvents = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // stage once per (JVM, sf dir): the nanos→µs copy is harness plumbing,
  // not part of the streaming operator under test/benchmark
  private[queries] def stagedEventsDir(s: SparkSession, dir: String): String =
    stagedEvents.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-ev-stream").toString
      Tables.events(s, d).write.mode("overwrite").parquet(tmp)
      tmp
    })

  private[queries] def evTumblingStream(s: SparkSession, dir: String): DataFrame =
    Streams.tumblingAvailableNow(s, stagedEventsDir(s, dir))

  private[queries] def evSliding(s: SparkSession, dir: String): DataFrame =
    EventWindows.sliding(Tables.events(s, dir))

  private[queries] val evSlidingSql =
    """WITH e2 AS (
      |  SELECT event_type, value,
      |    (CAST(floor(epoch(ts) / 1800) AS BIGINT) - off.i) * 1800 AS start_epoch
      |  FROM events CROSS JOIN (VALUES (0), (1)) AS off(i))
      |SELECT strftime(TIMESTAMP '1970-01-01 00:00:00'
      |                + start_epoch * INTERVAL 1 SECOND,
      |                '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM e2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming twin of `ev_session` (same pattern as ev_tumbling_stream):
    * session windows through the state store's session-merge path. */
  private[queries] def evSessionStream(s: SparkSession, dir: String): DataFrame =
    Streams.sessionsAvailableNow(s, stagedEventsDir(s, dir))

  /** Arbitrary-stateful streaming driver entry: per-user totals through
    * flatMapGroupsWithState (exact micros arithmetic), oracled by the
    * batch GROUP BY. */
  private[queries] def evRunningStream(s: SparkSession, dir: String): DataFrame =
    Streams.totalsAvailableNow(s, stagedEventsDir(s, dir))

  /** Streaming dedup driver entry: first-seen pairs through the state
    * store, oracled by batch DISTINCT. */
  private[queries] def evDedupStream(s: SparkSession, dir: String): DataFrame =
    Streams.dedupAvailableNow(s, stagedEventsDir(s, dir))

  private[queries] val evDedupStreamSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** Stream-stream join driver entry: purchases matched to same-user
    * clicks within the hour before, oracled by the equivalent batch
    * join. */
  private[queries] def evJoinStream(s: SparkSession, dir: String): DataFrame =
    Streams.clickToPurchaseAvailableNow(s, stagedEventsDir(s, dir))

  private[queries] val evJoinStreamSql =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_at,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY c.user_id, click_id, purchase_id""".stripMargin

  /** Streaming AS-OF join driver entry: each purchase with the same
    * user's most recent click at or before it (ties by event id), oracled
    * by the equivalent batch correlated top-1. */
  private[queries] def evAsofStream(s: SparkSession, dir: String): DataFrame =
    Streams.asofAvailableNow(s, stagedEventsDir(s, dir))

  private[queries] val evAsofStreamSql =
    """SELECT p.user_id, p.event_id AS purchase_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_at,
      |  (SELECT c.event_id FROM events c
      |    WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |      AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
      |    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  /** Watermark-buffered streaming as-of (the ALWAYS-ON-correct variant:
    * both sides buffered against the watermark, so micro-batch boundaries
    * and bounded event-time disorder cannot change the answer), run over
    * time-ordered multi-file staging with maxFilesPerTrigger=1 — a REAL
    * multi-batch execution — plus a terminal heartbeat click (punctuation)
    * so the final watermark matures every purchase. Same oracle as
    * ev_asof_stream: the heartbeat user emits nothing. */
  private[queries] val stagedWmEvents = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] def stagedWmEventsDir(s: SparkSession, dir: String): String =
    stagedWmEvents.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-ev-wm").toString
      Tables.events(s, d)
        .repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(tmp)
      val parts = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1000000L + i * 60000L)
      }
      val maxTs = Tables.events(s, d).agg(max(col("ts")))
        .collect().head.getTimestamp(0)
      val hb = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          999999999L, new java.sql.Timestamp(maxTs.getTime + 3600000L),
          999999999L, "click", 0.0, "{}")),
        Streams.eventsSchema)
      val sub = new java.io.File(tmp, "hb")
      hb.coalesce(1).write.mode("overwrite").parquet(sub.toString)
      val part = sub.listFiles().filter(_.getName.startsWith("part-")).head
      val target = new java.io.File(tmp, "zz-heartbeat.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(sub)
      target.setLastModified(1000000L + 100 * 60000L)
      tmp
    })

  private[queries] def evAsofStreamWm(s: SparkSession, dir: String): DataFrame =
    Streams.asofWatermarked(s, stagedWmEventsDir(s, dir),
        maxFilesPerTrigger = Some(1))
      .filter(col("user_id") =!= 999999999L)

  private[queries] val evRunningStreamSql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  private[queries] def evSession(s: SparkSession, dir: String): DataFrame =
    EventWindows.sessions(Tables.events(s, dir))

  private[queries] val evSessionSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  private[queries] def evJsonKpi(s: SparkSession, dir: String): DataFrame =
    EventWindows.jsonKpi(Tables.events(s, dir))

  private[queries] val evJsonKpiSql =
    """SELECT event_type, count(k) AS n_k,
      |  CAST(SUM(CAST(k AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
      |  max(k) AS max_k
      |FROM (SELECT event_type,
      |        TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Context-window chunking (ops.Chunking): overlapping 200-char windows
    * at stride 150 — a map-only generator pass, zero shuffle. */
  private[queries] def textChunks(s: SparkSession, dir: String): DataFrame =
    Chunking.charChunks(Tables.documents(s, dir), size = 200, stride = 150)
      .orderBy("doc_id", "chunk_id")

  private[queries] val textChunksSql =
    """WITH c AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, greatest((length(text) - 1) // 150, 0) + 1))
      |      AS chunk_id
      |  FROM documents)
      |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |  substring(text, CAST(chunk_id * 150 + 1 AS INT), 200) AS chunk,
      |  CAST(length(substring(text, CAST(chunk_id * 150 + 1 AS INT), 200))
      |    AS BIGINT) AS chunk_chars
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Weighted sampling without replacement (ops.Sampling.weightedSample):
    * sequential Poisson sampling by deterministic priority — inclusion
    * probability ∝ n_chars, top-k planned as TakeOrderedAndProject. */
  private[queries] def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(Tables.documents(s, dir), k = 100)
      .select(col("doc_id"), col("n_chars"), col("priority"))
      .orderBy("priority", "doc_id")

  private[queries] val sampleWeightedSql =
    """SELECT doc_id, n_chars,
      |  CAST(((doc_id % 1000003) * 2654435761) % 1000003 + 1 AS DOUBLE)
      |    / CAST(n_chars AS DOUBLE) AS priority
      |FROM documents ORDER BY priority, doc_id LIMIT 100""".stripMargin
}
