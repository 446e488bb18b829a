package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Stable._

/** Event-time windowed aggregation over the `events` table — the batch
  * forms of the streaming operators in graft.streaming (same semantics;
  * Structured Streaming adds watermarking on top).
  *
  * Window starts are emitted as formatted strings: engines disagree on
  * parquet timestamp precision (µs vs ns), strings do not.
  */
object EventWindows {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** Tumbling 1-hour windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total"))
      .select(date_format(col("w.start"), fmt).as("window_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")

  /** Sliding 1-hour windows with a 30-minute hop: every event lands in
    * exactly two windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total"))
      .select(date_format(col("w.start"), fmt).as("window_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")

  /** Session windows per user with a 30-minute inactivity gap. Session end
    * is last-event + gap (Spark session_window semantics). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("total"))
      .select(col("user_id"),
        date_format(col("w.start"), fmt).as("session_start"),
        date_format(col("w.end"), fmt).as("session_end"),
        col("n"), col("total"))
      .orderBy("user_id", "session_start")

  /** JSON-payload KPI: extract props.k and aggregate per event type. */
  def jsonKpi(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("try_cast(get_json_object(props, '$.k') AS double)").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_k"), dsum(col("k"), 6).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Same KPI through the VARIANT type: parse once into Spark's binary
    * semi-structured encoding, then typed path extraction — at scale this
    * replaces per-query string re-parsing (get_json_object re-tokenizes
    * the JSON on every access; a variant column parses once at ingest and
    * every later path read is a binary traversal). Same result, same
    * oracle as [[jsonKpi]]. */
  def variantKpi(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("try_variant_get(parse_json(props), '$.k', 'double')").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_k"), dsum(col("k"), 6).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
}
