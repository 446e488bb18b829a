package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-loader handoff: sharded JSONL export of a curated corpus.
  *
  * The standard last mile of a data pipeline — balanced shards
  * ([[Sampling.assignShards]], ±1 row whatever the id distribution), one
  * JSON object per line, one directory per shard (`shard=<k>/part-*`), so
  * a data-parallel trainer maps shard k to rank k and streams lines. The
  * JSON is rendered with explicitly ordered fields (`to_json` of a
  * struct), making lines byte-deterministic for a given row.
  *
  * At 100 TB: the shard assignment is the two-phase prefix-sum rank (no
  * global single-partition window), the write is one narrow pass after
  * the shard exchange, and shard count = writer parallelism. Lossless
  * roundtrip is part of the contract — `readBack` restores the exact
  * rows (verified end-to-end by the export_jsonl_roundtrip query: every
  * field of every row survives write+read against a DuckDB oracle). */
object Export {

  /** Write `docs` as `n` JSONL shard directories under `dir`. */
  def jsonlShards(docs: DataFrame, dir: String, n: Int): Unit = {
    val cols = docs.columns
    Sampling.assignShards(docs, n)
      .select(col("shard"),
        to_json(struct(cols.map(col): _*)).as("value"))
      .write.partitionBy("shard").mode("overwrite").text(dir)
  }

  /** Read a JSONL shard export back into rows + their shard. */
  def readBack(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema.add("shard", "long")).json(dir)
}
