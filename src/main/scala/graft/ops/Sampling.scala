package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and sharding for training-data assembly.
  *
  * Both operators are DETERMINISTIC functions of the data (no RNG state):
  * re-running the pipeline — or running it on a different cluster layout —
  * selects the same rows. Sampling uses a Knuth multiplicative hash of the
  * id into percentile buckets (pure 64-bit arithmetic, so an external
  * system can reproduce the exact sample); sharding uses a hash-ordered
  * row_number so shard sizes are balanced to ±1 regardless of how skewed
  * the id space is.
  */
object Sampling {

  /** Deterministic percentile bucket in [0, 100) from an id column.
    * doc_id * 2654435761 stays far below 2^63 for any realistic id, so
    * the arithmetic is exact in both Spark and any oracle engine. */
  def pctBucket(id: Column): Column = pmod(id * lit(2654435761L), lit(100L))

  /** Stratified sampling: per-stratum retention rates (e.g. downsample
    * dominant languages, keep the tail). Rows whose stratum is absent
    * from `rates` are kept. The plan is a narrow filter — no shuffle, no
    * sort; at 100 TB this is a map-only pass. */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      rates: Map[String, Int], idCol: String = "doc_id"): DataFrame = {
    val rateExpr = rates.foldLeft(lit(100)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(pctBucket(col(idCol)) < rateExpr)
  }

  /** Balanced shard assignment: order by a deterministic id hash (so the
    * order has nothing to do with ingest order or partition layout) and
    * deal rows round-robin into `n` shards. Shard sizes differ by at most
    * one row. The global row_number is a single total-order sort — the
    * one-time cost of a training-data export; per-partition dealing would
    * avoid the sort at the price of ragged shard sizes. */
  def assignShards(docs: DataFrame, n: Int, idCol: String = "doc_id"): DataFrame = {
    val w = Window.orderBy(pctBucket(col(idCol)), col(idCol))
    docs.withColumn("shard", ((row_number().over(w) - 1) % n).cast("bigint"))
  }

  /** Shard-plan summary: per-shard row count and payload size — the
    * balance check an export job runs before writing. */
  def shardPlan(docs: DataFrame, n: Int): DataFrame =
    assignShards(docs, n)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("shard")
}
