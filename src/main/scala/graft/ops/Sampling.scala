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

  /** Deterministic percentile bucket in [0, 100) from an id column. The
    * id is reduced mod a prime BEFORE the Knuth multiply: the residue is
    * < 2^20 and the product < 2^52, so the arithmetic is exact (never
    * wraps) for ANY 64-bit id in Spark (non-ANSI and ANSI) and in any
    * oracle engine — a raw `id * 2654435761` overflows at id ≈ 3.4e9,
    * where Spark wraps silently but DuckDB raises. */
  def pctBucket(id: Column): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(100L))

  /** Deterministic micro-bucket in [0, 1e6): the fine-grained sibling of
    * [[pctBucket]] for sub-percent acceptance rates, with the same
    * exact-arithmetic guarantee. */
  def microBucket(id: Column): Column =
    pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(1000000L))

  /** Target-MIXTURE resampler: given desired output proportions per
    * stratum (the "40% en / 15% each tail" data-mixture spec of a
    * training run), derive the per-stratum acceptance rates that hit the
    * largest feasible output with those proportions, then keep rows by
    * deterministic micro-bucket — no randomness, reproducible on any
    * engine.
    *
    * T = min over strata of n_s / w_s is the largest output size for
    * which no stratum is over-drawn; stratum s then keeps
    * floor(w_s · T / n_s · 1e6) micro-units of its rows (the arg-min
    * stratum keeps ~all). Strata absent from `weights` are dropped —
    * a mixture spec is a whitelist. The per-stratum counts are a tiny
    * aggregate collected to the driver (#strata rows — sketch-class,
    * like a broadcast build side); the acceptance pass is map-only.
    * Double arithmetic is written in the exact same operation order as
    * the SQL oracle so IEEE results are bit-identical. */
  def targetMixture(docs: DataFrame, stratumCol: String,
      weights: Map[String, Double], idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    if (present.isEmpty) return docs.filter(lit(false))
    val t = present.map { case (s, w) => counts(s) / w }.min
    val rateMicro: Map[String, Long] = present.map { case (s, w) =>
      s -> math.min(math.floor(w * t / counts(s) * 1000000).toLong, 1000000L)
    }
    val rateExpr = rateMicro.foldLeft(lit(-1L)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    docs.filter(microBucket(col(idCol)) < rateExpr)
  }

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
    * one row.
    *
    * The global rank is a distributed two-phase prefix sum (the same
    * shape as [[packSequences]]), NOT a partition-less `Window.orderBy`
    * — that plan moves every row through ONE task ("WindowExec: No
    * Partition Defined" — round-2's scale-killer finding). Here the hash
    * bucket is the leading sort key itself, so per-bucket `row_number`s
    * (parallel, one per bucket) plus broadcast per-bucket count offsets
    * compose the identical global rank; the only single-partition step is
    * the 100-row running sum over bucket counts.
    *
    * Scale alternative: when ±1-row balance isn't required, pure
    * hash-range sharding — `shard = pctBucket(id) * n / 100` (or a wider
    * hash modulus for n > 100) — needs NO rank at all: a map-only pass
    * with shard sizes balanced only as well as the hash (±O(√(rows/n))).
    * This rank-based form is for exports that contractually need ±1. */
  def assignShards(docs: DataFrame, n: Int, idCol: String = "doc_id"): DataFrame = {
    val bucketed = docs.withColumn("_pct", pctBucket(col(idCol)))
    val wB = Window.orderBy("_pct").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("_pct").agg(count(lit(1)).as("_n"))
      .select(col("_pct"), coalesce(sum("_n").over(wB), lit(0L)).as("_off"))
    val wIn = Window.partitionBy("_pct").orderBy(col(idCol))
    bucketed.join(broadcast(offsets), Seq("_pct"))
      .withColumn("shard",
        ((col("_off") + row_number().over(wIn) - 1) % n).cast("bigint"))
      .drop("_pct", "_off")
  }

  /** Shard-plan summary: per-shard row count and payload size — the
    * balance check an export job runs before writing. */
  def shardPlan(docs: DataFrame, n: Int): DataFrame =
    assignShards(docs, n)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("shard")

  /** Weighted sampling without replacement via sequential Poisson sampling
    * (Ohlsson 1998): rank every row by `u / w` where `u` is a deterministic
    * pseudo-uniform of the id and `w` the weight, keep the k smallest —
    * inclusion probability ≈ proportional to weight. Cross-engine exact:
    * `u` is pure 64-bit integer arithmetic and the priority is a SINGLE
    * double division (correctly rounded IEEE in any engine), so even the
    * tie-ordering matches an oracle. Scale shape: the rank-and-keep is
    * `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject (per-
    * partition top-k then a k-row driver merge), never a global sort. */
  def weightedSample(docs: DataFrame, k: Int, weightCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    // id reduced mod the prime before the multiply: product < 2^52, so no
    // 64-bit wrap for any id (see pctBucket)
    val u = pmod(pmod(col(idCol), lit(1000003L)) * lit(2654435761L), lit(1000003L)) + lit(1L)
    docs
      .withColumn("priority", u.cast("double") / col(weightCol).cast("double"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Sequence packing for pretraining: concatenate the corpus in doc_id
    * order and cut it into fixed `budget`-token sequences; each document
    * is assigned the sequence where its first token lands (documents may
    * straddle boundaries — the GPT-style document-stream model). Output:
    * per-doc token count, global token offset, and sequence id.
    *
    * The global offset is a distributed two-phase prefix sum — NOT a
    * single-partition global window (which would serialize the corpus
    * through one task at scale): contiguous id-range buckets keep within-
    * bucket windows parallel, per-bucket totals are a `buckets`-row
    * aggregate whose running sum is the only single-partition step, and
    * those offsets broadcast back. All arithmetic is 64-bit integer, so
    * the result is engine-exact. */
  def packSequences(docs: DataFrame, budget: Long, buckets: Int = 32): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(TextStats.tokens(col("text"))).cast("bigint").as("n_tokens"))
    val maxId = docs.agg(max("doc_id").as("max_id"))
    val bucketed = toks.crossJoin(broadcast(maxId))
      .withColumn("bucket", expr(s"(doc_id * $buckets) div (max_id + 1)"))
    val bucketTotals = bucketed.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketTotals.select(col("bucket"),
      coalesce(sum("bucket_tokens").over(wB), lit(0L)).as("bucket_offset"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(bucketOffsets), "bucket")
      .withColumn("offset",
        col("bucket_offset") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("offset"),
        expr(s"offset div ${budget}L").as("seq_id"))
  }

  /** Token-budget corpus selection (the FineWeb/Dolma assembly step:
    * "fill an N-token training budget with the best-scoring documents"):
    * rank documents by quality score descending, accumulate token counts
    * in rank order, and keep every document whose run STARTS inside the
    * budget — so the selection crosses the budget by at most one
    * document, never stops short of it. The quality score is
    * [[TextStats.classifierScore]]'s integer activation, and the budget
    * is `total_tokens / denom` — all 64-bit integer arithmetic, so the
    * keep set is engine-exact.
    *
    * The running total over the (score desc, doc_id) order is the
    * distributed two-phase prefix sum of [[packSequences]], generalized
    * to a non-contiguous sort key: coarse score-range buckets
    * (`score div width`, truncating division — monotone in the score, so
    * bucket order refines to the global order) keep the within-bucket
    * windows parallel; the only single-partition step is the running sum
    * over the ≤ `targetBuckets`-ish bucket totals, which broadcast back
    * as offsets. A bare `Window.orderBy(score)` would serialize the
    * corpus through one task — round-2's scale-killer.
    *
    * The bucket width ADAPTS to the observed score range
    * (`(max-min+1) / targetBuckets`, from the same one-row stats pass
    * that reads the budget total off the persisted scored projection): a
    * fixed width would silently degenerate to the single-partition global
    * window whenever the corpus's score distribution is narrower than
    * one bucket. When the range is narrower than `targetBuckets` the
    * width clamps to 1 (one bucket per exact score) and a SECONDARY
    * doc_id-range bucket restores parallelism — order-safe only at
    * width 1, because within one exact score the global order IS doc_id
    * ascending, which the id sub-buckets refine. */
  /** Mixture UPSAMPLING — the epochs-per-source half of data mixing
    * (the Pile/Dolma recipe: a small high-quality source reaches its
    * target share of the token budget by being repeated, not just
    * selected): for each source with target share `share_micro`/1e6 of
    * `budgetTokens`, every document repeats `floor(N_s / T_s)` times
    * (N_s = the source's token allocation, T_s = its one-epoch token
    * count) and the remainder fills with ONE extra repeat for a
    * deterministic hash-ordered prefix of the source — the same
    * crossing rule as [[tokenBudget]], so each source overshoots its
    * allocation by less than one document.
    *
    * Scale shape: the per-source totals are a #sources-row aggregate
    * (broadcast back); the remainder prefix is the two-phase prefix sum
    * keyed on ([[microBucket]] ranges — the hash range is KNOWN, so
    * fixed-width buckets cannot degenerate the way score buckets could);
    * everything else is map-only. Integer-exact end to end: shares in
    * micro-units, token counts, floor division — the oracle replays it
    * with per-source windows. */
  def upsampleToMixture(docs: DataFrame, shareMicro: Map[String, Long],
      budgetTokens: Long, hashBuckets: Int = 256): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(TextStats.tokens(col("text"))).cast("bigint").as("n_tokens"),
      microBucket(col("doc_id")).as("_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shares = typedlit(shareMicro)
    // exact floor(budget·share/1e6) without the 64-bit overflow a direct
    // product hits at ~1e13 budget tokens: with budget = q·1e6 + r,
    // floor = q·share + floor(r·share/1e6) (q·share is integral)
    val (bq, br) = (budgetTokens / 1000000L, budgetTokens % 1000000L)
    val totals = toks.groupBy("source")
      .agg(sum("n_tokens").as("_t"))
      .withColumn("_share", coalesce(element_at(shares, col("source")), lit(0L)))
      .withColumn("_alloc",
        lit(bq) * col("_share") + expr(s"${br}L * _share div 1000000"))
      .select(col("source"),
        expr("_alloc div _t").as("_full"),
        expr("_alloc % _t").as("_rem"))
    val wid = (1000000L + hashBuckets - 1) / hashBuckets
    val bucketed = toks.withColumn("_b", expr(s"_h div ${wid}L"))
    val wB = Window.partitionBy("source").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("source", "_b")
      .agg(sum("n_tokens").as("_bt"))
      .select(col("source"), col("_b"),
        coalesce(sum("_bt").over(wB), lit(0L)).as("_off"))
    val wIn = Window.partitionBy("source", "_b")
      .orderBy(col("_h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("source", "_b"))
      .join(broadcast(totals), "source")
      .withColumn("_cum",
        col("_off") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        (col("_full") + when(col("_cum") < col("_rem"), 1L).otherwise(0L))
          .as("repeats"))
  }

  /** Bucket widths for [[tokenBudget]]: (score width, doc_id width). A
    * doc_id width of Long.MaxValue means "no sub-bucketing" (the score
    * range alone yields ~targetBuckets buckets). */
  private[ops] def budgetWidths(sRange: Long, dRange: Long,
      tb: Long): (Long, Long) =
    if (sRange >= tb) ((sRange + tb - 1L) / tb, Long.MaxValue)
    else (1L, ((dRange + tb - 1L) / tb).max(1L))

  def tokenBudget(docs: DataFrame, denom: Int = 5,
      targetBuckets: Int = 256): DataFrame = {
    // three consumers (budget+range stats, bucket totals, the ranked
    // pass) — persist the 24-byte/row scored projection so the corpus
    // TEXT is scanned and scored once, not three times (MEMORY_AND_DISK:
    // a 100 TB run spills rather than recomputes; released by the
    // caller's clearCache, as with the text-family persists)
    val scored = TextStats.classifierScore(docs)
      .select(col("doc_id"), col("n_tokens"), col("act_milli"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row of longs to the driver — the sketch-class aggregate that
    // sizes the buckets and fixes the budget as a literal (replacing the
    // broadcast-total cross join)
    val stats = scored.agg(sum("n_tokens"), min("act_milli"),
      max("act_milli"), min("doc_id"), max("doc_id")).first()
    val empty = stats.isNullAt(1)
    val total = if (empty) 0L else stats.getLong(0)
    val sRange = if (empty) 1L else stats.getLong(2) - stats.getLong(1) + 1L
    val dRange = if (empty) 1L else stats.getLong(4) - stats.getLong(3) + 1L
    val (wS, wD) = budgetWidths(sRange, dRange, targetBuckets.toLong)
    val bucketed = scored
      .withColumn("_b", expr(s"act_milli div ${wS}L"))
      .withColumn("_b2",
        if (wD == Long.MaxValue) lit(0L) else expr(s"doc_id div ${wD}L"))
    val wB = Window.orderBy(col("_b").desc, col("_b2").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("_b", "_b2").agg(sum("n_tokens").as("_bt"))
      .select(col("_b"), col("_b2"),
        coalesce(sum("_bt").over(wB), lit(0L)).as("_off"))
    val wIn = Window.partitionBy("_b", "_b2")
      .orderBy(col("act_milli").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("_b", "_b2"))
      .withColumn("cum_before",
        col("_off") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .select(col("doc_id"), col("act_milli"), col("n_tokens"),
        col("cum_before"),
        (col("cum_before") < lit(total / denom)).as("selected"))
  }
}
