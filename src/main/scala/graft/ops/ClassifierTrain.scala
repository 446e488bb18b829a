package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed training of the fastText-shaped quality classifier
  * (Joulin et al. 2016, arXiv:1607.01759: bag of hashed token features →
  * linear model): full-batch logistic-regression gradient descent, the
  * complement of [[TextStats.classifierScore]]'s frozen inference.
  * Training pipelines learn such a classifier from a small
  * positive/negative slice and then score the whole corpus with it —
  * this implements the learning half with the same hashed-bucket feature
  * space as [[Curation.dsirSelect]] ([[Curation.tokenBucket]], SQL-
  * portable), so the learned weights drop straight into a map-only
  * scoring pass.
  *
  * Scale shape per iteration (the canonical distributed full-batch GD):
  *  1. per-doc activation: one partial-aggregated shuffle on doc_id over
  *     the persisted (doc, bucket, count) projection, the weight vector
  *     entering as a broadcast-class dense `array<bigint>` literal
  *     (≤ `buckets` longs — the [[Curation.dsirSelect]] lesson);
  *  2. per-bucket gradient: residuals join back to the feature table on
  *     doc_id and partial-aggregate on the ≤ `buckets` keys;
  *  3. the ≤ `buckets`-row gradient collects to the driver (sketch-class,
  *     like DSIR's count table) and updates the weights.
  * The corpus TEXT is tokenized exactly once ([[features]] is persisted
  * by [[train]]); iterations touch only the integer projection.
  *
  * Engine-exact arithmetic, same recipe as [[TextStats.bigramLmScore]]:
  * weights/activations/probabilities live in integer MICRO-units; the
  * only transcendental (the sigmoid) is computed per doc and rounded
  * HALF_UP to micro-units immediately, and at w=0 it is EXACTLY 500000 —
  * so the first gradient step is pure integer arithmetic end-to-end,
  * which is what the DuckDB oracle replays (the iterative remainder is
  * deterministic and pinned by spec, the [[Bpe]] pattern). */
object ClassifierTrain {

  /** Sparse hashed-bag features with the binary label: one row per
    * (doc, bucket) with the token count; y = 1 iff the document's source
    * is the positive slice. */
  def features(docs: DataFrame, targetSource: String,
      buckets: Int = 1024): DataFrame =
    docs.select(col("doc_id"),
        (col("source") === targetSource).cast("int").as("y"),
        explode(TextStats.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("y"),
        Curation.tokenBucket(col("tok"), buckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** One full-batch gradient as a per-bucket frame:
    * Σ_docs (p(w·x) − y)·x in micro-units. `feat` is the (persisted)
    * [[features]] output; `wMicro` the current weights. This is the plan
    * the text_train_grad0 oracle replays at w = 0 (where the sigmoid is
    * exactly 500000 micro and every value is integer end-to-end). */
  def gradientFrame(feat: DataFrame, wMicro: Array[Long]): DataFrame = {
    val wLit = typedlit(wMicro.toSeq)
    val acts = feat.groupBy("doc_id", "y")
      .agg(sum(col("cnt") * element_at(wLit, col("bucket").cast("int") + 1))
        .as("act_cnt_micro"))
    // sigmoid in doubles, rounded ONCE per doc to micro-units (HALF_UP —
    // Spark round(x, 0) matches SQL ROUND); at act 0 this is exactly 500000
    val pMicro = round(lit(1000000.0) / (lit(1.0) +
      exp(-col("act_cnt_micro").cast("double") / 1000000.0)), 0).cast("bigint")
    val resid = acts.select(col("doc_id"),
      (pMicro - col("y").cast("bigint") * 1000000L).as("resid_micro"))
    feat.join(resid, "doc_id")
      .groupBy("bucket")
      .agg(sum(col("resid_micro") * col("cnt")).as("grad_micro"))
  }

  /** [[gradientFrame]] collected into the dense per-bucket array the
    * driver-side update folds (≤ `buckets` rows — sketch-class). */
  def gradient(feat: DataFrame, wMicro: Array[Long]): Array[Long] = {
    val out = new Array[Long](wMicro.length)
    gradientFrame(feat, wMicro).collect()
      .foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** `steps` iterations of full-batch GD from w = 0 with learning rate
    * `lrMicro`/1e6. Weight update in integer arithmetic:
    * w −= lrMicro · (grad / nDocs) / 1e6 (per-doc-mean gradient first,
    * so the product stays far from Long range at any corpus size). */
  def train(docs: DataFrame, targetSource: String, steps: Int,
      lrMicro: Long = 500000L, buckets: Int = 1024): Array[Long] = {
    val feat = features(docs, targetSource, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = feat.select("doc_id").distinct().count()
      val w = new Array[Long](buckets)
      // an empty slice (every candidate filtered upstream) trains to the
      // zero model rather than dividing by zero in the update
      if (nDocs == 0L) return w
      for (_ <- 0 until steps) {
        val g = gradient(feat, w)
        var b = 0
        while (b < buckets) {
          w(b) -= lrMicro * (g(b) / nDocs) / 1000000L
          b += 1
        }
      }
      w
    } finally { feat.unpersist(); () }
  }

  /** Score documents with learned weights: map-only, the exact inference
    * shape of [[TextStats.classifierScore]] with learned instead of
    * stand-in weights. */
  def scoreWith(docs: DataFrame, wMicro: Array[Long]): DataFrame = {
    val buckets = wMicro.length
    val wLit = typedlit(wMicro.toSeq)
    val toks = TextStats.tokens(col("text"))
    docs.select(col("doc_id"),
      aggregate(toks, lit(0L), (acc, t) =>
        acc + element_at(wLit, Curation.tokenBucket(t, buckets).cast("int") + 1))
        .as("act_micro"))
      .withColumn("predicted_keep", col("act_micro") > 0)
  }
}
