package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a web-scale training-data pipeline runs
  * between quality filtering and export: per-domain document caps and
  * corpus-frequency boilerplate removal. Both are standard steps in
  * published web pipelines (per-domain caps appear in C4/RefinedWeb-style
  * curation to stop a handful of domains dominating the mix; line/segment
  * frequency dedup is CCNet's boilerplate pass). No reference analog —
  * the reference corpus is 14 economic series (`/root/reference/src/
  * config.py:28-52`); these extend the engine for the north-star corpus.
  */
object Curation {

  /** Per-domain document cap: keep at most `cap` documents per `source`,
    * ranked by token count (desc) then doc_id — an integer-only ranking,
    * so the keep set is identical on any engine.
    *
    * Scale shape: domain popularity is Zipfian, so the long tail of
    * domains is under the cap and needs NO ranking at all. One partial-agg
    * count per source finds the few over-cap domains; that set is
    * broadcast, the under-cap tail passes through map-only (anti join
    * against the broadcast), and only the over-cap head pays the
    * rank-window shuffle — on its own rows only. At 100 TB this turns a
    * full-corpus window sort into a window over the heavy domains'
    * slice. */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+")).cast("bigint")
    val base = docs.select(col("doc_id"), col("source"), nTok.as("n_tokens"))
    val overCap = broadcast(
      base.groupBy("source").agg(count(lit(1)).as("n"))
        .where(col("n") > cap).select("source"))
    val tail = base.join(overCap, Seq("source"), "left_anti")
      .select(col("doc_id"), col("source"), lit(true).as("kept"))
    val w = Window.partitionBy("source")
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    val head = base.join(overCap, "source")
      .select(col("doc_id"), col("source"),
        (row_number().over(w) <= cap).as("kept"))
    tail.unionByName(head)
  }

  /** Stamped boilerplate footer (10 whitespace tokens) — the same
    * deterministic plant-then-detect recipe as
    * [[TextStats.contamination]]: the synthetic corpus has no natural
    * boilerplate, so docs with `doc_id % plantMod == 0` get this footer
    * appended by BOTH engines, and the operator must then find and strip
    * exactly it (plus any natural repeats). */
  val boilerFooter =
    " this content is provided as is without any warranty whatsoever"

  /** Corpus-frequency boilerplate removal (the CCNet segment-dedup pass):
    * split each document into fixed `segLen`-token segments, count how
    * many DISTINCT documents each segment occurs in corpus-wide, and drop
    * segments present in at least `minDf` documents. Emits per document
    * the segment counts and a sha-256 of the retained text (segments
    * re-joined in position order), proving the reassembly byte-exact.
    *
    * Scale shape: one narrow pass builds (doc, position, segment); the
    * corpus-frequency count is a single shuffle keyed on the segment
    * string with partial aggregation (boilerplate segments are exactly the
    * high-fan-in keys partial agg absorbs); the verdict joins back on the
    * same segment key (exchange reuse) and the per-doc reassembly is one
    * shuffle on doc_id. At 100 TB the segment-frequency table would be
    * computed once and reused corpus-wide, exactly like the dedup index. */
  def boilerplate(docs: DataFrame, segLen: Int = 10, minDf: Int = 3,
      plantMod: Int = 7): DataFrame = {
    val stamped = docs.select(col("doc_id"),
      when(col("doc_id") % plantMod === 0, concat(col("text"), lit(boilerFooter)))
        .otherwise(col("text")).as("text"))
    val toks = stamped.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("toks"))
    val nSegs = ((size(col("toks")) + segLen - 1) / segLen).cast("int")
    // (doc, position, 'w1 w2 ... wN') — the final segment keeps the
    // remainder tokens (slice clamps), so no token is ever lost
    val segs = toks
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nSegs - 1), s =>
          array_join(slice(col("toks"), s * segLen + 1, lit(segLen)), " "))))
      .toDF("doc_id", "pos", "seg")
    val segDf = segs.groupBy("seg")
      .agg(countDistinct("doc_id").as("seg_docs"))
    segs.join(segDf, "seg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segments"),
        count(when(col("seg_docs") >= minDf, 1)).as("n_boiler"),
        sha2(array_join(transform(
          sort_array(collect_list(when(col("seg_docs") < minDf,
            struct(col("pos"), col("seg"))))),
          s => s.getField("seg")), " "), 256).as("clean_sha"))
  }
}
