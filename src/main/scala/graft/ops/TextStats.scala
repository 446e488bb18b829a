package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * tokenization, quality scoring, language-ID heuristic, and document
  * fingerprinting. All are per-row narrow transformations (no shuffle), so
  * they scale linearly and stay inside whole-stage codegen; every helper is
  * built from `org.apache.spark.sql.functions` — no UDFs.
  */
object TextStats {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Deterministic per-language stopword sets for the lang-ID heuristic.
    * Order matters: ties resolve to the first language in this list. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "las", "y", "un", "una"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Count of tokens that appear in `words` (duplicates counted — this is
    * a per-token membership filter, not a set intersection). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t)))

  /** BPE-style pre-tokenization pattern (GPT-2-shaped, simplified to the
    * character classes present in the corpus): contractions, space-glued
    * word pieces, number runs, punctuation runs. Subword merges happen
    * downstream in a real BPE; this is the deterministic pre-tokenizer
    * whose match count approximates token counts for budgeting. */
  val bpeIshPattern = "'[a-z]+| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  /** Token counting both ways: whitespace tokens and BPE-ish regex
    * pieces. */
  def bpeTokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("bigint").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit(bpeIshPattern), lit(0)))
        .cast("bigint").as("bpe_tokens"))

  /** doc_id + token/char counts. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("n_chars"),
      length(col("text")).as("len_chars"),
      size(tokens(col("text"))).cast("bigint").as("n_tokens"))

  /** Quality scoring: ratios a filtering pipeline would threshold on.
    * Everything is per-row double math — deterministic and identical in
    * any engine evaluating the same IEEE expressions. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTokens = size(toks).cast("double")
    val nChars = length(col("text")).cast("double")
    val nonSpace = length(regexp_replace(col("text"), "\\s", "")).cast("double")
    val alnum = length(regexp_replace(col("text"), "[^a-zA-Z0-9\\s]", "")).cast("double")
    val stopHits = stopwordHits(toks, langStopwords.flatMap(_._2)).cast("double")
    docs.select(
      col("doc_id"),
      nTokens.cast("bigint").as("n_tokens"),
      round(nonSpace / nTokens, 6).as("avg_token_len"),
      round((nChars - alnum) / nChars, 6).as("punct_ratio"),
      round(stopHits / nTokens, 6).as("stopword_ratio"))
  }

  /** Language-ID heuristic: per-language stopword hit counts, argmax with
    * ties resolved by registry order, no hits at all → "und". */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val scored = langStopwords.foldLeft(docs.withColumn("_toks", toks)) {
      case (df, (lang, words)) =>
        df.withColumn(s"_hits_$lang", stopwordHits(col("_toks"), words))
    }
    val hitCols = langStopwords.map { case (lang, _) => col(s"_hits_$lang") }
    val best = greatest(hitCols: _*)
    // foldRight keeps registry priority: when(en)...otherwise(when(de)...)
    val pred = langStopwords.foldRight(lit("und")) { case ((lang, _), elseExpr) =>
      when(col(s"_hits_$lang") === best && best > 0, lit(lang)).otherwise(elseExpr)
    }
    scored.select(
      col("doc_id"), col("lang").as("declared_lang"),
      pred.as("predicted_lang"))
  }

  /** Document fingerprint: polynomial rolling hash over per-token codes,
    * mod 2^31-1. Token code and fold are expressible identically in any
    * SQL engine with list folds (cross-engine verifiable, unlike
    * murmur/xxhash which are engine-specific). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val codes = transform(toks, t =>
      (ascii(t).cast("bigint") * 31 + length(t).cast("bigint")))
    val fp = aggregate(codes, lit(0L),
      (acc, c) => pmod(acc * 1000003L + c, lit(2147483647L)))
    docs.select(col("doc_id"), fp.as("fingerprint"))
  }
}
