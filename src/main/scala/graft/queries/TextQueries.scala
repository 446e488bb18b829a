package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats}
import graft.streaming.Streams

/** Text-analysis query builders (registry order lives in [[ExtQueries]]). */
object TextQueries {
  // ---------------------------------------------------------------- text

  private[queries] def textTokens(s: SparkSession, dir: String): DataFrame =
    TextStats.tokenCounts(Tables.documents(s, dir))
      .withColumn("len_chars", col("len_chars").cast("bigint"))
      .orderBy("doc_id")

  private[queries] val textTokensSql =
    """SELECT doc_id, n_chars, length(text) AS len_chars,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    TextStats.bpeTokenCounts(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textBpeTokensSql =
    s"""SELECT doc_id,
       |  len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       |  len(regexp_extract_all(text, '${TextStats.bpeIshPattern.replace("'", "''")}')) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] def textQuality(s: SparkSession, dir: String): DataFrame =
    TextStats.quality(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val allStopSql = TextStats.langStopwords.flatMap(_._2)
    .map(w => s"'$w'").mkString("[", ", ", "]")

  private[queries] val textQualitySql =
    s"""SELECT doc_id,
       |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')), 6) AS avg_token_len,
       |  round((CAST(length(text) AS DOUBLE)
       |         - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
       |        / length(text), 6) AS punct_ratio,
       |  round(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |                             x -> list_contains($allStopSql, x))) AS DOUBLE)
       |        / len(string_split_regex(trim(text), '\\s+')), 6) AS stopword_ratio
       |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] def textLangid(s: SparkSession, dir: String): DataFrame =
    TextStats.langId(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textLangidSql = {
    val hitExprs = TextStats.langStopwords.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val bestExpr = TextStats.langStopwords.map { case (l, _) => s"hits_$l" }
      .mkString("greatest(", ", ", ")")
    val caseArms = TextStats.langStopwords.map { case (l, _) =>
      s"WHEN hits_$l = best AND best > 0 THEN '$l'"
    }.mkString("\n      ")
    s"""WITH tok AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id, lang,
       |    $hitExprs
       |  FROM tok),
       |best AS (SELECT *, $bestExpr AS best FROM hits)
       |SELECT doc_id, lang AS declared_lang,
       |  CASE $caseArms
       |      ELSE 'und' END AS predicted_lang
       |FROM best ORDER BY doc_id""".stripMargin
  }

  private[queries] def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextStats.fingerprint(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textFingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split_regex(trim(text), '\s+'),
      |                     t -> CAST(ascii(t) AS BIGINT) * 31 + length(t))),
      |    (a, b) -> (a * 1000003 + b) % 2147483647) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  private[queries] def textGopher(s: SparkSession, dir: String): DataFrame =
    TextStats.gopherQuality(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textGopherSql = {
    val stops = TextStats.langStopwords.flatMap(_._2)
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |      / len(toks) AS mean_len,
       |    CAST(len(list_filter(toks,
       |           x -> regexp_matches(x, '[a-zA-Z一-鿿]'))) AS DOUBLE)
       |      / len(toks) AS alpha_frac,
       |    len(list_filter($stops, w -> list_contains(toks, w))) AS distinct_stops
       |  FROM t)
       |SELECT doc_id, n_tokens,
       |  round(mean_len, 6) AS mean_token_len,
       |  round(alpha_frac, 6) AS alpha_frac,
       |  distinct_stops AS distinct_stopwords,
       |  (n_tokens BETWEEN 10 AND 100000 AND mean_len BETWEEN 2.0 AND 12.0
       |   AND alpha_frac >= 0.8 AND distinct_stops >= 2) AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  private[queries] def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextStats.repetition(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textRepetitionSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |    len(list_distinct(toks)) AS n_distinct,
      |    len(toks) - 1 AS n_2grams,
      |    len(list_distinct(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i+1]))) AS n_distinct_2grams
      |  FROM t),
      |top AS (
      |  SELECT doc_id, max(cnt) AS top_tok_cnt FROM (
      |    SELECT doc_id, tok, count(*) AS cnt
      |    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
      |    GROUP BY 1, 2)
      |  GROUP BY 1)
      |SELECT n.doc_id,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_ratio,
      |  round(CAST(top_tok_cnt AS DOUBLE) / n_tokens, 6) AS top_token_ratio,
      |  CASE WHEN n_2grams > 0
      |    THEN round(1.0 - CAST(n_distinct_2grams AS DOUBLE) / n_2grams, 6)
      |    ELSE 0.0 END AS dup_2gram_ratio
      |FROM n JOIN top ON n.doc_id = top.doc_id
      |ORDER BY n.doc_id""".stripMargin

  private[queries] def textPiiScrub(s: SparkSession, dir: String): DataFrame =
    TextStats.piiScrub(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textPiiScrubSql = {
    val email = TextStats.emailPattern.replace("'", "''")
    val ip = TextStats.ipv4Pattern.replace("'", "''")
    s"""WITH s AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |      || ' or admin' || CAST(doc_id AS VARCHAR) || '@mail.test.org'
       |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17' AS stamped
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(stamped, '$email')) AS n_emails,
       |  len(regexp_extract_all(stamped, '$ip')) AS n_ips,
       |  sha256(regexp_replace(regexp_replace(stamped, '$email', '<EMAIL>', 'g'),
       |         '$ip', '<IP>', 'g')) AS scrubbed_sha
       |FROM s ORDER BY doc_id""".stripMargin
  }

  private[queries] def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTop(Tables.documents(s, dir), k = 3)
      .orderBy("doc_id", "rank")

  private[queries] val textTfidfSql =
    """WITH words AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                       x -> regexp_matches(x, '^[a-z]+$'))) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS cnt FROM words GROUP BY 1, 2),
      |dt AS (SELECT doc_id, sum(cnt) AS doc_tokens FROM tf GROUP BY 1),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
      |       FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round((CAST(tf.cnt AS DOUBLE) / dt.doc_tokens)
      |          * ln((nd.n_docs + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)), 6) AS tfidf,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.cnt DESC, df.df ASC, tf.term ASC) AS rank
      |  FROM tf JOIN df USING (term) JOIN dt USING (doc_id) CROSS JOIN nd)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tfidf
      |FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Hashed linear classifier inference: integer-only activation
    * (BIGINT milli-unit sum), so the oracle is exact with no float risk;
    * the LCG weight formula is spelled identically on both sides
    * (Spark shiftright == DuckDB // 65536 on non-negative operands). */
  private[queries] def textClassifierScore(s: SparkSession, dir: String): DataFrame =
    TextStats.classifierScore(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textClassifierScoreSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |    CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
      |      t -> ((1103515245 * ((CAST(ascii(t) AS BIGINT) * 31 + length(t)) % 1024)
      |             + 12345) // 65536) % 2001 - 1000)) AS BIGINT) AS act_milli
      |  FROM documents)
      |SELECT doc_id, n_tokens, act_milli, act_milli > 0 AS predicted_keep
      |FROM scored ORDER BY doc_id""".stripMargin

  /** BM25 top terms — same term-statistics substrate and integer-only
    * ranking as tfidf (TextStats.termStats / topTerms); the float score
    * rides along rounded, never ordering. */
  private[queries] def textBm25(s: SparkSession, dir: String): DataFrame =
    TextStats.bm25Top(Tables.documents(s, dir)).orderBy("doc_id", "rank")

  private[queries] val textBm25Sql =
    """WITH words AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                       x -> regexp_matches(x, '^[a-z]+$'))) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS cnt FROM words GROUP BY 1, 2),
      |dt AS (SELECT doc_id, sum(cnt) AS doc_tokens FROM tf GROUP BY 1),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs
      |       FROM documents),
      |ad AS (SELECT CAST(sum(doc_tokens) AS DOUBLE) / count(*) AS avgdl FROM dt),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    round(ln(1.0 + (nd.n_docs - df.df + 0.5) / (df.df + 0.5))
      |          * (tf.cnt * 2.2)
      |          / (tf.cnt + 1.2 * (0.25 + 0.75 * CAST(dt.doc_tokens AS DOUBLE)
      |                                    / ad.avgdl)), 6) AS bm25,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.cnt DESC, df.df ASC, tf.term ASC) AS rank
      |  FROM tf JOIN df USING (term) JOIN dt USING (doc_id)
      |  CROSS JOIN nd CROSS JOIN ad)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, bm25
      |FROM scored WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Per-domain cap: the oracle ranks EVERY source while the Spark plan
    * windows only the over-cap head (under-cap sources pass map-only) —
    * identical keep sets, since an under-cap source's every rank is <=
    * cap by definition. */
  private[queries] def textDomainCap(s: SparkSession, dir: String): DataFrame =
    Curation.domainCap(Tables.documents(s, dir), cap = 15).orderBy("doc_id")

  private[queries] val textDomainCapSql =
    """SELECT doc_id, source,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY len(string_split_regex(trim(text), '\s+')) DESC, doc_id)
      |    <= 15 AS kept
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Boilerplate removal: both engines stamp the same footer into
    * doc_id % 7 == 0 (Curation.boilerFooter), segment on 10-token
    * windows, count corpus-wide document frequency per segment, and
    * sha-256 the retained text reassembled in position order. */
  private[queries] def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    Curation.boilerplate(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textBoilerplateSql = {
    val footer = Curation.boilerFooter
    s"""WITH stamped AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || '$footer' ELSE text END AS text
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM stamped),
       |segs AS (
       |  SELECT doc_id, s['pos'] AS pos, s['seg'] AS seg FROM (
       |    SELECT doc_id, unnest(list_transform(range((len(toks) + 9) // 10),
       |      i -> {'pos': i, 'seg': array_to_string(toks[i*10+1:i*10+10], ' ')}))
       |      AS s
       |    FROM toks)),
       |segdf AS (
       |  SELECT seg, count(DISTINCT doc_id) AS seg_docs FROM segs GROUP BY 1)
       |SELECT s.doc_id, count(*) AS n_segments,
       |  count(*) FILTER (WHERE d.seg_docs >= 3) AS n_boiler,
       |  sha256(coalesce(string_agg(CASE WHEN d.seg_docs < 3 THEN s.seg END,
       |    ' ' ORDER BY s.pos), '')) AS clean_sha
       |FROM segs s JOIN segdf d USING (seg)
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** Distributed BPE training, full K=5 merge table — fully oracled:
    * aggregates are barred from recursive CTE terms, but the iteration
    * state fits ONE ROW (the word-frequency table as a list of
    * {symbols, count} structs — it is tokenizer-sized by construction),
    * so each round's pair counting, argmax, and greedy re-merge run as
    * scalar list functions inside the recursive term. The DuckDB replay
    * mirrors the engine exactly: overlapping pairs count per occurrence,
    * argmax ties break lexicographically on (lhs, rhs), and the merge
    * folds left-to-right over a unit-separator-delimited accumulator
    * (the [[textBpeEncode]] oracle's fold trick — symbols are [a-z]+ so
    * the separator can never collide). BpeSpec additionally pins the
    * greedy semantics on a hand-computed corpus. */
  private[queries] def textBpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.train(Tables.documents(s, dir), merges = 5)
      .orderBy("merge_ix")

  private[queries] val textBpeMergesSql =
    """WITH RECURSIVE
      |wf AS (
      |  SELECT list({'s': str_split(w, ''), 'c': cnt}) AS words FROM (
      |    SELECT w, count(*) AS cnt FROM (
      |      SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                    x -> regexp_matches(x, '^[a-z]+$'))) AS w
      |      FROM documents) GROUP BY 1)
      |),
      |steps AS (
      |  SELECT 0 AS merge_ix, CAST(NULL AS VARCHAR) AS lhs, CAST(NULL AS VARCHAR) AS rhs,
      |         CAST(NULL AS BIGINT) AS pair_count, words
      |  FROM wf
      |  UNION ALL
      |  SELECT t.merge_ix + 1,
      |         t.best['l'], t.best['r'],
      |         CAST(99999999999999 - t.best['negc'] AS BIGINT),
      |         list_transform(t.words, w -> {
      |           's': CASE WHEN len(w['s']) < 2 THEN w['s']
      |                ELSE str_split(list_reduce(w['s'], (acc, x) ->
      |                  CASE WHEN (acc = t.best['l'] OR ends_with(acc, chr(31) || t.best['l']))
      |                            AND x = t.best['r']
      |                       THEN substr(acc, 1, length(acc) - length(t.best['l']))
      |                            || t.best['l'] || t.best['r']
      |                       ELSE acc || chr(31) || x END), chr(31)) END,
      |           'c': w['c']})
      |  FROM (
      |    SELECT merge_ix, words,
      |      list_sort(list_transform(
      |        list_distinct(flatten(list_transform(words, w ->
      |          list_transform(range(len(w['s']) - 1),
      |            i -> w['s'][i+1] || chr(31) || w['s'][i+2])))),
      |        k -> {'negc': 99999999999999 - list_sum(list_transform(
      |                flatten(list_transform(words, w ->
      |                  list_transform(range(len(w['s']) - 1),
      |                    i -> {'p': w['s'][i+1] || chr(31) || w['s'][i+2], 'c': w['c']}))),
      |                p -> CASE WHEN p['p'] = k THEN p['c'] ELSE 0 END)),
      |              'l': str_split(k, chr(31))[1], 'r': str_split(k, chr(31))[2]}))[1] AS best
      |    FROM steps WHERE merge_ix < 5) t
      |  WHERE t.best IS NOT NULL
      |)
      |SELECT CAST(merge_ix AS BIGINT) AS merge_ix, lhs, rhs, pair_count
      |FROM steps WHERE merge_ix >= 1
      |ORDER BY merge_ix""".stripMargin

  /** First BPE merge: the weighted argmax adjacent character pair —
    * SQL-expressible exactly, and it pins the whole substrate the
    * iterated trainer runs on (tokenization, weighting, tie-break). */
  private[queries] def textBpeFirstMerge(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.train(Tables.documents(s, dir), merges = 1)

  private[queries] val textBpeFirstMergeSql =
    """WITH words AS (
      |  SELECT w, count(*) AS cnt FROM (
      |    SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                  x -> regexp_matches(x, '^[a-z]+$'))) AS w
      |    FROM documents) GROUP BY 1),
      |pairs AS (
      |  SELECT u['l'] AS lhs, u['r'] AS rhs, cnt FROM (
      |    SELECT cnt, unnest(list_transform(range(length(w) - 1),
      |      i -> {'l': w[i+1], 'r': w[i+2]})) AS u
      |    FROM words WHERE length(w) >= 2))
      |SELECT CAST(1 AS BIGINT) AS merge_ix, lhs, rhs,
      |  CAST(sum(cnt) AS BIGINT) AS pair_count
      |FROM pairs GROUP BY 2, 3
      |ORDER BY pair_count DESC, lhs, rhs LIMIT 1""".stripMargin

  /** Frozen tokenizer config for [[textBpeEncode]] — chosen to fire on
    * this corpus's vocabulary (table, data, scan, query, value, column)
    * including one chained merge (t+a then ta+b). */
  private[queries] val bpeFrozenMerges =
    Seq(("t", "a"), ("ta", "b"), ("s", "c"), ("q", "u"), ("l", "u"))

  /** BPE ENCODE with a frozen merge table — tokenizer inference. The
    * merges are constants (tokenizer-as-config, how production encodes a
    * corpus), so the oracle replays the exact greedy fold in SQL: DuckDB
    * list_reduce seeds the accumulator with the first element, which
    * matches the empty-seed Spark fold because a lone first symbol can
    * never merge backwards; the accumulator is a unit-separator-delimited
    * string, with ends_with(sep || lhs) as the token-boundary test. */
  private[queries] def textBpeEncode(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.encode(Tables.documents(s, dir), bpeFrozenMerges)
      .orderBy("doc_id")

  /** DuckDB rendition of the frozen-merge greedy fold over one word `w`
    * — shared by the encode oracle and the token-binary export oracle. */
  private[queries] val bpeMergedWordSql: String = {
    val sep = "chr(31)"
    def fold(inner: String, a: String, b: String): String =
      s"string_split(list_reduce($inner, (acc, x) -> " +
        s"CASE WHEN x = '$b' AND (acc = '$a' OR ends_with(acc, $sep || '$a')) " +
        s"THEN substr(acc, 1, length(acc) - ${a.length}) || '${a + b}' " +
        s"ELSE acc || $sep || x END), $sep)"
    val chars = "list_transform(range(length(w)), i -> w[i+1])"
    bpeFrozenMerges.foldLeft(chars) { case (s0, (a, b)) => fold(s0, a, b) }
  }

  private[queries] val textBpeEncodeSql = {
    val merged = bpeMergedWordSql
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                x -> regexp_matches(x, '^[a-z]+$$')) AS words
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, len(words) AS n_words,
       |    flatten(list_transform(words, w -> $merged)) AS subs
       |  FROM t)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(len(subs) AS BIGINT) AS n_subwords,
       |  sha256(coalesce(array_to_string(subs, ' '), '')) AS subword_sha
       |FROM enc ORDER BY doc_id""".stripMargin
  }

  /** Exact-substring dedup (anchor-gram approximation of Lee et al.
    * 2022): both engines stamp the shared passage into doc_id % 11 == 0,
    * mine 10-grams shared across >= 2 documents, and excise every covered
    * token span — reassembly proven byte-exact by sha-256. */
  private[queries] def textSubstringDedup(s: SparkSession, dir: String): DataFrame =
    Curation.substringDedup(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textSubstringDedupSql = {
    val passage = Curation.sharedPassage
    s"""WITH stamped AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 0 THEN text || '$passage' ELSE text END AS text
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM stamped),
       |grams AS (
       |  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(toks) - 9),
       |      i -> {'pos': i, 'gram': array_to_string(toks[i+1:i+10], ' ')})) AS u
       |    FROM toks WHERE len(toks) >= 10)),
       |shared AS (
       |  SELECT gram FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
       |starts AS (
       |  SELECT doc_id, list_sort(list(pos)) AS starts
       |  FROM grams JOIN shared USING (gram) GROUP BY 1),
       |joined AS (
       |  SELECT t.doc_id, t.toks, coalesce(s.starts, []) AS starts
       |  FROM toks t LEFT JOIN starts s USING (doc_id)),
       |cleaned AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    list_transform(list_filter(range(len(toks)),
       |      i -> len(list_filter(starts, s -> s <= i AND i < s + 10)) = 0),
       |      i -> toks[i+1]) AS clean
       |  FROM joined)
       |SELECT doc_id, n_tokens, n_tokens - len(clean) AS n_removed,
       |  -- array_to_string([]) is NULL in DuckDB, '' in Spark's array_join
       |  sha256(coalesce(array_to_string(clean, ' '), '')) AS clean_sha
       |FROM cleaned ORDER BY doc_id""".stripMargin
  }

  /** DSIR importance-resampling selection (Curation.dsirSelect): 'src7'
    * plays the high-quality target slice. The oracle recomputes the
    * hashed-bucket log-ratio model with a join-based scoring pass, while
    * the Spark plan scores map-only through a collected dense array —
    * identical results since both round the per-bucket log ratio once to
    * micro-units and do integer math from there. */
  private[queries] def textDsirSelect(s: SparkSession, dir: String): DataFrame =
    Curation.dsirSelect(Tables.documents(s, dir), targetSource = "src7")
      .orderBy("doc_id")

  private[queries] val textDsirSelectSql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    (CAST(ascii(tok) AS BIGINT) * 961 + CAST(ascii(tok[-1]) AS BIGINT) * 31
      |     + length(tok)) % 1024 AS bucket,
      |    source
      |  FROM toks),
      |counts AS (
      |  SELECT bucket, count(*) AS r_cnt,
      |    count(*) FILTER (WHERE source = 'src7') AS t_cnt
      |  FROM b GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(r_cnt) AS DOUBLE) AS r_tot,
      |    CAST(sum(t_cnt) AS DOUBLE) AS t_tot
      |  FROM counts),
      |lr AS (
      |  SELECT bucket,
      |    CAST(round(ln(((t_cnt + 1.0) / (t_tot + 1024.0))
      |      / ((r_cnt + 1.0) / (r_tot + 1024.0))) * 1000000.0, 0) AS BIGINT)
      |      AS lr_micro
      |  FROM counts CROSS JOIN tot),
      |scored AS (
      |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
      |    CAST(sum(lr.lr_micro) AS BIGINT) AS logw_micro
      |  FROM b JOIN lr USING (bucket) GROUP BY 1),
      |sel AS (
      |  SELECT doc_id FROM scored ORDER BY logw_micro DESC, doc_id LIMIT 100)
      |SELECT s.doc_id, s.n_feats, s.logw_micro,
      |  sel.doc_id IS NOT NULL AS selected
      |FROM scored s LEFT JOIN sel USING (doc_id) ORDER BY s.doc_id""".stripMargin

  /** Per-source dataset report card; the oracle recomputes the same
    * quality gate and language coverage from scratch in SQL, so the card
    * is pinned to the filters it reports on. */
  private[queries] def textReportCard(s: SparkSession, dir: String): DataFrame =
    TextStats.reportCard(Tables.documents(s, dir))

  private[queries] val textReportCardSql = {
    val stops = TextStats.langStopwords.flatMap(_._2)
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT source, text,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT source, len(toks) AS n_tokens,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |      / len(toks) AS mean_len,
       |    CAST(len(list_filter(toks,
       |           x -> regexp_matches(x, '[a-zA-Z一-鿿]'))) AS DOUBLE)
       |      / len(toks) AS alpha_frac,
       |    len(list_filter($stops, w -> list_contains(toks, w))) AS distinct_stops,
       |    len(list_filter(toks, x -> list_contains($stops, x))) AS any_hits
       |  FROM t)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(count(CASE WHEN n_tokens BETWEEN 10 AND 100000
       |    AND mean_len BETWEEN 2.0 AND 12.0
       |    AND alpha_frac >= 0.8 AND distinct_stops >= 2 THEN 1 END) AS BIGINT)
       |    AS quality_keep,
       |  CAST(count(CASE WHEN any_hits > 0 THEN 1 END) AS BIGINT)
       |    AS lang_identified
       |FROM m GROUP BY source ORDER BY source""".stripMargin
  }

  private[queries] def textDecontaminateBloom(s: SparkSession, dir: String): DataFrame =
    TextStats.contaminationBloom(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] def textDecontaminate(s: SparkSession, dir: String): DataFrame =
    TextStats.contamination(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textDecontaminateSql = {
    val gram8 = (0 until 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 97 = 0 OR doc_id % 31 = 0
      |         THEN text || ' alpha bravo charlie delta echo foxtrot golf hotel'
      |         ELSE text END AS text
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 8
      |    THEN list_distinct(list_transform(range(1, len(toks) - 6),
      |           i -> GRAM8))
      |    ELSE [text] END) AS gram
      |  FROM (SELECT doc_id, text,
      |          string_split_regex(trim(text), '\s+') AS toks FROM d)),
      |e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      |t AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0),
      |hits AS (
      |  SELECT t.doc_id, count(DISTINCT t.gram) AS n_hits
      |  FROM t JOIN e USING (gram) GROUP BY 1)
      |SELECT base.doc_id, coalesce(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
      |  coalesce(h.n_hits, CAST(0 AS BIGINT)) > 0 AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) base
      |LEFT JOIN hits h ON base.doc_id = h.doc_id
      |ORDER BY base.doc_id""".stripMargin.replace("GRAM8", gram8)
  }

  private[queries] def textFunnel(s: SparkSession, dir: String): DataFrame =
    TextStats.curationFunnel(Tables.documents(s, dir)).orderBy("stage_id")

  private[queries] val textFunnelSql = {
    val stops = TextStats.langStopwords.flatMap(_._2)
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val hitExprs = TextStats.langStopwords.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($arr, x)))"
    }.mkString("greatest(", ", ", ")")
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |kept AS (
       |  SELECT doc_id, text, toks FROM (
       |    SELECT *, len(toks) AS n_tokens,
       |      CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |        / len(toks) AS mean_len,
       |      CAST(len(list_filter(toks,
       |             x -> regexp_matches(x, '[a-zA-Z一-鿿]'))) AS DOUBLE)
       |        / len(toks) AS alpha_frac,
       |      len(list_filter($stops, w -> list_contains(toks, w))) AS n_stops
       |    FROM t)
       |  WHERE n_tokens BETWEEN 10 AND 100000 AND mean_len BETWEEN 2.0 AND 12.0
       |    AND alpha_frac >= 0.8 AND n_stops >= 2),
       |langed AS (
       |  SELECT doc_id, text FROM kept WHERE $hitExprs > 0),
       |deduped AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY
       |      sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS canon
       |    FROM langed)
       |  WHERE doc_id = canon),
       |sampled AS (SELECT doc_id FROM deduped WHERE doc_id % 10 = 0)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage_id, 'total' AS stage,
       |         count(*) AS n_docs FROM t
       |  UNION ALL SELECT 2, 'quality_keep', count(*) FROM kept
       |  UNION ALL SELECT 3, 'lang_identified', count(*) FROM langed
       |  UNION ALL SELECT 4, 'exact_dedup', count(*) FROM deduped
       |  UNION ALL SELECT 5, 'sample_10pct', count(*) FROM sampled)
       |ORDER BY stage_id""".stripMargin
  }

  private[queries] def textLmScore(s: SparkSession, dir: String): DataFrame =
    TextStats.bigramLmScore(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val textLmScoreSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |                x -> regexp_matches(x, '^[a-z]+$')) AS toks
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)),
      |      i -> toks[i] || ' ' || toks[i+1])) AS gram
      |  FROM t WHERE len(toks) >= 2),
      |docbg AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY 1, 2),
      |model AS (SELECT gram, sum(cnt) AS c12 FROM docbg GROUP BY 1),
      |prefix AS (
      |  SELECT split_part(gram, ' ', 1) AS w1, sum(c12) AS c1
      |  FROM model GROUP BY 1),
      |vocab AS (
      |  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
      |  FROM (SELECT unnest(toks) AS tok FROM t)),
      |scored AS (
      |  SELECT d.doc_id, CAST(sum(d.cnt) AS BIGINT) AS n_bigrams,
      |    CAST(sum(d.cnt * CAST(round((m.c12 + 1.0) / (p.c1 + vocab.v)
      |      * 1000000, 0) AS BIGINT)) AS BIGINT) AS p_micro
      |  FROM docbg d
      |  JOIN model m USING (gram)
      |  JOIN prefix p ON split_part(d.gram, ' ', 1) = p.w1
      |  CROSS JOIN vocab
      |  GROUP BY 1)
      |SELECT doc_id, n_bigrams,
      |  CAST(p_micro // n_bigrams AS BIGINT) AS avg_p_micro
      |FROM scored ORDER BY doc_id""".stripMargin
}
