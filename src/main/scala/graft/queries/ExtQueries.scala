package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats}
import graft.streaming.Streams

/** Extension surface (SURVEY.md §7.6 + the north-star mandate): dedup,
  * similarity search, text analysis, event-time windows — the operators a
  * large-scale training-data pipeline needs, expressed over `documents`,
  * `embeddings`, and `events`.
  *
  * Oracle policy: everything built from engine-neutral math (set algebra,
  * double folds, sha-256, regex) carries a DuckDB oracle; operators bound
  * to Spark-specific hashes (xxhash64/murmur LSH buckets) are rows-only
  * by the driver contract.
  */
object ExtQueries {

  // ---------------------------------------------------------------- text

  private def textTokens(s: SparkSession, dir: String): DataFrame =
    TextStats.tokenCounts(Tables.documents(s, dir))
      .withColumn("len_chars", col("len_chars").cast("bigint"))
      .orderBy("doc_id")

  private val textTokensSql =
    """SELECT doc_id, n_chars, length(text) AS len_chars,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    TextStats.bpeTokenCounts(Tables.documents(s, dir)).orderBy("doc_id")

  private val textBpeTokensSql =
    s"""SELECT doc_id,
       |  len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       |  len(regexp_extract_all(text, '${TextStats.bpeIshPattern.replace("'", "''")}')) AS bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    TextStats.quality(Tables.documents(s, dir)).orderBy("doc_id")

  private val allStopSql = TextStats.langStopwords.flatMap(_._2)
    .map(w => s"'$w'").mkString("[", ", ", "]")

  private val textQualitySql =
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

  private def textLangid(s: SparkSession, dir: String): DataFrame =
    TextStats.langId(Tables.documents(s, dir)).orderBy("doc_id")

  private val textLangidSql = {
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

  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextStats.fingerprint(Tables.documents(s, dir)).orderBy("doc_id")

  private val textFingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split_regex(trim(text), '\s+'),
      |                     t -> CAST(ascii(t) AS BIGINT) * 31 + length(t))),
      |    (a, b) -> (a * 1000003 + b) % 2147483647) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  private def textGopher(s: SparkSession, dir: String): DataFrame =
    TextStats.gopherQuality(Tables.documents(s, dir)).orderBy("doc_id")

  private val textGopherSql = {
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

  private def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextStats.repetition(Tables.documents(s, dir)).orderBy("doc_id")

  private val textRepetitionSql =
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

  private def textPiiScrub(s: SparkSession, dir: String): DataFrame =
    TextStats.piiScrub(Tables.documents(s, dir)).orderBy("doc_id")

  private val textPiiScrubSql = {
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

  private def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTop(Tables.documents(s, dir), k = 3)
      .orderBy("doc_id", "rank")

  private val textTfidfSql =
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
  private def textClassifierScore(s: SparkSession, dir: String): DataFrame =
    TextStats.classifierScore(Tables.documents(s, dir)).orderBy("doc_id")

  private val textClassifierScoreSql =
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
  private def textBm25(s: SparkSession, dir: String): DataFrame =
    TextStats.bm25Top(Tables.documents(s, dir)).orderBy("doc_id", "rank")

  private val textBm25Sql =
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
  private def textDomainCap(s: SparkSession, dir: String): DataFrame =
    Curation.domainCap(Tables.documents(s, dir), cap = 15).orderBy("doc_id")

  private val textDomainCapSql =
    """SELECT doc_id, source,
      |  row_number() OVER (PARTITION BY source
      |    ORDER BY len(string_split_regex(trim(text), '\s+')) DESC, doc_id)
      |    <= 15 AS kept
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Boilerplate removal: both engines stamp the same footer into
    * doc_id % 7 == 0 (Curation.boilerFooter), segment on 10-token
    * windows, count corpus-wide document frequency per segment, and
    * sha-256 the retained text reassembled in position order. */
  private def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    Curation.boilerplate(Tables.documents(s, dir)).orderBy("doc_id")

  private val textBoilerplateSql = {
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
  private def textBpeMerges(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.train(Tables.documents(s, dir), merges = 5)
      .orderBy("merge_ix")

  private val textBpeMergesSql =
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
  private def textBpeFirstMerge(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.train(Tables.documents(s, dir), merges = 1)

  private val textBpeFirstMergeSql =
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
  private val bpeFrozenMerges =
    Seq(("t", "a"), ("ta", "b"), ("s", "c"), ("q", "u"), ("l", "u"))

  /** BPE ENCODE with a frozen merge table — tokenizer inference. The
    * merges are constants (tokenizer-as-config, how production encodes a
    * corpus), so the oracle replays the exact greedy fold in SQL: DuckDB
    * list_reduce seeds the accumulator with the first element, which
    * matches the empty-seed Spark fold because a lone first symbol can
    * never merge backwards; the accumulator is a unit-separator-delimited
    * string, with ends_with(sep || lhs) as the token-boundary test. */
  private def textBpeEncode(s: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.encode(Tables.documents(s, dir), bpeFrozenMerges)
      .orderBy("doc_id")

  /** DuckDB rendition of the frozen-merge greedy fold over one word `w`
    * — shared by the encode oracle and the token-binary export oracle. */
  private val bpeMergedWordSql: String = {
    val sep = "chr(31)"
    def fold(inner: String, a: String, b: String): String =
      s"string_split(list_reduce($inner, (acc, x) -> " +
        s"CASE WHEN x = '$b' AND (acc = '$a' OR ends_with(acc, $sep || '$a')) " +
        s"THEN substr(acc, 1, length(acc) - ${a.length}) || '${a + b}' " +
        s"ELSE acc || $sep || x END), $sep)"
    val chars = "list_transform(range(length(w)), i -> w[i+1])"
    bpeFrozenMerges.foldLeft(chars) { case (s0, (a, b)) => fold(s0, a, b) }
  }

  private val textBpeEncodeSql = {
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
  private def textSubstringDedup(s: SparkSession, dir: String): DataFrame =
    Curation.substringDedup(Tables.documents(s, dir)).orderBy("doc_id")

  private val textSubstringDedupSql = {
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
  private def textDsirSelect(s: SparkSession, dir: String): DataFrame =
    Curation.dsirSelect(Tables.documents(s, dir), targetSource = "src7")
      .orderBy("doc_id")

  private val textDsirSelectSql =
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
  private def textReportCard(s: SparkSession, dir: String): DataFrame =
    TextStats.reportCard(Tables.documents(s, dir))

  private val textReportCardSql = {
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

  private def textDecontaminateBloom(s: SparkSession, dir: String): DataFrame =
    TextStats.contaminationBloom(Tables.documents(s, dir)).orderBy("doc_id")

  private def textDecontaminate(s: SparkSession, dir: String): DataFrame =
    TextStats.contamination(Tables.documents(s, dir)).orderBy("doc_id")

  private val textDecontaminateSql = {
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

  private def textFunnel(s: SparkSession, dir: String): DataFrame =
    TextStats.curationFunnel(Tables.documents(s, dir)).orderBy("stage_id")

  private val textFunnelSql = {
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

  private def textLmScore(s: SparkSession, dir: String): DataFrame =
    TextStats.bigramLmScore(Tables.documents(s, dir)).orderBy("doc_id")

  private val textLmScoreSql =
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

  // --------------------------------------------------------------- dedup

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir)).orderBy("keep_id")

  private val dedupExactSql =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  private def dedupExactHash(s: SparkSession, dir: String): DataFrame =
    Dedup.exactHashGroups(Tables.documents(s, dir)).orderBy("keep_id")

  private val dedupExactHashSql =
    """SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Deterministic near-dup corpus: a sample of documents plus perturbed
    * copies (last token dropped, id offset by 1,000,000) — guarantees the
    * LSH queries return pairs on data with no natural near-dups. */
  private def withPerturbedCopies(docs: DataFrame, sampleMod: Int): DataFrame = {
    val sample = docs.filter(col("doc_id") % sampleMod === 0)
      .select("doc_id", "text", "lang")
    val perturbed = sample.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      regexp_replace(col("text"), "\\s+\\S+$", "").as("text"),
      col("lang"))
    sample.unionByName(perturbed)
  }

  private def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(withPerturbedCopies(Tables.documents(s, dir), 50),
        threshold = 0.5)
      .orderBy("id_a", "id_b")

  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(withPerturbedCopies(Tables.documents(s, dir), 50),
        maxHamming = 6)
      .orderBy("id_a", "id_b")

  /** Planted-recall oracles for the text LSH paths, mirroring the sim_*
    * recall queries: every sampled document (≥20 tokens, so a one-token
    * perturbation keeps Jaccard ≈ 0.9) gets a perturbed copy planted into
    * the FULL 500-doc corpus at id+1,000,000, and the query asserts the
    * banded pair miner surfaces each (original, planted) pair — candidates
    * must emerge from real bucket collisions, not a pre-trimmed sample.
    * The DuckDB side states the contract as a constant-truth table. */
  private def plantedDocSample(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 20 === 0 &&
      size(TextStats.tokens(col("text"))) >= 20)

  private def withPlantedTextDups(docs: DataFrame): DataFrame = {
    val planted = plantedDocSample(docs)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", regexp_replace(col("text"), "\\s+\\S+$", ""))
    docs.unionByName(planted)
  }

  private def foundPlantedPairs(sample: DataFrame, pairs: DataFrame): DataFrame = {
    val found = pairs.filter(col("id_b") === col("id_a") + 1000000L)
      .select(col("id_a").as("doc_id"), lit(true).as("found_planted"))
    sample.select("doc_id").join(found, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("found_planted"), lit(false)).as("found_planted"))
      .orderBy("doc_id")
  }

  private def dedupMinhashPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    foundPlantedPairs(plantedDocSample(docs),
      Dedup.minhashPairs(withPlantedTextDups(docs), threshold = 0.5))
  }

  /** Incremental-index twin of dedup_minhash_planted: the corpus is signed
    * ONCE into a persistent LSH index (ops.DedupIndex), then the planted
    * batch dedups against the index without touching corpus text — the
    * continuous-ingestion shape. Same planted-recall oracle. */
  private def dedupIndexPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
    DedupIndex.append(root, docs, ingest = "base")
    val batch = plantedDocSample(docs)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", regexp_replace(col("text"), "\\s+\\S+$", ""))
    val pairs = DedupIndex.matches(s, root, batch, threshold = 0.5)
      .select(col("idx_id").as("id_a"), col("new_id").as("id_b"))
    foundPlantedPairs(plantedDocSample(docs), pairs)
  }

  private def dedupSimhashPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    foundPlantedPairs(plantedDocSample(docs),
      Dedup.simhashPairs(withPlantedTextDups(docs), maxHamming = 6))
  }

  private val dedupPlantedSql =
    """SELECT doc_id, CAST(1 AS BOOLEAN) AS found_planted
      |FROM documents
      |WHERE doc_id % 20 = 0 AND len(string_split_regex(trim(text), '\s+')) >= 20
      |ORDER BY doc_id""".stripMargin

  /** Post-dedup canonicalization: every document mapped to its group
    * keeper with a drop flag — oracled row-by-row (the oracle groups on
    * the normalized text itself; same partition, no hash needed). */
  private def dedupCanonical(s: SparkSession, dir: String): DataFrame =
    Dedup.canonicalize(Tables.documents(s, dir)).orderBy("doc_id")

  private val dedupCanonicalSql =
    """WITH c AS (SELECT doc_id,
      |  min(doc_id) OVER (PARTITION BY
      |    trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS canonical_id
      |  FROM documents)
      |SELECT doc_id, canonical_id, doc_id <> canonical_id AS is_dup
      |FROM c ORDER BY doc_id""".stripMargin

  /** Near-dup clustering: connected components (min-label propagation)
    * over the LSH miner's pairs. The planted copy and its original must
    * land in the same cluster for every sampled document — the grouping
    * contract pair mining alone can't state (pairs chain transitively). */
  private def dedupClusterPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val comps = Dedup.connectedComponents(
      Dedup.minhashPairs(withPlantedTextDups(docs), threshold = 0.5))
    val orig = comps.select(col("id").as("doc_id"), col("label").as("l_orig"))
    val copy = comps.select((col("id") - 1000000L).as("doc_id"),
      col("label").as("l_copy"))
    plantedDocSample(docs).select("doc_id")
      .join(orig, Seq("doc_id"), "left_outer")
      .join(copy, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (col("l_orig").isNotNull &&
          col("l_orig") === col("l_copy")).as("same_cluster"))
      .orderBy("doc_id")
  }

  private val dedupClusterPlantedSql =
    """SELECT doc_id, CAST(1 AS BOOLEAN) AS same_cluster
      |FROM documents
      |WHERE doc_id % 20 = 0 AND len(string_split_regex(trim(text), '\s+')) >= 20
      |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: downsample dominant languages by
    * a pure-arithmetic percentile bucket of doc_id — membership is
    * oracled row-by-row because the oracle can compute the identical
    * bucket. A narrow map-only filter at any scale. */
  private def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, dir), "lang",
      Map("en" -> 30, "zh" -> 50))
      .select("doc_id", "lang").orderBy("doc_id")

  private val sampleStratifiedSql =
    """SELECT doc_id, lang FROM documents
      |WHERE ((doc_id % 1000003) * 2654435761) % 100 <
      |  CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 50 ELSE 100 END
      |ORDER BY doc_id""".stripMargin

  /** Target data-mixture resample (40% en / 15% each tail): the oracle
    * re-derives the per-stratum acceptance rates from the same counts and
    * the same IEEE operation order, then applies the same deterministic
    * micro-bucket — acceptance arithmetic AND rate derivation both
    * cross-checked. */
  private def sampleMixture(s: SparkSession, dir: String): DataFrame =
    Sampling.targetMixture(Tables.documents(s, dir), "lang",
      Map("en" -> 0.4, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.15, "zh" -> 0.15))
      .select("doc_id", "lang").orderBy("doc_id")

  private val sampleMixtureSql =
    """WITH w(lang, wt) AS (VALUES ('en', 0.4), ('de', 0.15), ('fr', 0.15),
      |                           ('es', 0.15), ('zh', 0.15)),
      |n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
      |t AS (SELECT min(n.n / CAST(w.wt AS DOUBLE)) AS t
      |      FROM n JOIN w USING (lang)),
      |r AS (SELECT lang,
      |        least(CAST(floor(CAST(w.wt AS DOUBLE) * t.t / n.n * 1000000) AS BIGINT),
      |              1000000) AS rate_micro
      |      FROM n JOIN w USING (lang) CROSS JOIN t)
      |SELECT d.doc_id, d.lang FROM documents d
      |JOIN r USING (lang)
      |WHERE ((d.doc_id % 1000003) * 2654435761) % 1000000 < r.rate_micro
      |ORDER BY d.doc_id""".stripMargin

  /** Sharded-JSONL export driven END-TO-END: write the corpus as 8 JSONL
    * shard dirs (once per JVM+sf), read the files back, and emit per-shard
    * stats PLUS a genuine roundtrip flag (two-sided exceptAll between the
    * read-back rows and the originals — any lost row, mangled field, or
    * broken JSON escaping flips it and fails the hash against the oracle,
    * which derives the same stats from the table and asserts true). */
  private val stagedExport = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def exportJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val orig = Tables.documents(s, dir)
    val out = stagedExport.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-export").toString
      Export.jsonlShards(Tables.documents(s, d), tmp, 8)
      tmp
    })
    val back = Export.readBack(s, out, orig.schema)
    val mismatch = back.drop("shard").exceptAll(orig)
      .unionByName(orig.exceptAll(back.drop("shard")))
    val ok = broadcast(mismatch.agg((count(lit(1)) === 0).as("roundtrip_ok")))
    back.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").cast("bigint").as("total_chars"))
      .crossJoin(ok)
      .select(col("shard"), col("n_docs"), col("total_chars"), col("roundtrip_ok"))
      .orderBy("shard")
  }

  private val exportJsonlSql =
    """WITH a AS (SELECT doc_id, n_chars,
      |  (row_number() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 100, doc_id) - 1) % 8 AS shard
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(1 AS BOOLEAN) AS roundtrip_ok
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  /** The classifier-TRAINING first gradient step oracled exactly
    * (ClassifierTrain — fastText-shaped logistic regression): at w = 0
    * the sigmoid is exactly 0.5, so the full-batch gradient
    * Σ (p − y)·x is pure integer arithmetic that DuckDB replays from the
    * raw table — a wrong feature hash, label join, residual sign, or
    * partial-agg shape shifts an integer and fails the hash. The
    * iterative remainder (sigmoid steps 2..K) is deterministic and
    * pinned by ClassifierTrainSpec, the BPE first-merge pattern. */
  private def textTrainGrad0(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ClassifierTrain
    val feat = ClassifierTrain.features(
      Tables.documents(s, dir), targetSource = "src7")
    ClassifierTrain.gradientFrame(feat, new Array[Long](1024))
      .orderBy("bucket")
  }

  private val textTrainGrad0Sql =
    """WITH toks AS (
      |  SELECT doc_id, CAST(source = 'src7' AS INT) AS y,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents),
      |feat AS (
      |  SELECT doc_id, y,
      |    (CAST(ascii(tok) AS BIGINT) * 961 + CAST(ascii(tok[-1]) AS BIGINT) * 31
      |     + length(tok)) % 1024 AS bucket,
      |    count(*) AS c
      |  FROM toks GROUP BY 1, 2, 3)
      |SELECT bucket,
      |  CAST(sum((500000 - y * 1000000) * c) AS BIGINT) AS grad_micro
      |FROM feat GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Zone-map data-skipping read driven END-TO-END through the warehouse:
    * stage `orders` into an AtomicTable partitioned by orderkey range
    * with per-partition min/max stats committed in the manifest (once per
    * JVM+sf), then answer a key-range aggregate through
    * [[graft.etl.AtomicTable.readPruned]] — partitions whose zone map
    * misses the range are dropped from METADATA, before any file listing
    * (the skip itself is pinned in PlanAuditSpec via inputFiles; the
    * oracle proves the pruned read loses no qualifying row). */
  private val stagedZoneTable = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def whZonemapPrune(s: SparkSession, dir: String): DataFrame = {
    val table = stagedZoneTable.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-zonemap")
        .resolve("orders").toString
      val orders = s.read.parquet(s"$d/orders.parquet")
        .withColumn("okey_range", expr("o_orderkey div 4096"))
      graft.etl.AtomicTable.replacePartitions(s, tmp, orders, "okey_range",
        statsColumns = Seq("o_orderkey"))
      tmp
    })
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_custkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_orderstatus",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("o_orderdate",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("o_orderpriority",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("okey_range",
        org.apache.spark.sql.types.LongType)))
    graft.etl.AtomicTable.readPruned(s, table, schema,
        "o_orderkey", "1000", "5000")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum("o_orderkey").cast("bigint").as("sum_okey"),
        min("o_orderkey").as("min_okey"),
        max("o_orderkey").as("max_okey"))
      .orderBy("o_orderstatus")
  }

  private val whZonemapPruneSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_okey,
      |  min(o_orderkey) AS min_okey, max(o_orderkey) AS max_okey
      |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TOKEN-BINARY export driven END-TO-END (the Megatron .bin/.idx
    * pretraining format): encode with the frozen BPE merges, write 8
    * int32-LE shards + index + vocab once per JVM+sf, memory-map them
    * back, and prove the decoded subword stream of EVERY document
    * byte-equals a fresh encode (sha-256 per doc, full-outer compare).
    * The oracle recomputes per-shard doc and token totals from the raw
    * table — shard dealing and the greedy merge fold replayed in SQL. */
  private val stagedTokenBin = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def exportTokenBin(s: SparkSession, dir: String): DataFrame = {
    val out = stagedTokenBin.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-tokbin").toString
      Export.tokenBinShards(Tables.documents(s, d), bpeFrozenMerges, tmp, 8)
      tmp
    })
    val back = Export.readBackTokens(s, out)
      .select(col("shard"), col("doc_id"),
        size(col("subs")).cast("bigint").as("n_tokens"),
        sha2(array_join(col("subs"), " "), 256).as("back_sha"))
    val ref = graft.ops.Bpe.encode(Tables.documents(s, dir), bpeFrozenMerges)
      .select(col("doc_id"), col("subword_sha"))
    val mismatch = back.join(ref, Seq("doc_id"), "full_outer")
      .filter(col("back_sha").isNull || col("subword_sha").isNull ||
        col("back_sha") =!= col("subword_sha"))
    val ok = broadcast(mismatch.agg((count(lit(1)) === 0).as("roundtrip_ok")))
    back.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("bigint").as("total_tokens"))
      .crossJoin(ok)
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        col("roundtrip_ok"))
      .orderBy("shard")
  }

  private val exportTokenBinSql = {
    val merged = bpeMergedWordSql
    s"""WITH a AS (
       |  SELECT doc_id, text,
       |    (row_number() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 100, doc_id) - 1) % 8 AS shard
       |  FROM documents),
       |enc AS (
       |  SELECT shard, doc_id,
       |    flatten(list_transform(
       |      list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                  x -> regexp_matches(x, '^[a-z]+$$')),
       |      w -> $merged)) AS subs
       |  FROM a)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(len(subs)) AS BIGINT) AS total_tokens,
       |  CAST(1 AS BOOLEAN) AS roundtrip_ok
       |FROM enc GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** Mixture UPSAMPLING (Sampling.upsampleToMixture): src0 is granted
    * 30% and src1 20% of a one-corpus token budget — both far above
    * their ~5% natural share, so they repeat for multiple epochs — and
    * the oracle replays the integer allocation, floor epochs, and the
    * hash-ordered remainder prefix per source. */
  private def sampleMixtureEpochs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val budget = docs
      .select(sum(size(TextStats.tokens(col("text")))).cast("bigint"))
      .first().getLong(0)
    Sampling.upsampleToMixture(docs,
      Map("src0" -> 300000L, "src1" -> 200000L), budget)
      .orderBy("doc_id")
  }

  private val sampleMixtureEpochsSql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    ((doc_id % 1000003) * 2654435761) % 1000000 AS h
      |  FROM documents),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS budget FROM toks),
      |alloc AS (
      |  SELECT source, sum(n_tokens) AS t,
      |    (budget // 1000000) * sh + ((budget % 1000000) * sh) // 1000000 AS alloc
      |  FROM toks CROSS JOIN tot
      |  CROSS JOIN LATERAL (SELECT CASE WHEN source = 'src0' THEN 300000
      |                                  WHEN source = 'src1' THEN 200000
      |                                  ELSE 0 END AS sh) s
      |  GROUP BY source, sh, budget),
      |f AS (SELECT source, alloc // t AS fullr, alloc % t AS rem FROM alloc),
      |cum AS (
      |  SELECT doc_id, source, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM toks)
      |SELECT c.doc_id, c.source, c.n_tokens,
      |  CAST(f.fullr + CASE WHEN c.cumb < f.rem THEN 1 ELSE 0 END AS BIGINT)
      |    AS repeats
      |FROM cum c JOIN f USING (source) ORDER BY doc_id""".stripMargin

  /** Balanced training-shard plan: hash-ordered round-robin dealing, so
    * per-shard row counts differ by ≤1 whatever the id distribution. */
  private def shardPlan(s: SparkSession, dir: String): DataFrame =
    Sampling.shardPlan(Tables.documents(s, dir), 8)

  private val shardPlanSql =
    """WITH a AS (SELECT doc_id, n_chars,
      |  (row_number() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 100, doc_id) - 1) % 8 AS shard
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  private def packSequences(s: SparkSession, dir: String): DataFrame =
    Sampling.packSequences(Tables.documents(s, dir), budget = 512L)
      .orderBy("doc_id")

  private val packSequencesSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |m AS (SELECT max(doc_id) AS max_id FROM documents),
      |b AS (SELECT doc_id, n_tokens, (doc_id * 32) // (max_id + 1) AS bucket
      |      FROM toks, m),
      |bt AS (SELECT bucket, CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
      |       FROM b GROUP BY 1),
      |bo AS (SELECT bucket,
      |         coalesce(CAST(sum(bucket_tokens) OVER (ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |           0) AS bucket_offset
      |       FROM bt),
      |o AS (SELECT b.doc_id, b.n_tokens,
      |        bo.bucket_offset + coalesce(CAST(sum(b.n_tokens) OVER (
      |          PARTITION BY b.bucket ORDER BY b.doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |          0) AS "offset"
      |      FROM b JOIN bo USING (bucket))
      |SELECT doc_id, n_tokens, "offset", "offset" // 512 AS seq_id
      |FROM o ORDER BY doc_id""".stripMargin

  /** Token-budget selection (Sampling.tokenBudget): fill a
    * total/5-token budget with the best classifier-scored documents. The
    * oracle's single global window recomputes what the Spark plan does
    * as a two-phase bucketed prefix sum. */
  private def sampleTokenBudget(s: SparkSession, dir: String): DataFrame =
    Sampling.tokenBudget(Tables.documents(s, dir), denom = 5)
      .orderBy("doc_id")

  private val sampleTokenBudgetSql =
    """WITH scored AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
      |      t -> ((1103515245 * ((CAST(ascii(t) AS BIGINT) * 31 + length(t)) % 1024)
      |             + 12345) // 65536) % 2001 - 1000)) AS BIGINT) AS act_milli
      |  FROM documents),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM scored),
      |cum AS (
      |  SELECT doc_id, act_milli, n_tokens,
      |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY act_milli DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM scored)
      |SELECT c.doc_id, c.act_milli, c.n_tokens, c.cum_before,
      |  c.cum_before < tot.total // 5 AS selected
      |FROM cum c CROSS JOIN tot ORDER BY doc_id""".stripMargin

  /** Corpus-wide heavy hitters through the custom Space-Saving UDAF
    * (graft.functions.SpaceSavingTopK): top-20 tokens with exact counts —
    * capacity 64 exceeds the synthetic vocabulary, so the bounded-memory
    * sketch is exact here and the DuckDB GROUP BY oracle applies. */
  private def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val hh = udaf(new graft.functions.SpaceSavingTopK(capacity = 64, k = 20))
    Tables.documents(s, dir)
      .select(explode(TextStats.tokens(col("text"))).as("token"))
      .agg(hh(col("token")).as("topk"))
      .select(explode(col("topk")).as("tc"))
      .select(col("tc.token").as("token"), col("tc.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  private val textHeavyHittersSql =
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  private def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardTop(Tables.documents(s, dir), sampleMod = 50, k = 20,
      maxSample = 64)

  // the sampled CTE replays the engine's two-stage bound exactly: the
  // modulus filter, then the absolute cap in multiplicative-hash order
  // (plain int64 arithmetic — engine-neutral); at sf0.1 the cap is the
  // binding constraint, so the oracle exercises it
  private val dedupNgramJaccardSql =
    """WITH sample AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 3
      |         THEN list_distinct(list_transform(
      |                range(len(string_split_regex(trim(text), '\s+')) - 2),
      |                i -> string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
      |                     string_split_regex(trim(text), '\s+')[i+2] || ' ' ||
      |                     string_split_regex(trim(text), '\s+')[i+3]))
      |         ELSE [text] END AS sh
      |  FROM (SELECT doc_id, lang, text FROM documents WHERE doc_id % 50 = 0
      |        ORDER BY (doc_id * 1000003) % 999999937, doc_id LIMIT 64))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      |FROM sample a JOIN sample b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |ORDER BY jaccard DESC, id_a, id_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------- similarity

  private def simTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") % 100 === 0), emb, k = 5)
  }

  private val simTopkSql =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id % 100 = 0),
      |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
      |      FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    round(list_dot_product(qe, ce)
      |          / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 6) AS score
      |  FROM q CROSS JOIN c WHERE query_id != neighbor_id)
      |SELECT query_id, rank, neighbor_id, score FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY score DESC, neighbor_id) AS rank
      |  FROM scored)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private def simIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb.filter(col("vec_id") % 100 === 0), emb, k = 5, nprobe = 2)
  }

  /** The trainless IVF is deterministic arithmetic end-to-end (per-label
    * mean centroids — no sampled k-means), so DuckDB replays the whole
    * index: centroid means, nearest-centroid assignment (ties to the
    * lower centroid_id), nprobe=2 probe selection, and the exact cosine
    * re-rank inside probed buckets. Assignment/probe argmaxes compare
    * UNROUNDED doubles in both engines; the synthetic label clusters are
    * separated at ~1e-2 scale, far above cross-engine summation-order
    * ulps (and the emitted scores round to 6dp like every sim_* query). */
  private val simIvfSql =
    """WITH corpusN AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |cents AS (
      |  SELECT label AS centroid_id, list(s / n ORDER BY idx) AS centroid FROM (
      |    SELECT label, idx, sum(e[idx]) AS s, count(*) AS n
      |    FROM corpusN CROSS JOIN (SELECT unnest(range(1, 65)) AS idx) r
      |    GROUP BY label, idx)
      |  GROUP BY label),
      |assigned AS (
      |  SELECT vec_id, e, centroid_id FROM (
      |    SELECT c.vec_id, c.e, t.centroid_id,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.e, t.centroid)
      |          / (sqrt(list_dot_product(c.e, c.e))
      |             * sqrt(list_dot_product(t.centroid, t.centroid))) DESC,
      |        t.centroid_id) AS rn
      |    FROM corpusN c CROSS JOIN cents t) WHERE rn = 1),
      |probed AS (
      |  SELECT query_id, qe, q_norm, centroid_id FROM (
      |    SELECT c.vec_id AS query_id, c.e AS qe,
      |      sqrt(list_dot_product(c.e, c.e)) AS q_norm, t.centroid_id,
      |      row_number() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.e, t.centroid)
      |          / (sqrt(list_dot_product(c.e, c.e))
      |             * sqrt(list_dot_product(t.centroid, t.centroid))) DESC,
      |        t.centroid_id) AS rn
      |    FROM corpusN c CROSS JOIN cents t WHERE c.vec_id % 100 = 0) WHERE rn <= 2),
      |cand AS (
      |  SELECT p.query_id, a.vec_id AS neighbor_id,
      |    round(list_dot_product(p.qe, a.e)
      |          / (p.q_norm * sqrt(list_dot_product(a.e, a.e))), 6) AS score
      |  FROM assigned a JOIN probed p USING (centroid_id)
      |  WHERE p.query_id != a.vec_id)
      |SELECT query_id, rank, neighbor_id, score FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |                               ORDER BY score DESC, neighbor_id) AS rank
      |  FROM cand)
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** ANN scale path (engine-specific hyperplane hashes → rows-only). */
  private def simRpLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.rpLshTopK(emb.filter(col("vec_id") % 100 === 0), emb, k = 5)
  }

  /** Quality oracles for the ANN paths. The synthetic embeddings are
    * isotropic noise (measured: same-label and cross-label mean cosine are
    * both ≈0), so recall@k against the brute-force top-k of NOISE
    * neighbors is not a meaningful bar — no bucketed index can beat it
    * without scanning everything. What ANN actually promises is retrieval
    * of true high-similarity neighbors, so the oracle plants one: a ~1%
    * deterministic perturbation of each query vector (cosine ≈ 0.9999) at
    * id+1,000,000, and the query asserts the ANN path surfaces it in its
    * top-k. The DuckDB side states that contract as a constant-truth
    * table over the same query ids; any query whose planted near-dup is
    * missed hash-mismatches the driver row. */
  private def withPlantedNearDups(emb: DataFrame, sampleMod: Int): DataFrame = {
    val planted = emb.filter(col("vec_id") % sampleMod === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) + lit(0.01) * ((i % 7) - lit(3)).cast("double")))
            .cast("float")).as("embedding"),
        col("label"))
    // materialize: the perturbation transform is a computed projection —
    // without the barrier CollapseProject duplicates it into every
    // downstream per-pair cosine evaluation (round-2's 28-312 s
    // sim_rplsh_recall was exactly this)
    emb.unionByName(planted).localCheckpoint(true)
  }

  private def foundPlanted(ann: DataFrame): DataFrame =
    ann.groupBy("query_id")
      .agg(max(col("neighbor_id") === col("query_id") + 1000000L).as("found_planted"))

  private def simIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    foundPlanted(Similarity.ivfTopK(queries, corpus, k = 5, nprobe = 2))
      .orderBy("query_id")
  }

  /** Same planted-recall contract through the Lloyd-refined IVF index:
    * two k-means iterations on top of the label-mean init, then the same
    * probe/search. */
  private def simIvfKMeansRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    foundPlanted(Similarity.ivfKMeansTopK(queries, corpus, k = 5, nprobe = 2, iters = 2))
      .orderBy("query_id")
  }

  private val simRecallSql =
    """SELECT vec_id AS query_id, CAST(1 AS BOOLEAN) AS found_planted
      |FROM embeddings WHERE vec_id % 100 = 0 ORDER BY query_id""".stripMargin

  /** Embedding-space decontamination with a full VALUE oracle: both
    * engines plant a ~0.9999-cosine perturbed twin of each eval vector
    * (vec_id % 97 slice) into the train side at id + 2,000,000 — the
    * [[withPlantedNearDups]] perturbation — and the oracle recomputes
    * max-cosine-vs-eval and the 0.9 flag exactly in SQL (the natural
    * corpus maxes at ≈0.47 cross-similarity, so the margin is wide on
    * both sides of the threshold). */
  private def simDecontamEmbed(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val eval = emb.filter(col("vec_id") % 97 === 0)
    val planted = eval.select((col("vec_id") + 2000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * (lit(1.0) + lit(0.01) * ((i % 7) - lit(3)).cast("double")))
          .cast("float")).as("embedding"),
      col("label"))
    val train = emb.unionByName(planted).localCheckpoint(true)
    Similarity.semanticDecontam(train, eval).orderBy("vec_id")
  }

  private val simDecontamEmbedSql =
    """WITH ev AS (
      |  SELECT vec_id AS eval_id, embedding FROM embeddings
      |  WHERE vec_id % 97 = 0),
      |planted AS (
      |  SELECT eval_id + 2000000 AS vec_id,
      |    list_transform(range(len(embedding)),
      |      i -> CAST(CAST(embedding[i+1] AS DOUBLE)
      |           * (1.0 + 0.01 * ((i % 7) - 3)) AS FLOAT)) AS embedding
      |  FROM ev),
      |train AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL SELECT vec_id, embedding FROM planted),
      |e AS (SELECT eval_id, CAST(embedding AS DOUBLE[]) AS ee FROM ev),
      |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM train),
      |scored AS (
      |  SELECT c.vec_id,
      |    max(round(list_dot_product(ce, ee)
      |        / (sqrt(list_dot_product(ce, ce)) * sqrt(list_dot_product(ee, ee))),
      |        6)) AS max_sim
      |  FROM c LEFT JOIN e ON NOT (vec_id = eval_id AND ce = ee) GROUP BY 1)
      |SELECT vec_id, max_sim,
      |  coalesce(max_sim >= 0.9, false) AS contaminated
      |FROM scored ORDER BY vec_id""".stripMargin

  /** Exact-oracle int8 quantization of the full embedding table: every
    * arithmetic step is IEEE-exact in both engines, so scale and the
    * integer code vector hash-match bit-for-bit. */
  /** Array outputs are projected through to_json so the driver's
    * pandas-side canonicalization (sort_values) sees a sortable string —
    * a raw array column crashes it with "unhashable type: ndarray"
    * (round-3 verdict #3). Elements are INTEGERS before to_json: integer
    * JSON (`[1,-2,3]`) is format-identical across engines, while double
    * JSON is not (Java writes 1.0E-4 where DuckDB writes 0.0001). */
  private def embQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("scale"), to_json(col("qvec")).as("qvec"))
      .orderBy("vec_id")

  private val embQuantizeSql =
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding,
      |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings)
      |SELECT vec_id, scale,
      |  CAST(to_json(CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
      |       ELSE list_transform(embedding,
      |              x -> CAST(round(CAST(x AS DOUBLE) / scale, 0) AS INTEGER))
      |  END) AS VARCHAR) AS qvec
      |FROM s ORDER BY vec_id""".stripMargin

  /** Unit vector compared as integer NANO-units (round(u*1e9) per
    * element): one extra rounding step applied identically on both
    * engines turns the double array into an integer array with an exact
    * cross-engine JSON rendering (see [[embQuantize]]). */
  private def embL2Normalize(s: SparkSession, dir: String): DataFrame =
    Similarity.l2Normalize(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("l2"),
        to_json(transform(col("unit"),
          x => round(x * 1e9, 0).cast("bigint"))).as("unit_nanos"))
      .orderBy("vec_id")

  private val embL2NormalizeSql =
    """WITH s AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
      |  FROM embeddings),
      |u AS (
      |  SELECT vec_id, round(l2, 6) AS l2,
      |    CASE WHEN l2 = 0 THEN list_transform(embedding, x -> 0.0)
      |         ELSE list_transform(embedding,
      |                x -> round(CAST(x AS DOUBLE) / l2, 9))
      |    END AS unit
      |  FROM s)
      |SELECT vec_id, l2,
      |  CAST(to_json(list_transform(unit,
      |    x -> CAST(round(x * 1000000000.0, 0) AS BIGINT))) AS VARCHAR) AS unit_nanos
      |FROM u ORDER BY vec_id""".stripMargin

  /** SemDeDup planted contract: every planted 1%-perturbed twin
    * (cosine ≈ 0.999 to its original, far above random-pair cosine in
    * 64-dim) must be flagged a duplicate with its original as keeper —
    * multi-probe cluster assignment makes the co-bucketing robust to
    * centroid-boundary straddle, so the constant-truth oracle applies. */
  private def simSemdedupPlanted(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    Similarity.semDedup(corpus, threshold = 0.99, iters = 1)
      .where(col("vec_id") >= 1000000L).orderBy("vec_id")
  }

  private val simSemdedupPlantedSql =
    """SELECT vec_id + 1000000 AS vec_id, vec_id AS keep_id,
      |  CAST(1 AS BOOLEAN) AS is_dup
      |FROM embeddings WHERE vec_id % 100 = 0 ORDER BY vec_id""".stripMargin

  /** Johnson-Lindenstrauss projection to 8 dims, compared as integer
    * MICRO-units (the [[embL2Normalize]] rendering recipe): the ±1 sign
    * matrix derives from integer LCG arithmetic both engines evaluate
    * exactly, and the per-output-dim sum folds in index order on both
    * sides (VectorExprs.JlProject's sequential contract vs DuckDB
    * list_sum). */
  private def embRandomProjection(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(Tables.embeddings(s, dir), outDim = 8)
      .select(col("vec_id"),
        to_json(transform(col("proj"),
          x => round(x * 1e6, 0).cast("bigint"))).as("proj_micros"))
      .orderBy("vec_id")

  private val embRandomProjectionSql =
    """SELECT vec_id,
      |  CAST(to_json(list_transform(range(8), j ->
      |    CAST(round(list_sum(list_transform(range(len(embedding)), i ->
      |      CAST(embedding[i+1] AS DOUBLE) *
      |      (CASE WHEN ((1103515245*(i*8+j)+12345)//65536) % 2 = 0
      |            THEN 1.0 ELSE -1.0 END)))
      |    * 1000000.0, 0) AS BIGINT))) AS VARCHAR) AS proj_micros
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Planted-recall contract through the quantized corpus: the ~0.04%
    * max quantization error cannot drop a 0.9999-cosine planted neighbor
    * below the noise floor, so the constant-truth oracle applies. */
  /** Planted-recall through the PQ index (per-subspace Lloyd codebooks →
    * 8-byte codes → integer ADC shortlist → exact re-rank): the planted
    * 1%-perturbed twin must survive quantization to the shortlist and the
    * exact re-rank then ranks it home. */
  private def simPqRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    foundPlanted(Similarity.pqTopK(queries, corpus, k = 5))
      .orderBy("query_id")
  }

  private def simQuantizedRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    foundPlanted(Similarity.quantizedTopK(queries, corpus, k = 5))
      .orderBy("query_id")
  }

  private def simRpLshRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    foundPlanted(Similarity.rpLshTopK(queries, corpus, k = 5))
      .orderBy("query_id")
  }

  /** Scale-path near-dup mining over the FULL embedding corpus via RP-LSH
    * buckets (no sample cap — the all-pairs `sim_neardup_cosine` stays as
    * the oracle-checkable demo). Planted near-dups are the only pairs
    * above the 0.9 threshold in noise embeddings, so the constant-truth
    * recall oracle applies. */
  private def simNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val pairs = Similarity.cosineNearDupLsh(withPlantedNearDups(emb, 100), threshold = 0.9)
    val found = pairs.filter(col("id_b") === col("id_a") + 1000000L)
      .select(col("id_a").as("query_id"), lit(true).as("found_planted"))
    emb.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("query_id"))
      .join(found, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("found_planted"), lit(false)).as("found_planted"))
      .orderBy("query_id")
  }

  private def simNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupTop(Tables.embeddings(s, dir), sampleMod = 25, k = 20)

  private val simNearDupSql =
    """WITH sample AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |                FROM embeddings WHERE vec_id % 25 = 0)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.e, b.e)
      |        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS score
      |FROM sample a JOIN sample b ON a.vec_id < b.vec_id
      |ORDER BY score DESC, id_a, id_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------- multimodal

  private def mmResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
        Multimodal.syntheticMediaFrom(Tables.documents(s, dir)), maxSide = 256)
      .orderBy("media_id")

  private val mmResizeSql =
    """SELECT doc_id AS media_id,
      |  CAST(doc_id % 640 + 64 AS INT) AS src_width,
      |  CAST(doc_id % 480 + 48 AS INT) AS src_height,
      |  CAST(floor((doc_id % 640 + 64) *
      |       least(256.0 / (doc_id % 640 + 64), 256.0 / (doc_id % 480 + 48), 1.0)) AS INT) AS dst_width,
      |  CAST(floor((doc_id % 480 + 48) *
      |       least(256.0 / (doc_id % 640 + 64), 256.0 / (doc_id % 480 + 48), 1.0)) AS INT) AS dst_height
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin

  private def mmFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.syntheticMediaFrom(Tables.documents(s, dir)), everyMs = 1000L)
      .orderBy("media_id", "frame_ts_ms")

  private val mmFramesSql =
    """SELECT doc_id AS media_id, doc_id * 40 + 1000 AS duration_ms,
      |  unnest(range(0, doc_id * 40 + 1000, 1000)) AS frame_ts_ms
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id, frame_ts_ms""".stripMargin

  /** The REAL image decode oracled end-to-end: synthetic image payloads
    * are solid 16x16 PNGs whose color derives from the id, so the decoded
    * luminance histogram is one-hot with weight exactly 1.0 (256 float
    * increments of 1 / 256 — exact), and the hot bin is pure integer
    * arithmetic DuckDB can replicate. A wrong decode, wrong BT.709
    * weights, or wrong binning shifts the bin and fails the hash. */
  private def mmImageFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMediaFrom(Tables.documents(s, dir))
      .filter(col("kind") === "image")
    Multimodal.extractFeatures(media, dim = 16).toDF()
      .select(col("media_id"),
        posexplode(col("features")).as(Seq("pos", "value")))
      .filter(col("value") =!= 0f)
      .select(col("media_id"), col("pos").cast("bigint").as("hot_bin"),
        col("value").cast("double").as("hot_weight"))
      .orderBy("media_id")
  }

  private val mmImageFeaturesSql =
    """WITH img AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id * 2654435761) % 16777216 AS rgb
      |  FROM documents WHERE doc_id % 3 = 0),
      |lum AS (
      |  SELECT media_id,
      |    (2126 * (rgb // 65536) + 7152 * ((rgb // 256) % 256)
      |      + 722 * (rgb % 256)) // 10000 AS l
      |  FROM img)
      |SELECT media_id, CAST((l * 16) // 256 AS BIGINT) AS hot_bin,
      |  CAST(1.0 AS DOUBLE) AS hot_weight
      |FROM lum ORDER BY media_id""".stripMargin

  /** ALL THREE real decode paths (ImageIO, javax.sound, MP4 container +
    * per-keyframe ImageIO) oracled end-to-end with integer-exact
    * features. Image rows: luminance histogram COUNTS (a solid 16x16 PNG
    * → one hot bin of 256). Audio rows: per-window sums of squared
    * 16-bit PCM samples — the WAV payload is a truncated 12000-amplitude
    * sine whose samples DuckDB reproduces exactly (trunc(sin(...)·12000);
    * Java vs C libm agree on all 6800 sample values, min distance to a
    * truncation boundary 1.5e-14), so every emitted Long is pure integer
    * arithmetic both sides. Video rows: keyframe PNG frames decoded and
    * histogram counts summed — DuckDB recomputes each keyframe's
    * generative solid color (Mp4.frameRgb) and bins it, 256 px per
    * frame. A wrong WAV roundtrip, sample decode, window split, stss
    * walk, frame slice, or histogram bin shifts an integer and fails
    * the hash. */
  private def mmAvFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMediaFrom(Tables.documents(s, dir))
    Multimodal.extractIntFeatures(media, dim = 16).toDF()
      .select(col("media_id"), col("kind"),
        posexplode(col("features")).as(Seq("feature_id", "feature_val")))
      .filter(col("feature_val") =!= 0L)
      .select(col("media_id"), col("kind"),
        col("feature_id").cast("bigint").as("feature_id"), col("feature_val"))
      .orderBy("media_id", "feature_id")
  }

  private val mmAvFeaturesSql =
    """WITH img AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id * 2654435761) % 16777216 AS rgb
      |  FROM documents WHERE doc_id % 3 = 0),
      |imgf AS (
      |  SELECT media_id, 'image' AS kind,
      |    CAST((((2126 * (rgb // 65536) + 7152 * ((rgb // 256) % 256)
      |      + 722 * (rgb % 256)) // 10000) * 16) // 256 AS BIGINT) AS feature_id,
      |    CAST(256 AS BIGINT) AS feature_val
      |  FROM img),
      |aud AS (
      |  SELECT doc_id AS media_id, 200.0 + (doc_id % 17) * 50.0 AS freq
      |  FROM documents WHERE doc_id % 3 = 1),
      |samp AS (
      |  SELECT media_id, i // 25 AS w,
      |    CAST(trunc(sin(2 * pi() * freq * i / 8000.0) * 12000) AS BIGINT) AS s
      |  FROM aud, range(0, 400) t(i)),
      |audf AS (
      |  SELECT media_id, 'audio' AS kind, CAST(w AS BIGINT) AS feature_id,
      |    CAST(sum(s * s) AS BIGINT) AS feature_val
      |  FROM samp GROUP BY 1, 2, 3),
      |vid AS (
      |  SELECT doc_id AS media_id, 8 + doc_id % 5 AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |kf AS (
      |  SELECT media_id,
      |    (media_id * 2654435761 + j * 2246822519) % 16777216 AS rgb
      |  FROM vid, range(0, 12) t(j) WHERE j < n AND j % 4 = 0),
      |vidf AS (
      |  SELECT media_id, 'video' AS kind,
      |    CAST((((2126 * (rgb // 65536) + 7152 * ((rgb // 256) % 256)
      |      + 722 * (rgb % 256)) // 10000) * 16) // 256 AS BIGINT) AS feature_id,
      |    CAST(256 * count(*) AS BIGINT) AS feature_val
      |  FROM kf GROUP BY 1, 2, 3)
      |SELECT * FROM (SELECT * FROM imgf UNION ALL SELECT * FROM audf
      |               UNION ALL SELECT * FROM vidf)
      |WHERE feature_val <> 0
      |ORDER BY media_id, feature_id""".stripMargin

  /** Perceptual IMAGE dedup oracled end-to-end: every document renders a
    * striped 16×16 PNG whose stripe pattern repeats with period 41
    * (planted duplicate groups), the engine decodes the pixels and
    * computes the integer-exact 64-bit average hash, and DuckDB replays
    * the hash from the stripe formula — each 8×8 cell-row averages two
    * uniform rows, so bit r = (8·lum_r > Σ lum). A wrong decode, wrong
    * BT.709 luminance, wrong grid mean, or wrong bit order shifts hex
    * digits and fails the hash; the dup groups prove the dedup window.
    * The hash crosses as 16 hex chars — bit 63 makes the raw BIGINT
    * negative, which hex sidesteps portably. */
  private def mmImageDedup(s: SparkSession, dir: String): DataFrame = {
    val stripes = udf((seed: Long) => Multimodal.renderPngStripes(seed))
    val media = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"),
        stripes(col("doc_id") % 41).as("payload"))
    Dedup.perceptualCanonicalize(Multimodal.imageHashes(media).toDF())
      .select(col("media_id"),
        format_string("%016x", col("ahash")).as("ahash_hex"),
        col("canonical_id"), col("is_dup"))
      .orderBy("media_id")
  }

  private val mmImageDedupSql =
    """WITH lums AS (
      |  SELECT doc_id, r,
      |    (2126 * (rgb // 65536) + 7152 * ((rgb // 256) % 256)
      |      + 722 * (rgb % 256)) // 10000 AS lum
      |  FROM (SELECT doc_id, r,
      |          ((doc_id % 41) * 2654435761 + r * 40503) % 16777216 AS rgb
      |        FROM documents, range(0, 8) t(r))),
      |tot AS (SELECT doc_id, sum(lum) AS tot FROM lums GROUP BY 1),
      |hx AS (
      |  SELECT l.doc_id,
      |    string_agg(CASE WHEN 8 * l.lum > t.tot THEN 'ff' ELSE '00' END,
      |               '' ORDER BY l.r) AS ahash_hex
      |  FROM lums l JOIN tot t USING (doc_id) GROUP BY l.doc_id)
      |SELECT doc_id AS media_id, ahash_hex,
      |  min(doc_id) OVER (PARTITION BY ahash_hex) AS canonical_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY ahash_hex) AS is_dup
      |FROM hx ORDER BY media_id""".stripMargin

  /** Acoustic dedup oracled end-to-end: every document renders a WAV
    * (seed = doc_id, frequency period 17 → planted duplicate groups at
    * the SIGNAL level even though seeds differ), the engine decodes the
    * PCM and fingerprints it with the integer-exact windowed-energy
    * envelope, and DuckDB recomputes the same envelope from the sine
    * formula (the mm_av_features recipe) — dedup groups then fall out of
    * a window over the fingerprint string on both sides. Pinned
    * assumption (shared with mm_av_features): Java Math.sin and the
    * oracle's libm agree on trunc(sin·12000) at every sampled phase —
    * verified here with 1.5e-14 minimum distance to a truncation
    * boundary; a 1-ulp libm divergence AT a boundary would fail the
    * hash loudly on that platform, never silently corrupt. */
  private def mmAudioDedup(s: SparkSession, dir: String): DataFrame = {
    val wav = udf((seed: Long) => Multimodal.renderWav(seed))
    val media = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), wav(col("doc_id")).as("payload"))
    val prints = Multimodal.audioPrints(media).toDF()
      .select(col("media_id"),
        sha2(concat_ws(",", col("energies")), 256).as("fingerprint"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")
    prints
      .withColumn("canonical_id", min(col("media_id")).over(w))
      .select(col("media_id"), col("fingerprint"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("media_id")
  }

  private val mmAudioDedupSql =
    """WITH samp AS (
      |  SELECT doc_id, i // 25 AS w,
      |    CAST(trunc(sin(2 * pi() * (200.0 + (doc_id % 17) * 50.0)
      |      * i / 8000.0) * 12000) AS BIGINT) AS s
      |  FROM documents, range(0, 400) t(i)),
      |env AS (
      |  SELECT doc_id, w, CAST(sum(s * s) AS BIGINT) AS e
      |  FROM samp GROUP BY 1, 2),
      |fp AS (
      |  SELECT doc_id,
      |    sha256(string_agg(CAST(e AS VARCHAR), ',' ORDER BY w)) AS fingerprint
      |  FROM env GROUP BY 1)
      |SELECT doc_id AS media_id, fingerprint,
      |  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_dup
      |FROM fp ORDER BY media_id""".stripMargin

  /** VIDEO dedup oracled end-to-end, completing the modality trifecta
    * with mm_image_dedup / mm_audio_dedup: every document renders an MP4
    * whose seed repeats with period 37 (planted duplicate videos), the
    * engine walks the container, decodes every keyframe frame, and
    * fingerprints the summed luminance histogram; DuckDB replays the
    * histogram from the per-keyframe generative colors (the
    * mm_av_features video CTE) and the dedup window agrees. */
  private def mmVideoDedup(s: SparkSession, dir: String): DataFrame = {
    val mp4 = udf((seed: Long) => Multimodal.memoMp4(seed))
    val media = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), (col("doc_id") % 37).as("seed"))
      .select(col("media_id"), mp4(col("seed")).as("payload"))
    val spark = s
    import spark.implicits._
    val prints = media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        Multimodal.decodeVideoHist(p, 16).map(h => (id, h.toSeq))
      }).toDF("media_id", "hist")
      .select(col("media_id"),
        sha2(concat_ws(",", col("hist")), 256).as("fingerprint"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")
    prints
      .withColumn("canonical_id", min(col("media_id")).over(w))
      .select(col("media_id"), col("fingerprint"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("media_id")
  }

  private val mmVideoDedupSql =
    """WITH vid AS (
      |  SELECT doc_id, doc_id % 37 AS seed, 8 + (doc_id % 37) % 5 AS n
      |  FROM documents),
      |kf AS (
      |  SELECT doc_id,
      |    (seed * 2654435761 + j * 2246822519) % 16777216 AS rgb
      |  FROM vid, range(0, 12) t(j) WHERE j < n AND j % 4 = 0),
      |bins AS (
      |  SELECT doc_id,
      |    (((2126 * (rgb // 65536) + 7152 * ((rgb // 256) % 256)
      |      + 722 * (rgb % 256)) // 10000) * 16) // 256 AS bin
      |  FROM kf),
      |hist AS (
      |  SELECT b.doc_id, i.i AS bin, CAST(count(k.bin) AS BIGINT) * 256 AS c
      |  FROM (SELECT DISTINCT doc_id FROM bins) b
      |  CROSS JOIN range(0, 16) i(i)
      |  LEFT JOIN bins k ON k.doc_id = b.doc_id AND k.bin = i.i
      |  GROUP BY 1, 2),
      |fp AS (
      |  SELECT doc_id,
      |    sha256(string_agg(CAST(c AS VARCHAR), ',' ORDER BY bin))
      |      AS fingerprint
      |  FROM hist GROUP BY 1)
      |SELECT doc_id AS media_id, fingerprint,
      |  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_dup
      |FROM fp ORDER BY media_id""".stripMargin

  /** The VIDEO container path oracled end-to-end: keyframe sample index,
    * presentation time, byte offset and size are PARSED from real MP4
    * sample tables (moov/trak/mdia/minf/stbl walk), while DuckDB derives
    * the same integers from the writer's generative formulas — so a wrong
    * box layout, a wrong stts/stss/stsz/stco parse, or a drifted cumulative
    * offset fails the hash. Pure integer output on both sides. */
  private def mmVideoKeyframes(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoKeyframes(
        Multimodal.syntheticMediaFrom(Tables.documents(s, dir)))
      .toDF().orderBy("media_id", "kf_index")

  private val mmVideoKeyframesSql =
    """WITH vid AS (
      |  SELECT doc_id AS media_id, 8 + doc_id % 5 AS n
      |  FROM documents WHERE doc_id % 3 = 2),
      |samp AS (
      |  SELECT media_id, j, 260 + (media_id * 31 + j * 17) % 100 AS sz
      |  FROM vid, range(0, 12) t(j) WHERE j < n),
      |cum AS (
      |  SELECT media_id, j, sz,
      |    32 + coalesce(sum(sz) OVER (PARTITION BY media_id ORDER BY j
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM samp)
      |SELECT media_id, CAST(j + 1 AS BIGINT) AS kf_index,
      |  CAST(j * 40 AS BIGINT) AS kf_pts_ms,
      |  CAST(off AS BIGINT) AS kf_offset,
      |  CAST(sz AS BIGINT) AS kf_size
      |FROM cum WHERE j % 4 = 0
      |ORDER BY media_id, kf_index""".stripMargin

  // ---------------------------------------------------------------- skew

  /** Salted join on a deliberately skewed key (~90% of lineitem lands on
    * nation 1): the salt spreads the hot key across reducers, and the
    * oracle is the PLAIN SQL join — salting must be invisible in the
    * result. SaltingSpec additionally proves the straggler spread with
    * per-task shuffle-read metrics. */
  private def skewJoinSalted(s: SparkSession, dir: String): DataFrame = {
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

  private val skewJoinSaltedSql =
    s"""SELECT n_name, count(*) AS n, ${sqlDsum("l_quantity", 2)} AS sum_qty
       |FROM lineitem JOIN nation
       |  ON n_nationkey = CASE WHEN l_orderkey % 10 < 9 THEN 1
       |                        ELSE l_orderkey % 25 END
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  // -------------------------------------------------------------- events

  private def evTumbling(s: SparkSession, dir: String): DataFrame =
    EventWindows.tumbling(Tables.events(s, dir))

  private val evTumblingSql =
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
  private val stagedEvents = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // stage once per (JVM, sf dir): the nanos→µs copy is harness plumbing,
  // not part of the streaming operator under test/benchmark
  private def stagedEventsDir(s: SparkSession, dir: String): String =
    stagedEvents.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-ev-stream").toString
      Tables.events(s, d).write.mode("overwrite").parquet(tmp)
      tmp
    })

  private def evTumblingStream(s: SparkSession, dir: String): DataFrame =
    Streams.tumblingAvailableNow(s, stagedEventsDir(s, dir))

  private def evSliding(s: SparkSession, dir: String): DataFrame =
    EventWindows.sliding(Tables.events(s, dir))

  private val evSlidingSql =
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
  private def evSessionStream(s: SparkSession, dir: String): DataFrame =
    Streams.sessionsAvailableNow(s, stagedEventsDir(s, dir))

  /** Arbitrary-stateful streaming driver entry: per-user totals through
    * flatMapGroupsWithState (exact micros arithmetic), oracled by the
    * batch GROUP BY. */
  private def evRunningStream(s: SparkSession, dir: String): DataFrame =
    Streams.totalsAvailableNow(s, stagedEventsDir(s, dir))

  /** Streaming dedup driver entry: first-seen pairs through the state
    * store, oracled by batch DISTINCT. */
  private def evDedupStream(s: SparkSession, dir: String): DataFrame =
    Streams.dedupAvailableNow(s, stagedEventsDir(s, dir))

  private val evDedupStreamSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** Stream-stream join driver entry: purchases matched to same-user
    * clicks within the hour before, oracled by the equivalent batch
    * join. */
  private def evJoinStream(s: SparkSession, dir: String): DataFrame =
    Streams.clickToPurchaseAvailableNow(s, stagedEventsDir(s, dir))

  private val evJoinStreamSql =
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
  private def evAsofStream(s: SparkSession, dir: String): DataFrame =
    Streams.asofAvailableNow(s, stagedEventsDir(s, dir))

  private val evAsofStreamSql =
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
  private val stagedWmEvents = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stagedWmEventsDir(s: SparkSession, dir: String): String =
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

  private def evAsofStreamWm(s: SparkSession, dir: String): DataFrame =
    Streams.asofWatermarked(s, stagedWmEventsDir(s, dir),
        maxFilesPerTrigger = Some(1))
      .filter(col("user_id") =!= 999999999L)

  private val evRunningStreamSql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  private def evSession(s: SparkSession, dir: String): DataFrame =
    EventWindows.sessions(Tables.events(s, dir))

  private val evSessionSql =
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

  private def evJsonKpi(s: SparkSession, dir: String): DataFrame =
    EventWindows.jsonKpi(Tables.events(s, dir))

  private val evJsonKpiSql =
    """SELECT event_type, count(k) AS n_k,
      |  CAST(SUM(CAST(k AS DECIMAL(18,6))) AS DOUBLE) AS sum_k,
      |  max(k) AS max_k
      |FROM (SELECT event_type,
      |        TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
      |      FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Context-window chunking (ops.Chunking): overlapping 200-char windows
    * at stride 150 — a map-only generator pass, zero shuffle. */
  private def textChunks(s: SparkSession, dir: String): DataFrame =
    Chunking.charChunks(Tables.documents(s, dir), size = 200, stride = 150)
      .orderBy("doc_id", "chunk_id")

  private val textChunksSql =
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
  private def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(Tables.documents(s, dir), k = 100)
      .select(col("doc_id"), col("n_chars"), col("priority"))
      .orderBy("priority", "doc_id")

  private val sampleWeightedSql =
    """SELECT doc_id, n_chars,
      |  CAST(((doc_id % 1000003) * 2654435761) % 1000003 + 1 AS DOUBLE)
      |    / CAST(n_chars AS DOUBLE) AS priority
      |FROM documents ORDER BY priority, doc_id LIMIT 100""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "text_tokens" -> QueryDef(textTokens, Some(textTokensSql)),
    "text_chunks" -> QueryDef(textChunks, Some(textChunksSql)),
    "sample_weighted" -> QueryDef(sampleWeighted, Some(sampleWeightedSql)),
    "text_bpe_tokens" -> QueryDef(textBpeTokens, Some(textBpeTokensSql)),
    "text_quality" -> QueryDef(textQuality, Some(textQualitySql)),
    "text_langid" -> QueryDef(textLangid, Some(textLangidSql)),
    "text_fingerprint" -> QueryDef(textFingerprint, Some(textFingerprintSql)),
    "text_heavy_hitters" -> QueryDef(textHeavyHitters, Some(textHeavyHittersSql)),
    "text_gopher" -> QueryDef(textGopher, Some(textGopherSql)),
    "text_repetition" -> QueryDef(textRepetition, Some(textRepetitionSql)),
    "text_pii_scrub" -> QueryDef(textPiiScrub, Some(textPiiScrubSql)),
    "text_tfidf" -> QueryDef(textTfidf, Some(textTfidfSql)),
    "text_lm_score" -> QueryDef(textLmScore, Some(textLmScoreSql)),
    "text_funnel" -> QueryDef(textFunnel, Some(textFunnelSql)),
    "text_decontaminate" -> QueryDef(textDecontaminate, Some(textDecontaminateSql)),
    "text_decontam_bloom" -> QueryDef(textDecontaminateBloom, Some(textDecontaminateSql)),
    "text_report_card" -> QueryDef(textReportCard, Some(textReportCardSql)),
    "text_bm25" -> QueryDef(textBm25, Some(textBm25Sql)),
    "text_classifier_score" -> QueryDef(textClassifierScore, Some(textClassifierScoreSql)),
    "text_domain_cap" -> QueryDef(textDomainCap, Some(textDomainCapSql)),
    "text_boilerplate" -> QueryDef(textBoilerplate, Some(textBoilerplateSql)),
    "text_substring_dedup" -> QueryDef(textSubstringDedup, Some(textSubstringDedupSql)),
    "text_dsir_select" -> QueryDef(textDsirSelect, Some(textDsirSelectSql)),
    "text_bpe_first_merge" -> QueryDef(textBpeFirstMerge, Some(textBpeFirstMergeSql)),
    "text_bpe_merges" -> QueryDef(textBpeMerges, Some(textBpeMergesSql)),
    "text_bpe_encode" -> QueryDef(textBpeEncode, Some(textBpeEncodeSql)),
    "dedup_exact" -> QueryDef(dedupExact, Some(dedupExactSql)),
    "dedup_exact_hash" -> QueryDef(dedupExactHash, Some(dedupExactHashSql)),
    "dedup_minhash_pairs" -> QueryDef(dedupMinhash, None),
    "dedup_minhash_planted" -> QueryDef(dedupMinhashPlanted, Some(dedupPlantedSql)),
    "dedup_index_planted" -> QueryDef(dedupIndexPlanted, Some(dedupPlantedSql)),
    "dedup_simhash_pairs" -> QueryDef(dedupSimhash, None),
    "dedup_simhash_planted" -> QueryDef(dedupSimhashPlanted, Some(dedupPlantedSql)),
    "dedup_ngram_jaccard" -> QueryDef(dedupNgramJaccard, Some(dedupNgramJaccardSql)),
    "dedup_canonical" -> QueryDef(dedupCanonical, Some(dedupCanonicalSql)),
    "dedup_cluster_planted" -> QueryDef(dedupClusterPlanted, Some(dedupClusterPlantedSql)),
    "sample_stratified" -> QueryDef(sampleStratified, Some(sampleStratifiedSql)),
    "sample_mixture" -> QueryDef(sampleMixture, Some(sampleMixtureSql)),
    "export_jsonl_roundtrip" -> QueryDef(exportJsonlRoundtrip, Some(exportJsonlSql)),
    "wh_zonemap_prune" -> QueryDef(whZonemapPrune, Some(whZonemapPruneSql)),
    "text_train_grad0" -> QueryDef(textTrainGrad0, Some(textTrainGrad0Sql)),
    "export_tokenbin_roundtrip" -> QueryDef(exportTokenBin, Some(exportTokenBinSql)),
    "sample_mixture_epochs" -> QueryDef(sampleMixtureEpochs, Some(sampleMixtureEpochsSql)),
    "mm_image_dedup" -> QueryDef(mmImageDedup, Some(mmImageDedupSql)),
    "mm_audio_dedup" -> QueryDef(mmAudioDedup, Some(mmAudioDedupSql)),
    "mm_video_dedup" -> QueryDef(mmVideoDedup, Some(mmVideoDedupSql)),
    "shard_plan" -> QueryDef(shardPlan, Some(shardPlanSql)),
    "pack_sequences" -> QueryDef(packSequences, Some(packSequencesSql)),
    "sample_token_budget" -> QueryDef(sampleTokenBudget, Some(sampleTokenBudgetSql)),
    "sim_topk_bruteforce" -> QueryDef(simTopk, Some(simTopkSql)),
    "sim_ivf_topk" -> QueryDef(simIvf, Some(simIvfSql)),
    "sim_ivf_recall" -> QueryDef(simIvfRecall, Some(simRecallSql)),
    "sim_ivf_kmeans_recall" -> QueryDef(simIvfKMeansRecall, Some(simRecallSql)),
    "sim_rplsh_topk" -> QueryDef(simRpLsh, None),
    "sim_rplsh_recall" -> QueryDef(simRpLshRecall, Some(simRecallSql)),
    "sim_quantized_recall" -> QueryDef(simQuantizedRecall, Some(simRecallSql)),
    "sim_pq_recall" -> QueryDef(simPqRecall, Some(simRecallSql)),
    "sim_semdedup_planted" -> QueryDef(simSemdedupPlanted, Some(simSemdedupPlantedSql)),
    "sim_decontam_embed" -> QueryDef(simDecontamEmbed, Some(simDecontamEmbedSql)),
    "emb_quantize_int8" -> QueryDef(embQuantize, Some(embQuantizeSql)),
    "emb_l2_normalize" -> QueryDef(embL2Normalize, Some(embL2NormalizeSql)),
    "emb_random_projection" -> QueryDef(embRandomProjection, Some(embRandomProjectionSql)),
    "sim_neardup_cosine" -> QueryDef(simNearDup, Some(simNearDupSql)),
    "sim_neardup_lsh" -> QueryDef(simNearDupLsh, Some(simRecallSql)),
    "mm_resize" -> QueryDef(mmResize, Some(mmResizeSql)),
    "mm_frames" -> QueryDef(mmFrames, Some(mmFramesSql)),
    "mm_image_features" -> QueryDef(mmImageFeatures, Some(mmImageFeaturesSql)),
    "mm_av_features" -> QueryDef(mmAvFeatures, Some(mmAvFeaturesSql)),
    "mm_video_keyframes" -> QueryDef(mmVideoKeyframes, Some(mmVideoKeyframesSql)),
    "skewjoin_salted" -> QueryDef(skewJoinSalted, Some(skewJoinSaltedSql)),
    "ev_tumbling" -> QueryDef(evTumbling, Some(evTumblingSql)),
    "ev_tumbling_stream" -> QueryDef(evTumblingStream, Some(evTumblingSql)),
    "ev_sliding" -> QueryDef(evSliding, Some(evSlidingSql)),
    "ev_session" -> QueryDef(evSession, Some(evSessionSql)),
    "ev_session_stream" -> QueryDef(evSessionStream, Some(evSessionSql)),
    "ev_running_stream" -> QueryDef(evRunningStream, Some(evRunningStreamSql)),
    "ev_dedup_stream" -> QueryDef(evDedupStream, Some(evDedupStreamSql)),
    "ev_join_stream" -> QueryDef(evJoinStream, Some(evJoinStreamSql)),
    "ev_asof_stream" -> QueryDef(evAsofStream, Some(evAsofStreamSql)),
    "ev_asof_stream_wm" -> QueryDef(evAsofStreamWm, Some(evAsofStreamSql)),
    "ev_json_kpi" -> QueryDef(evJsonKpi, Some(evJsonKpiSql)),
    "ev_variant_kpi" -> QueryDef(
      (s, dir) => EventWindows.variantKpi(Tables.events(s, dir)),
      Some(evJsonKpiSql)))
}
