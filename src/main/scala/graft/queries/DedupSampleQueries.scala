package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats}
import graft.streaming.Streams

import TextQueries.{bpeFrozenMerges, bpeMergedWordSql}

/** Dedup, sampling, export, and warehouse query builders (registry order lives in [[ExtQueries]]). */
object DedupSampleQueries {
  // --------------------------------------------------------------- dedup

  private[queries] def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir)).orderBy("keep_id")

  private[queries] val dedupExactSql =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  private[queries] def dedupExactHash(s: SparkSession, dir: String): DataFrame =
    Dedup.exactHashGroups(Tables.documents(s, dir)).orderBy("keep_id")

  private[queries] val dedupExactHashSql =
    """SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Deterministic near-dup corpus: a sample of documents plus perturbed
    * copies (last token dropped, id offset by Planted.Offset) — guarantees the
    * LSH queries return pairs on data with no natural near-dups. */
  private[queries] def withPerturbedCopies(docs: DataFrame, sampleMod: Int): DataFrame = {
    val sample = docs.filter(col("doc_id") % sampleMod === 0)
      .select("doc_id", "text", "lang")
    val perturbed = sample.select(
      (col("doc_id") + Planted.Offset).as("doc_id"),
      regexp_replace(col("text"), "\\s+\\S+$", "").as("text"),
      col("lang"))
    sample.unionByName(perturbed)
  }

  private[queries] def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(withPerturbedCopies(Tables.documents(s, dir), 50),
        threshold = 0.5)
      .orderBy("id_a", "id_b")

  private[queries] def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(withPerturbedCopies(Tables.documents(s, dir), 50),
        maxHamming = 6)
      .orderBy("id_a", "id_b")

  /** Planted-recall oracles for the text LSH paths, mirroring the sim_*
    * recall queries: every sampled document (≥20 tokens, so a one-token
    * perturbation keeps Jaccard ≈ 0.9) gets a perturbed copy planted into
    * the FULL 500-doc corpus at id+Planted.Offset, and the query asserts the
    * banded pair miner surfaces each (original, planted) pair — candidates
    * must emerge from real bucket collisions, not a pre-trimmed sample.
    * The DuckDB side states the contract as a constant-truth table. */
  private[queries] def plantedDocSample(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 20 === 0 &&
      size(TextStats.tokens(col("text"))) >= 20)

  private[queries] def withPlantedTextDups(docs: DataFrame): DataFrame = {
    val planted = plantedDocSample(docs)
      .withColumn("doc_id", col("doc_id") + Planted.Offset)
      .withColumn("text", regexp_replace(col("text"), "\\s+\\S+$", ""))
    docs.unionByName(planted)
  }

  private[queries] def foundPlantedPairs(sample: DataFrame, pairs: DataFrame): DataFrame = {
    val found = pairs.filter(col("id_b") === col("id_a") + Planted.Offset)
      .select(col("id_a").as("doc_id"), lit(true).as("found_planted"))
    sample.select("doc_id").join(found, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("found_planted"), lit(false)).as("found_planted"))
      .orderBy("doc_id")
  }

  private[queries] def dedupMinhashPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    foundPlantedPairs(plantedDocSample(docs),
      Dedup.minhashPairs(withPlantedTextDups(docs), threshold = 0.5))
  }

  /** Incremental-index twin of dedup_minhash_planted: the corpus is signed
    * ONCE into a persistent LSH index (ops.DedupIndex), then the planted
    * batch dedups against the index without touching corpus text — the
    * continuous-ingestion shape. Same planted-recall oracle. */
  private[queries] def dedupIndexPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-idx").toString
    DedupIndex.append(root, docs, ingest = "base")
    val batch = plantedDocSample(docs)
      .withColumn("doc_id", col("doc_id") + Planted.Offset)
      .withColumn("text", regexp_replace(col("text"), "\\s+\\S+$", ""))
    val pairs = DedupIndex.matches(s, root, batch, threshold = 0.5)
      .select(col("idx_id").as("id_a"), col("new_id").as("id_b"))
    foundPlantedPairs(plantedDocSample(docs), pairs)
  }

  private[queries] def dedupSimhashPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    foundPlantedPairs(plantedDocSample(docs),
      Dedup.simhashPairs(withPlantedTextDups(docs), maxHamming = 6))
  }

  private[queries] val dedupPlantedSql =
    """SELECT doc_id, CAST(1 AS BOOLEAN) AS found_planted
      |FROM documents
      |WHERE doc_id % 20 = 0 AND len(string_split_regex(trim(text), '\s+')) >= 20
      |ORDER BY doc_id""".stripMargin

  /** Post-dedup canonicalization: every document mapped to its group
    * keeper with a drop flag — oracled row-by-row (the oracle groups on
    * the normalized text itself; same partition, no hash needed). */
  private[queries] def dedupCanonical(s: SparkSession, dir: String): DataFrame =
    Dedup.canonicalize(Tables.documents(s, dir)).orderBy("doc_id")

  private[queries] val dedupCanonicalSql =
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
  private[queries] def dedupClusterPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val comps = Dedup.connectedComponents(
      Dedup.minhashPairs(withPlantedTextDups(docs), threshold = 0.5))
    val orig = comps.select(col("id").as("doc_id"), col("label").as("l_orig"))
    val copy = comps.select((col("id") - Planted.Offset).as("doc_id"),
      col("label").as("l_copy"))
    plantedDocSample(docs).select("doc_id")
      .join(orig, Seq("doc_id"), "left_outer")
      .join(copy, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (col("l_orig").isNotNull &&
          col("l_orig") === col("l_copy")).as("same_cluster"))
      .orderBy("doc_id")
  }

  private[queries] val dedupClusterPlantedSql =
    """SELECT doc_id, CAST(1 AS BOOLEAN) AS same_cluster
      |FROM documents
      |WHERE doc_id % 20 = 0 AND len(string_split_regex(trim(text), '\s+')) >= 20
      |ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: downsample dominant languages by
    * a pure-arithmetic percentile bucket of doc_id — membership is
    * oracled row-by-row because the oracle can compute the identical
    * bucket. A narrow map-only filter at any scale. */
  private[queries] def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, dir), "lang",
      Map("en" -> 30, "zh" -> 50))
      .select("doc_id", "lang").orderBy("doc_id")

  private[queries] val sampleStratifiedSql =
    """SELECT doc_id, lang FROM documents
      |WHERE ((doc_id % 1000003) * 2654435761) % 100 <
      |  CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 50 ELSE 100 END
      |ORDER BY doc_id""".stripMargin

  /** Target data-mixture resample (40% en / 15% each tail): the oracle
    * re-derives the per-stratum acceptance rates from the same counts and
    * the same IEEE operation order, then applies the same deterministic
    * micro-bucket — acceptance arithmetic AND rate derivation both
    * cross-checked. */
  private[queries] def sampleMixture(s: SparkSession, dir: String): DataFrame =
    Sampling.targetMixture(Tables.documents(s, dir), "lang",
      Map("en" -> 0.4, "de" -> 0.15, "fr" -> 0.15, "es" -> 0.15, "zh" -> 0.15))
      .select("doc_id", "lang").orderBy("doc_id")

  private[queries] val sampleMixtureSql =
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
  private[queries] val stagedExport = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] def exportJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val orig = Tables.documents(s, dir)
    val out = stagedExport.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-export").toString
      Export.jsonlShards(Tables.documents(s, d), tmp, 8)
      tmp
    })
    // NOT persisted (measured r14): the JSONL parse is cheap enough that
    // re-running it for the three consumers beats materializing the wide
    // text column (10x corpus: 0.99 s unpersisted vs 1.22 s persisted) —
    // unlike the gzip/BPE decodes (warc, tokenbin), which are persisted.
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

  /** WARC export + DSv2 read driven END-TO-END (graft.sources.WarcSource —
    * the Common Crawl container): write the corpus as 6 per-record-gzip
    * `.warc.gz` shards, read them back through
    * `spark.read.format("warc")`, restore every document field from the
    * record (payload→text, target URI→doc_id+source, the CC language
    * header→lang), and emit per-shard stats plus the two-sided-exceptAll
    * roundtrip flag. Any framing, gzip-member, header-escaping, or
    * field-mapping defect flips the flag or shifts a stat and fails the
    * oracle hash. */
  private[queries] def warcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.WarcIO
    val origCols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val orig = Tables.documents(s, dir).select(origCols.map(col): _*)
    val out = stagedExport.computeIfAbsent("warc:" + dir, { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-warc").toString
      WarcIO.warcShards(Tables.documents(s, dir), tmp, 6)
      tmp
    })
    val back = s.read.format("warc").load(out)
      .select(
        regexp_extract(col("source_file"), "shard=(\\d+)", 1).cast("bigint").as("shard"),
        element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        col("payload").cast("string").as("text"),
        element_at(col("headers"), "WARC-Identified-Content-Language").as("lang"),
        element_at(split(col("target_uri"), "/"), 3).as("source"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      // persist: the WARC gzip-member decode feeds three consumers (both
      // exceptAll sides and the shard stats) — see export_tokenbin_roundtrip
      .persist()
    val restored = back.select(origCols.map(col): _*)
    val mismatch = restored.exceptAll(orig).unionByName(orig.exceptAll(restored))
    val ok = broadcast(mismatch.agg((count(lit(1)) === 0).as("roundtrip_ok")))
    back.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").cast("bigint").as("total_chars"))
      .crossJoin(ok)
      .select(col("shard"), col("n_docs"), col("total_chars"), col("roundtrip_ok"))
      .orderBy("shard")
  }

  /** TFRecord export + read driven END-TO-END (ops/TfRecord — framed
    * tf.train.Example records with masked-CRC32C words, the tf.data
    * loader handoff): write 5 shard files, stream them back with CRC
    * verification, restore every field from the Example features, and
    * emit per-shard stats plus the two-sided-exceptAll roundtrip flag.
    * A wire-format, varint, framing, or CRC defect flips the flag or
    * shifts a stat and fails the oracle hash. */
  private[queries] def tfrecordRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.TfRecord
    val origCols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val orig = Tables.documents(s, dir).select(origCols.map(col): _*)
    val out = stagedExport.computeIfAbsent("tfrecord:" + dir, { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-tfrec").toString
      TfRecord.tfrecordShards(Tables.documents(s, dir), tmp, 5)
      tmp
    })
    // NOT persisted (measured r14): the framed-record decode is cheap
    // enough that re-running it for the three consumers beats
    // materializing the wide text column (10x: 0.92 s vs 1.04 s persisted).
    val back = TfRecord.readShards(s, out)
    val restored = back.select(origCols.map(col): _*)
    val mismatch = restored.exceptAll(orig).unionByName(orig.exceptAll(restored))
    val ok = broadcast(mismatch.agg((count(lit(1)) === 0).as("roundtrip_ok")))
    back.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").cast("bigint").as("total_chars"))
      .crossJoin(ok)
      .select(col("shard"), col("n_docs"), col("total_chars"), col("roundtrip_ok"))
      .orderBy("shard")
  }

  private[queries] val tfrecordRoundtripSql =
    """WITH a AS (SELECT doc_id, n_chars,
      |  (row_number() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 100, doc_id) - 1) % 5 AS shard
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(1 AS BOOLEAN) AS roundtrip_ok
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  private[queries] val warcRoundtripSql =
    """WITH a AS (SELECT doc_id, n_chars,
      |  (row_number() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 100, doc_id) - 1) % 6 AS shard
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(1 AS BOOLEAN) AS roundtrip_ok
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  private[queries] val exportJsonlSql =
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
  private[queries] def textTrainGrad0(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.ClassifierTrain
    val feat = ClassifierTrain.features(
      Tables.documents(s, dir), targetSource = "src7")
    ClassifierTrain.gradientFrame(feat, new Array[Long](1024))
      .orderBy("bucket")
  }

  private[queries] val textTrainGrad0Sql =
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
  private[queries] val stagedZoneTable = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] def whZonemapPrune(s: SparkSession, dir: String): DataFrame = {
    val table = stagedZoneTable.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-zonemap")
        .resolve("orders").toString
      val orders = s.read.parquet(s"$d/orders.parquet")
        .withColumn("okey_range", expr("o_orderkey div 4096"))
      // co-locate each range before the partitioned write: file count
      // stays one per range, not ranges x tasks — at 10x the key space
      // (10x the ranges) the un-colocated write was a 46k-file
      // explosion and the single super-linear point in the wh decade
      graft.etl.AtomicTable.replacePartitions(s, tmp,
        orders.repartition(col("okey_range")), "okey_range",
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

  private[queries] val whZonemapPruneSql =
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
  private[queries] val stagedTokenBin = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] def exportTokenBin(s: SparkSession, dir: String): DataFrame = {
    val out = stagedTokenBin.computeIfAbsent(dir, { d =>
      val tmp = java.nio.file.Files.createTempDirectory("graft-tokbin").toString
      Export.tokenBinShards(Tables.documents(s, d), bpeFrozenMerges, tmp, 8)
      tmp
    })
    // persist: the mmap read-back + per-doc decode + sha feeds TWO
    // differently-keyed consumers (the doc_id-keyed roundtrip compare and
    // the shard-keyed stats), so without a materialization the whole
    // decode pipeline executed twice (final plan had two Scan[obj]
    // subtrees, no reuse — exchanges keyed doc_id vs shard never match).
    // Four narrow scalars per row; released by the bench's clearCache —
    // the same candidate-table convention as Dedup.minhashPairs.
    val back = Export.readBackTokens(s, out)
      .select(col("shard"), col("doc_id"),
        size(col("subs")).cast("bigint").as("n_tokens"),
        sha2(array_join(col("subs"), " "), 256).as("back_sha"))
      .persist()
    val ref = graft.ops.Bpe.encode(Tables.documents(s, dir), bpeFrozenMerges)
      .select(col("doc_id"), col("subword_sha"))
    // SHUFFLE_HASH: FullOuter cannot broadcast, and the default sort-merge
    // pays a sort on each side; both sides are narrow (id + 64-char sha),
    // so the per-partition hash build is the cheaper full-outer strategy
    // (guide §3.1).
    val mismatch = back.join(ref.hint("SHUFFLE_HASH"), Seq("doc_id"), "full_outer")
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

  private[queries] val exportTokenBinSql = {
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
  private[queries] def sampleMixtureEpochs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val budget = docs
      .select(sum(size(TextStats.tokens(col("text")))).cast("bigint"))
      .first().getLong(0)
    Sampling.upsampleToMixture(docs,
      Map("src0" -> 300000L, "src1" -> 200000L), budget)
      .orderBy("doc_id")
  }

  private[queries] val sampleMixtureEpochsSql =
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
  private[queries] def shardPlan(s: SparkSession, dir: String): DataFrame =
    Sampling.shardPlan(Tables.documents(s, dir), 8)

  private[queries] val shardPlanSql =
    """WITH a AS (SELECT doc_id, n_chars,
      |  (row_number() OVER (ORDER BY ((doc_id % 1000003) * 2654435761) % 100, doc_id) - 1) % 8 AS shard
      |  FROM documents)
      |SELECT shard, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM a GROUP BY shard ORDER BY shard""".stripMargin

  private[queries] def packSequences(s: SparkSession, dir: String): DataFrame =
    Sampling.packSequences(Tables.documents(s, dir), budget = 512L)
      .orderBy("doc_id")

  private[queries] val packSequencesSql =
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
  private[queries] def sampleTokenBudget(s: SparkSession, dir: String): DataFrame =
    Sampling.tokenBudget(Tables.documents(s, dir), denom = 5)
      .orderBy("doc_id")

  private[queries] val sampleTokenBudgetSql =
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
  private[queries] def textHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val hh = udaf(new graft.functions.SpaceSavingTopK(capacity = 64, k = 20))
    Tables.documents(s, dir)
      .select(explode(TextStats.tokens(col("text"))).as("token"))
      .agg(hh(col("token")).as("topk"))
      .select(explode(col("topk")).as("tc"))
      .select(col("tc.token").as("token"), col("tc.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  private[queries] val textHeavyHittersSql =
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
      |      FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  private[queries] def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardTop(Tables.documents(s, dir), sampleMod = 50, k = 20,
      maxSample = 64)

  // the sampled CTE replays the engine's two-stage bound exactly: the
  // modulus filter, then the absolute cap in multiplicative-hash order
  // (plain int64 arithmetic — engine-neutral); at sf0.1 the cap is the
  // binding constraint, so the oracle exercises it
  private[queries] val dedupNgramJaccardSql =
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
}
