package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats, VectorIndex}
import graft.streaming.Streams

/** Similarity-search and embedding query builders (registry order lives in [[ExtQueries]]). */
object SimQueries {
  // ---------------------------------------------------------- similarity

  private[queries] def simTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(recallPanel(emb), emb, k = 5)
  }

  private[queries] val simTopkSql =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 20000),
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

  private[queries] def simIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(recallPanel(emb), emb, k = 5, nprobe = 2)
  }

  /** The trainless IVF is deterministic arithmetic end-to-end (per-label
    * mean centroids — no sampled k-means), so DuckDB replays the whole
    * index: centroid means, nearest-centroid assignment (ties to the
    * lower centroid_id), nprobe=2 probe selection, and the exact cosine
    * re-rank inside probed buckets. Assignment/probe argmaxes compare
    * UNROUNDED doubles in both engines; the synthetic label clusters are
    * separated at ~1e-2 scale, far above cross-engine summation-order
    * ulps (and the emitted scores round to 6dp like every sim_* query). */
  private[queries] val simIvfSql =
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
      |    FROM corpusN c CROSS JOIN cents t
      |    WHERE c.vec_id % 100 = 0 AND c.vec_id < 20000) WHERE rn <= 2),
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
  private[queries] def simRpLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.rpLshTopK(recallPanel(emb), emb, k = 5)
  }

  /** Quality oracles for the ANN paths. The synthetic embeddings are
    * isotropic noise (measured: same-label and cross-label mean cosine are
    * both ≈0), so recall@k against the brute-force top-k of NOISE
    * neighbors is not a meaningful bar — no bucketed index can beat it
    * without scanning everything. What ANN actually promises is retrieval
    * of true high-similarity neighbors, so the oracle plants one: a ~1%
    * deterministic perturbation of each query vector (cosine ≈ 0.9999) at
    * id+Planted.Offset, and the query asserts the ANN path surfaces it in its
    * top-k. The DuckDB side states that contract as a constant-truth
    * table over the same query ids; any query whose planted near-dup is
    * missed hash-mismatches the driver row. */
  private[queries] def withPlantedNearDups(emb: DataFrame, sampleMod: Int): DataFrame = {
    val planted = emb.filter(col("vec_id") % sampleMod === 0)
      .select((col("vec_id") + Planted.Offset).as("vec_id"),
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

  private[queries] def foundPlanted(ann: DataFrame): DataFrame =
    ann.groupBy("query_id")
      .agg(max(col("neighbor_id") === col("query_id") + Planted.Offset).as("found_planted"))

  /** Fixed 200-query recall panel: the %100 slice CAPPED at vec_id <
    * 20,000. Without the cap the panel grows with the corpus (1% of n)
    * and every queries×corpus evaluation — the PQ ADC join above all —
    * turns quadratic in n (measured 52× per 10× decade at the 100×
    * scale point). A recall ESTIMATE gains nothing past a few hundred
    * panel queries, so the panel is a fixed absolute size: harness cost
    * linear in corpus, statistics unchanged. Below 20k vectors (every
    * oracle-gate scale) the cap is a no-op. */
  private[queries] def recallPanel(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 100 === 0 && col("vec_id") < 20000L)

  private[queries] def simIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    foundPlanted(Similarity.ivfTopK(recallPanel(emb), corpus, k = 5, nprobe = 2))
      .orderBy("query_id")
  }

  /** Same planted-recall contract through the Lloyd-refined IVF index:
    * two k-means iterations on top of the label-mean init, then the same
    * probe/search. */
  /** dir -> persisted-index root (built once per JVM). */
  private val indexStaged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The PERSISTENT IVF index (ops/VectorIndex): train + materialize the
    * bucket-partitioned postings and centroid tables once, then answer
    * the recall panel by probing nprobe inverted lists — only those
    * partitions are read ([[graft.etl.AtomicTable.readPartitions]]).
    * Same planted-twin recall contract as `sim_ivf_kmeans_recall`, so a
    * regression anywhere in build/assign/persist/prune/probe drops a
    * planted neighbor and fails the oracle. */
  private[queries] def simIndexRecall(s: SparkSession, dir: String): DataFrame = {
    val root = indexStaged.computeIfAbsent(dir, { _ =>
      val r = java.nio.file.Files.createTempDirectory("graft-vindex").toString
      VectorIndex.build(s, r,
        withPlantedNearDups(Tables.embeddings(s, dir), 100), iters = 2)
      r
    })
    foundPlanted(VectorIndex.query(s, root,
      recallPanel(Tables.embeddings(s, dir)), k = 5, nprobe = 2))
      .orderBy("query_id")
  }

  private[queries] def simIvfKMeansRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    foundPlanted(Similarity.ivfKMeansTopK(recallPanel(emb), corpus, k = 5, nprobe = 2, iters = 2))
      .orderBy("query_id")
  }

  private[queries] val simRecallSql =
    """SELECT vec_id AS query_id, CAST(1 AS BOOLEAN) AS found_planted
      |FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 20000
      |ORDER BY query_id""".stripMargin

  /** Embedding-space decontamination with a full VALUE oracle: both
    * engines plant a ~0.9999-cosine perturbed twin of each eval vector
    * (vec_id % 97 slice) into the train side at id + Planted.DecontamOffset — the
    * [[withPlantedNearDups]] perturbation — and the oracle recomputes
    * max-cosine-vs-eval and the 0.9 flag exactly in SQL (the natural
    * corpus maxes at ≈0.47 cross-similarity, so the margin is wide on
    * both sides of the threshold). */
  private[queries] def simDecontamEmbed(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val eval = emb.filter(col("vec_id") % 97 === 0)
    val planted = eval.select((col("vec_id") + Planted.DecontamOffset).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * (lit(1.0) + lit(0.01) * ((i % 7) - lit(3)).cast("double")))
          .cast("float")).as("embedding"),
      col("label"))
    val train = emb.unionByName(planted).localCheckpoint(true)
    Similarity.semanticDecontam(train, eval).orderBy("vec_id")
  }

  private[queries] val simDecontamEmbedSql =
    s"""WITH ev AS (
      |  SELECT vec_id AS eval_id, embedding FROM embeddings
      |  WHERE vec_id % 97 = 0),
      |planted AS (
      |  SELECT eval_id + ${Planted.DecontamOffset} AS vec_id,
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
  private[queries] def embQuantize(s: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("scale"), to_json(col("qvec")).as("qvec"))
      .orderBy("vec_id")

  private[queries] val embQuantizeSql =
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
  private[queries] def embL2Normalize(s: SparkSession, dir: String): DataFrame =
    Similarity.l2Normalize(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("l2"),
        to_json(transform(col("unit"),
          x => round(x * 1e9, 0).cast("bigint"))).as("unit_nanos"))
      .orderBy("vec_id")

  private[queries] val embL2NormalizeSql =
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
  private[queries] def simSemdedupPlanted(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    Similarity.semDedup(corpus, threshold = 0.99, iters = 1)
      .where(col("vec_id") >= Planted.Offset).orderBy("vec_id")
  }

  private[queries] val simSemdedupPlantedSql =
    s"""SELECT vec_id + ${Planted.Offset} AS vec_id, vec_id AS keep_id,
      |  CAST(1 AS BOOLEAN) AS is_dup
      |FROM embeddings WHERE vec_id % 100 = 0 ORDER BY vec_id""".stripMargin

  /** Johnson-Lindenstrauss projection to 8 dims, compared as integer
    * MICRO-units (the [[embL2Normalize]] rendering recipe): the ±1 sign
    * matrix derives from integer LCG arithmetic both engines evaluate
    * exactly, and the per-output-dim sum folds in index order on both
    * sides (VectorExprs.JlProject's sequential contract vs DuckDB
    * list_sum). */
  private[queries] def embRandomProjection(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(Tables.embeddings(s, dir), outDim = 8)
      .select(col("vec_id"),
        to_json(transform(col("proj"),
          x => round(x * 1e6, 0).cast("bigint"))).as("proj_micros"))
      .orderBy("vec_id")

  private[queries] val embRandomProjectionSql =
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
  private[queries] def simPqRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    foundPlanted(Similarity.pqTopK(recallPanel(emb), corpus, k = 5))
      .orderBy("query_id")
  }

  private[queries] def simQuantizedRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    foundPlanted(Similarity.quantizedTopK(recallPanel(emb), corpus, k = 5))
      .orderBy("query_id")
  }

  private[queries] def simRpLshRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = withPlantedNearDups(emb, 100)
    foundPlanted(Similarity.rpLshTopK(recallPanel(emb), corpus, k = 5))
      .orderBy("query_id")
  }

  /** Scale-path near-dup mining over the FULL embedding corpus via RP-LSH
    * buckets (no sample cap — the all-pairs `sim_neardup_cosine` stays as
    * the oracle-checkable demo). Planted near-dups are the only pairs
    * above the 0.9 threshold in noise embeddings, so the constant-truth
    * recall oracle applies — the UNCAPPED slice here, not [[recallPanel]]:
    * bucketed mining is linear in the corpus, so every planted pair stays
    * in scope at any scale. */
  private[queries] def simNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val pairs = Similarity.cosineNearDupLsh(withPlantedNearDups(emb, 100), threshold = 0.9)
    val found = pairs.filter(col("id_b") === col("id_a") + Planted.Offset)
      .select(col("id_a").as("query_id"), lit(true).as("found_planted"))
    emb.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("query_id"))
      .join(found, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("found_planted"), lit(false)).as("found_planted"))
      .orderBy("query_id")
  }

  /** Constant-truth oracle over the FULL %100 slice (no panel cap) —
    * pairs with [[simNearDupLsh]] only. */
  private[queries] val simNearDupLshSql =
    """SELECT vec_id AS query_id, CAST(1 AS BOOLEAN) AS found_planted
      |FROM embeddings WHERE vec_id % 100 = 0 ORDER BY query_id""".stripMargin

  private[queries] def simNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupTop(Tables.embeddings(s, dir), sampleMod = 25, k = 20,
      maxSample = 64)

  // the sampled CTE replays the engine's two-stage bound exactly (modulus
  // filter, then the absolute cap in multiplicative-hash order); at sf0.1
  // the cap is the binding constraint, so the oracle exercises it
  private[queries] val simNearDupSql =
    """WITH sample AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |                FROM embeddings WHERE vec_id % 25 = 0
      |                ORDER BY (vec_id * 1000003) % 999999937, vec_id LIMIT 64)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.e, b.e)
      |        / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS score
      |FROM sample a JOIN sample b ON a.vec_id < b.vec_id
      |ORDER BY score DESC, id_a, id_b LIMIT 20""".stripMargin
}
