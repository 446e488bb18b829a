package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{AtomicTable, MergeInto}

/** A PERSISTENT IVF vector index over [[AtomicTable]]s — the piece that
  * takes the in-query IVF search ([[Similarity.ivfKMeansTopK]]) to a
  * corpus that outlives any one job and dwarfs executor memory:
  *
  *  - **Layout**: `<root>/postings` is an AtomicTable PARTITIONED BY the
  *    centroid bucket (one dir per inverted list, vec_id zone-mapped);
  *    `<root>/centroids` is a tiny single-partition AtomicTable (the
  *    trained quantizer). Both inherit the full warehouse machinery —
  *    atomic commits, retention/time travel, compaction, changefeed.
  *  - **Build**: distributed Lloyd's over the corpus, one assign pass,
  *    one partitioned write. **Append**: new vectors assign against the
  *    FROZEN centroids (the FAISS `add` contract) and land as an atomic
  *    per-bucket upsert — re-adding a vec_id replaces it, and a racing
  *    writer aborts rather than clobbers.
  *  - **Query**: probe the `nprobe` nearest buckets per query, then read
  *    ONLY those partitions ([[AtomicTable.readPartitions]] — unnamed
  *    inverted lists are never even listed) and re-rank exactly inside
  *    them. Per-batch cost ∝ probed lists, independent of index size:
  *    the property that makes a 100 TB index queryable. The probe-set
  *    decision is driver-side and bounded by the CENTROID count (an
  *    index build parameter, hundreds to thousands), the standard
  *    serving shape.
  *
  * Corpus contract: `vec_id` LONG, `embedding` ARRAY<FLOAT> (dim 64 —
  * [[Similarity]]'s fixed test dim), `label` (build only, seeds Lloyd's
  * deterministic init). */
object VectorIndex {

  val PostingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("v_norm", DoubleType),
    StructField("bucket", StringType)))

  val CentroidsSchema: StructType = StructType(Seq(
    StructField("bucket", StringType),
    StructField("centroid", ArrayType(DoubleType)),
    StructField("cent_norm", DoubleType),
    StructField("part", StringType)))

  private def postingsT(root: String) = s"$root/postings"
  private def centroidsT(root: String) = s"$root/centroids"

  /** Nearest-centroid assignment: centroids broadcast, corpus map-only. */
  private def assign(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val v = vectors.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("v_norm"))
    val scored = v.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("v_norm"), col("bucket"),
        (Similarity.dot(col("embedding"), col("centroid")) /
          (col("v_norm") * col("cent_norm"))).as("c_score"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_score").desc, col("bucket"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "embedding", "v_norm", "bucket")
  }

  /** Train the quantizer (distributed Lloyd's) and materialize both
    * tables. One assign pass over the corpus, one partitioned write per
    * table; `retain` sizes the snapshot window for readers pinned to an
    * index version while a rebuild lands. */
  def build(spark: SparkSession, root: String, corpus: DataFrame,
      iters: Int = 2, retain: Int = 2): Unit = {
    val cents = Similarity.kmeansCentroids(corpus, iters)
      .select(col("centroid_id").cast("string").as("bucket"), col("centroid"))
      .withColumn("cent_norm", Similarity.norm(col("centroid")))
      .localCheckpoint(true)
    AtomicTable.replacePartitions(spark, centroidsT(root),
      cents.withColumn("part", lit("all")), "part", retain = retain)
    AtomicTable.replacePartitions(spark, postingsT(root),
      assign(corpus, cents).repartition(col("bucket")), "bucket",
      statsColumns = Seq("vec_id"), retain = retain)
    ()
  }

  /** The frozen quantizer. */
  def loadCentroids(spark: SparkSession, root: String): DataFrame =
    AtomicTable.read(spark, centroidsT(root), CentroidsSchema).drop("part")

  /** Add (or replace, by vec_id) vectors against the FROZEN centroids:
    * an atomic per-bucket upsert — only the buckets the new vectors
    * land in are rewritten, every other inverted list is carried by
    * reference. Periodic [[AtomicTable.compact]] keeps lists one file
    * each; rebuild with [[build]] when drift warrants retraining. */
  def append(spark: SparkSession, root: String, vectors: DataFrame,
      retain: Int = 2): Unit = {
    val cents = loadCentroids(spark, root).localCheckpoint(true)
    MergeInto.upsert(spark, postingsT(root), PostingsSchema,
      assign(vectors, cents).repartition(col("bucket")),
      Seq("vec_id"), "bucket", statsColumns = Seq("vec_id"), retain = retain)
    ()
  }

  /** ANN top-k for a query batch: nprobe buckets per query, ONLY those
    * inverted lists read, exact cosine re-rank inside them. Output:
    * (query_id, rank, neighbor_id, score). */
  def query(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    val cents = loadCentroids(spark, root).localCheckpoint(true)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      Similarity.norm(col("embedding")).as("q_norm"))
    val scored = q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("q_emb"), col("q_norm"), col("bucket"),
        (Similarity.dot(col("q_emb"), col("centroid")) /
          (col("q_norm") * col("cent_norm"))).as("c_score"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("bucket"))
    val probed = scored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_norm"), col("bucket"))
      .localCheckpoint(true)
    // the probe SET is collected driver-side to choose which inverted
    // lists to read — bounded by the centroid count, never the corpus
    val buckets = probed.select("bucket").distinct()
      .collect().map(_.getString(0)).toSet
    val posts = AtomicTable.readPartitions(spark, postingsT(root),
      PostingsSchema, buckets)
    // probe side broadcast (a query batch x nprobe, not a corpus); the
    // inverted lists stream past it with no shuffle of embeddings
    val cands = posts.join(broadcast(probed), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          (col("q_norm") * col("v_norm")), 6).as("score"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(wr).cast("bigint"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
      .orderBy("query_id", "rank")
  }
}
