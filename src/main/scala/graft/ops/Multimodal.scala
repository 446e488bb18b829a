package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side architecture is real — schema, kind-based partitioning
  * (so one partition holds one codec's work), per-partition batch
  * processing via mapPartitions over a typed Dataset, and a stable
  * feature-vector contract. The DECODE ITSELF IS A STUB: this container
  * ships no image/audio codecs, so `decodeStub` derives a deterministic
  * pseudo-feature vector from the payload bytes. A production build
  * swaps `decodeStub` for a real codec call (JNI/FFmpeg/ImageIO); nothing
  * else changes — the contract is bytes → Array[Float](dim).
  *
  * At 100 TB: binaries stay columnar in parquet (never exploded), the
  * decode stage is a narrow per-partition map (no shuffle), and
  * repartitioning by kind bounds codec-library memory per executor.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("duration_ms", LongType))), nullable = false)))

  final case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String, duration_ms: Long)
  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  /** Deterministic synthetic media table derived from `documents` — stands
    * in for a real binary ingest so the plumbing is testable offline. */
  def syntheticMediaFrom(docs: DataFrame): DataFrame = {
    val kind = element_at(typedlit(Seq("image", "audio", "video")),
      (col("doc_id") % 3 + 1).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        upper(element_at(typedlit(Seq("png", "wav", "mp4")),
          (col("doc_id") % 3 + 1).cast("int"))).as("format"),
        (col("doc_id") * 40 + 1000).as("duration_ms")).as("meta"))
  }

  /** STUB decoder: bytes → dim-length pseudo-features via a rolling hash.
    * Replace with a real codec in production; signature and batch shape
    * are the real contract. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(math.floorMod(i, dim)) += math.floorMod(h, 1000L).toFloat / 1000f
      i += 1
    }
    out
  }

  /** Feature extraction: repartition by kind (codec locality), then one
    * mapPartitions pass — the per-partition iterator is the "batch" a
    * real decoder would process (analogous to an Arrow-batched UDF). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = media.select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.format"),
      col("meta.duration_ms")).as[Media]
    typed
      .repartition(col("kind"))
      .mapPartitions { batch: Iterator[Media] =>
        batch.map(m => MediaFeatures(m.media_id, m.kind, decodeStub(m.payload, dim)))
      }
  }

  /** Frame sampling plumbing for video rows: one row per sampled frame
    * timestamp — pure plan math on metadata (the frame decode itself
    * would be a decodeStub-shaped stage downstream). */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("frame_ts_ms"))

  /** Resize planning: target dims preserving aspect ratio — metadata-only
    * (the pixel work is the decoder's; this computes the contract). */
  def resizePlan(media: DataFrame, maxSide: Int = 256): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxSide) / w, lit(maxSide) / h, lit(1.0))
    media.filter(col("kind") === "image")
      .select(col("media_id"),
        col("meta.width").as("src_width"), col("meta.height").as("src_height"),
        floor(w * scale).cast("int").as("dst_width"),
        floor(h * scale).cast("int").as("dst_height"))
  }
}
