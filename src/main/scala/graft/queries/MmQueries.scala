package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.Stable.{dsum, sqlDsum}
import graft.ops.{Chunking, Curation, Dedup, DedupIndex, EventWindows, Export, Multimodal, Salting, Sampling, Similarity, TextStats}
import graft.streaming.Streams

/** Multimodal (image/audio/video) query builders (registry order lives in [[ExtQueries]]). */
object MmQueries {
  // ---------------------------------------------------------- multimodal

  private[queries] def mmResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizePlan(
        Multimodal.syntheticMediaFrom(Tables.documents(s, dir)), maxSide = 256)
      .orderBy("media_id")

  private[queries] val mmResizeSql =
    """SELECT doc_id AS media_id,
      |  CAST(doc_id % 640 + 64 AS INT) AS src_width,
      |  CAST(doc_id % 480 + 48 AS INT) AS src_height,
      |  CAST(floor((doc_id % 640 + 64) *
      |       least(256.0 / (doc_id % 640 + 64), 256.0 / (doc_id % 480 + 48), 1.0)) AS INT) AS dst_width,
      |  CAST(floor((doc_id % 480 + 48) *
      |       least(256.0 / (doc_id % 640 + 64), 256.0 / (doc_id % 480 + 48), 1.0)) AS INT) AS dst_height
      |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin

  private[queries] def mmFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.syntheticMediaFrom(Tables.documents(s, dir)), everyMs = 1000L)
      .orderBy("media_id", "frame_ts_ms")

  private[queries] val mmFramesSql =
    """SELECT doc_id AS media_id, doc_id * 40 + 1000 AS duration_ms,
      |  unnest(range(0, doc_id * 40 + 1000, 1000)) AS frame_ts_ms
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id, frame_ts_ms""".stripMargin

  /** The REAL image decode oracled end-to-end: synthetic image payloads
    * are solid 16x16 PNGs whose color derives from the id, so the decoded
    * luminance histogram is one-hot with weight exactly 1.0 (256 float
    * increments of 1 / 256 — exact), and the hot bin is pure integer
    * arithmetic DuckDB can replicate. A wrong decode, wrong BT.709
    * weights, or wrong binning shifts the bin and fails the hash. */
  private[queries] def mmImageFeatures(s: SparkSession, dir: String): DataFrame = {
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

  private[queries] val mmImageFeaturesSql =
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
  private[queries] def mmAvFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMediaFrom(Tables.documents(s, dir))
    Multimodal.extractIntFeatures(media, dim = 16).toDF()
      .select(col("media_id"), col("kind"),
        posexplode(col("features")).as(Seq("feature_id", "feature_val")))
      .filter(col("feature_val") =!= 0L)
      .select(col("media_id"), col("kind"),
        col("feature_id").cast("bigint").as("feature_id"), col("feature_val"))
      .orderBy("media_id", "feature_id")
  }

  private[queries] val mmAvFeaturesSql =
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
  private[queries] def mmImageDedup(s: SparkSession, dir: String): DataFrame = {
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

  private[queries] val mmImageDedupSql =
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
  private[queries] def mmAudioDedup(s: SparkSession, dir: String): DataFrame = {
    val wav = udf((seed: Long) => Multimodal.renderWav(seed))
    val media = Tables.documents(s, dir)
      .select(col("doc_id").as("media_id"), wav(col("doc_id")).as("payload"))
    val prints = Multimodal.audioPrints(media).toDF()
      .select(col("media_id"),
        sha2(concat_ws(",", col("energies")), 256).as("fingerprint"))
    Dedup.keeperJoin(prints, "fingerprint", "media_id")
      .select(col("media_id"), col("fingerprint"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("media_id")
  }

  private[queries] val mmAudioDedupSql =
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
  private[queries] def mmVideoDedup(s: SparkSession, dir: String): DataFrame = {
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
    Dedup.keeperJoin(prints, "fingerprint", "media_id")
      .select(col("media_id"), col("fingerprint"), col("canonical_id"),
        (col("media_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("media_id")
  }

  private[queries] val mmVideoDedupSql =
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
  private[queries] def mmVideoKeyframes(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoKeyframes(
        Multimodal.syntheticMediaFrom(Tables.documents(s, dir)))
      .toDF().orderBy("media_id", "kf_index")

  private[queries] val mmVideoKeyframesSql =
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
}
