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
  * feature-vector contract (bytes → Array[Float](dim)).
  *
  * The IMAGE decode is real: `javax.imageio` (JDK-native PNG/BMP/GIF/JPEG)
  * → normalized luminance histogram. The AUDIO decode is real:
  * `javax.sound.sampled` (JDK-native WAV/PCM) → per-window RMS energy
  * envelope. The VIDEO decode is real end-to-end within an intra-only
  * codec scope: a pure-JVM ISO BMFF box parser ([[Mp4]]) recovers the
  * sample tables, and each sync sample's byte range decodes as a
  * self-contained PNG frame through ImageIO ([[decodeVideoHist]] — the
  * MJPEG shape with a lossless JDK codec). An inter-coded codec (H.264)
  * would swap the per-frame ImageIO call for FFmpeg/JNI; container walk,
  * batch shape, and feature contract are unchanged.
  *
  * At 100 TB: binaries stay columnar in parquet (never exploded), the
  * decode stage is a narrow per-partition map (no shuffle), and the
  * kind-contiguous RANGE repartition gives codec locality (≤ kinds-1
  * boundary partitions load two codec libraries) at full cluster
  * parallelism — each kind spreads over every partition, unlike a plain
  * hash repartition on kind (3 active cores forever).
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // round-trips a temp file, which at ~10 PNG frames per synthetic video
  // (~17k codec calls at sf0.1) dominated the whole mm family. In-memory
  // cache streams are the right mode for byte-array payloads. Process-
  // wide, idempotent, thread-safe.
  javax.imageio.ImageIO.setUseCache(false)

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
  final case class MediaIntFeatures(media_id: Long, kind: String, features: Array[Long])

  /** Render a tiny real PNG — a 16×16 solid color derived from the seed —
    * so the synthetic table's image rows exercise the REAL ImageIO decode
    * path end to end. In-process PNG encoding is deterministic. */
  def renderPng(seed: Long): Array[Byte] =
    renderPngRgb(((seed * 2654435761L) & 0xffffffL).toInt)

  /** Solid 16×16 PNG of an explicit color — also the per-frame codec of
    * the synthetic videos ([[Mp4.writeMinimalMp4]]). */
  def renderPngRgb(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) { var x = 0; while (x < 16) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Render a small real WAV — 16-bit mono PCM, 8 kHz, 400 samples of a
    * fixed-amplitude sine whose frequency derives from the seed — so the
    * synthetic table's audio rows exercise the REAL javax.sound path. */
  def renderWav(seed: Long): Array[Byte] = {
    val n = 400
    val freq = 200.0 + math.floorMod(seed, 17L) * 50.0
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / 8000.0) * 12000).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table derived from `documents` — stands
    * in for a real binary ingest so the plumbing is testable offline.
    * Image rows carry a real PNG, audio rows a real WAV, video rows a
    * structurally valid MP4 container ([[Mp4.writeMinimalMp4]]: real box
    * tree + sample tables + real PNG frame payloads). All rendered by
    * UDFs so the column stays an expression Catalyst can PRUNE — the
    * metadata-only queries mm_resize/mm_frames must not pay for codec
    * work. `meta.duration_ms` is the DECLARED (catalog) duration, which
    * deliberately need not equal the container's own timeline — container
    * truth comes from the parsed sample tables (mm_video_keyframes). */
  /** Bounded per-JVM memo for the synthetic VIDEO payloads: rendering is
    * a pure function of the seed but now encodes ~10 PNG frames per call,
    * which otherwise dominates every mm_* query's harness side (the
    * engine under test only DECODES). ~3 KB/entry; the cap keeps a
    * huge-sf run from hoarding heap — and when it is reached the memo
    * STOPS INSERTING rather than clearing: a clear-all above the cap made
    * every bench pass at 100× scale re-render the full payload set
    * (observed as super-linear mm_* timings that were pure fixture
    * encode, not engine decode). Test-fixture-only code, like the UDFs. */
  private[graft] val mp4Memo =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()
  private[graft] def memoMp4(seed: Long, cap: Int = 250000): Array[Byte] = {
    val hit = mp4Memo.get(seed)
    if (hit != null) hit
    else if (mp4Memo.size >= cap) Mp4.writeMinimalMp4(seed)
    else mp4Memo.computeIfAbsent(seed, Mp4.writeMinimalMp4 _)
  }

  def syntheticMediaFrom(docs: DataFrame): DataFrame = {
    val kind = element_at(typedlit(Seq("image", "audio", "video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val png = udf(renderPng _)
    val wav = udf(renderWav _)
    val mp4 = udf((seed: Long) => memoMp4(seed))
    docs.select(
      col("doc_id").as("media_id"),
      kind.as("kind"),
      when(kind === "image", png(col("doc_id")))
        .when(kind === "audio", wav(col("doc_id")))
        .otherwise(mp4(col("doc_id"))).as("payload"),
      struct(
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        upper(element_at(typedlit(Seq("png", "wav", "mp4")),
          (col("doc_id") % 3 + 1).cast("int"))).as("format"),
        (col("doc_id") * 40 + 1000).as("duration_ms")).as("meta"))
  }

  /** Horizontally striped 16×16 PNG: row r is the solid color
    * `palette(stripeIx(seed, r))` — a fixture whose 8×8 average-hash is
    * derivable in closed form (each hash cell-row averages two uniform
    * image rows), so the perceptual-dedup oracle can recompute every
    * hash bit in SQL. */
  def renderPngStripes(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      val rgb = stripeRgb(seed, y)
      var x = 0
      while (x < 16) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Color of stripe row y for a seed — the generative formula the
    * oracle replays (same Knuth-multiplier family as [[Mp4.frameRgb]]). */
  def stripeRgb(seed: Long, y: Int): Int =
    ((seed * 2654435761L + (y / 2).toLong * 40503L) & 0xffffffL).toInt

  /** 64-bit perceptual AVERAGE HASH of an image, integer-exact: the
    * image is partitioned into an 8×8 grid, each cell's luminance SUM
    * (BT.709 integer weights, same as [[imageHistCounts]]) is compared
    * against the grid mean without any division —
    * bit = cellSum·64 > totalSum — so the hash is bit-reproducible by
    * any engine from the pixels. Bit 63 is cell (0,0), row-major
    * (MSB-first). Requires dimensions divisible by 8; None otherwise
    * (corpus images are normalized by the resize stage first). */
  def averageHash(img: java.awt.image.BufferedImage): Option[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w % 8 != 0 || h % 8 != 0 || w == 0 || h == 0) return None
    val (cw, ch) = (w / 8, h / 8)
    val sums = new Array[Long](64)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
          722 * (rgb & 0xff)) / 10000
        sums((y / ch) * 8 + x / cw) += lum
        x += 1
      }
      y += 1
    }
    val total = sums.sum
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) * 64L > total) hash |= 1L << (63 - i)
      i += 1
    }
    Some(hash)
  }

  /** DECODE POOL: process-wide cap on concurrent media decodes,
    * independent of task count. Decode is allocation-heavy (raster
    * buffers, PCM arrays) and at local[32] the 32 concurrent decoders
    * contend in ONE heap — the r12 scale study measured the 8-thread
    * control FASTER than 32 on the av-features family (GC/allocation
    * contention, 10-17x per decade). Bounding the decode section (not
    * the task) keeps shuffle/serialization parallel while the
    * allocation firehose stays at a width the heap sustains; on a real
    * cluster each executor JVM gets its own pool, so this caps nothing
    * that matters there (executors run ~4-8 cores). Override with
    * SPARK_GRAFT_DECODE_POOL. Reentrant per thread: the video path
    * decodes frames via [[decodeImage]] while already holding the
    * permit, which must not self-deadlock. */
  private val DecodePool: Int =
    sys.env.get("SPARK_GRAFT_DECODE_POOL").map(_.toInt).getOrElse(8).max(1)
  private val decodePermits = new java.util.concurrent.Semaphore(DecodePool)
  private val holdsPermit = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private def withDecodePermit[A](f: => A): A =
    if (holdsPermit.get()) f
    else {
      decodePermits.acquire()
      holdsPermit.set(true)
      try f finally { holdsPermit.set(false); decodePermits.release() }
    }

  /** Real image decode: JDK ImageIO (PNG/BMP/GIF/JPEG). None when the
    * bytes aren't a decodable image. */
  /** Pixel budget per image — the standard decompression-bomb guard: a
    * corrupt or hostile header declaring huge dimensions must be rejected
    * BEFORE the raster allocates (an OutOfMemoryError is not catchable
    * in any useful way and would take the executor down). */
  val MaxImagePixels: Long = 64L << 20

  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = withDecodePermit {
    // NonFatal, not just IOException: ImageIO's format plugins throw
    // IllegalArgument/IndexOutOfBounds/NegativeArraySize on malformed
    // headers (same crash class as the fuzz-found Mp4 negative-stsz bug)
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val (w, h) = (r.getWidth(0), r.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) None
          else Option(r.read(0))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Image features: dim-bin luminance histogram (BT.709 integer weights),
    * normalized to a distribution — size-invariant and codec-independent
    * (the same pixels give the same features from PNG or BMP bytes). */
  def imageFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
          722 * (rgb & 0xff)) / 10000 // 0..255
        out(lum * dim / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toFloat
    var i = 0
    while (i < dim) { out(i) /= n; i += 1 }
    out
  }

  /** Integer twin of [[imageFeatures]]: raw (unnormalized) dim-bin
    * luminance histogram COUNTS. Exact integers survive any aggregation
    * order and any engine's float formatting, so this is the
    * oracle-friendly feature contract (see mm_av_features). */
  def imageHistCounts(img: java.awt.image.BufferedImage, dim: Int): Array[Long] = {
    val out = new Array[Long](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
          722 * (rgb & 0xff)) / 10000
        out(lum * dim / 256) += 1L
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded-PCM budget per payload: a corrupt WAV header can declare an
    * absurd rate/frame-length whose conversion stream expands without
    * bound — fuzz-found as a 100%-CPU multi-GB readAllBytes hang, the
    * executor-stalling failure mode. Anything past the cap is corrupt. */
  val MaxPcmBytes: Int = 16 << 20

  /** Real audio decode: JDK javax.sound (WAV/PCM, any sample size the JDK
    * converts to 16-bit). None when the bytes aren't a decodable stream
    * or the decoded PCM exceeds [[MaxPcmBytes]]. */
  def decodeAudio(payload: Array[Byte]): Option[Array[Short]] = withDecodePermit {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      // validate the DECLARED format before any conversion work: the JDK
      // conversion stream spins unboundedly on corrupt fields (fuzz-found:
      // degenerate frame size / absurd rates make each read() loop at
      // 100% CPU), so a sanity window on the header is the only safe gate
      val f = in.getFormat
      val frames = in.getFrameLength
      val sane = java.lang.Float.isFinite(f.getSampleRate) &&
        f.getSampleRate >= 1f && f.getSampleRate <= 1e6f &&
        f.getChannels >= 1 && f.getChannels <= 16 &&
        f.getSampleSizeInBits >= 1 && f.getSampleSizeInBits <= 64 &&
        f.getFrameSize >= 1 && f.getFrameSize <= 1024 &&
        frames >= 0 && frames * 2L * f.getChannels <= MaxPcmBytes
      if (!sane) return None
      val fmt16 = new javax.sound.sampled.AudioFormat(
        f.getSampleRate, 16, f.getChannels, true, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(fmt16, in)
      val bytes = pcm.readNBytes(MaxPcmBytes + 1)
      if (bytes.length > MaxPcmBytes) return None
      val out = new Array[Short](bytes.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        i += 1
      }
      Some(out)
    } catch {
      // includes UnsupportedAudioFileException and IOException, plus the
      // runtime exceptions the sample-rate/frame-size conversion math
      // throws on corrupt WAV headers — a corrupt payload is data, not an
      // error, at corpus scale
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Audio features: dim-window RMS energy envelope, normalized to full
    * scale (each value in [0, 1]) — the standard cheap audio signature. */
  def audioFeatures(samples: Array[Short], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var w = 0
    while (w < dim) {
      val lo = (samples.length.toLong * w / dim).toInt
      val hi = (samples.length.toLong * (w + 1) / dim).toInt
      var acc = 0.0
      var i = lo
      while (i < hi) { acc += samples(i).toDouble * samples(i); i += 1 }
      if (hi > lo) out(w) = (math.sqrt(acc / (hi - lo)) / 32768.0).toFloat
      w += 1
    }
    out
  }

  /** Integer twin of [[audioFeatures]]: per-window sum of squared 16-bit
    * samples. The samples are exact integers and each window's sum fits a
    * Long with ~40 bits to spare, so the value is bit-reproducible by any
    * engine from the same PCM — the oracle-friendly audio signature. */
  def audioWindowEnergies(samples: Array[Short], dim: Int): Array[Long] = {
    val out = new Array[Long](dim)
    if (samples.isEmpty) return out
    var w = 0
    while (w < dim) {
      val lo = (samples.length.toLong * w / dim).toInt
      val hi = (samples.length.toLong * (w + 1) / dim).toInt
      var acc = 0L
      var i = lo
      while (i < hi) { acc += samples(i).toLong * samples(i); i += 1 }
      out(w) = acc
      w += 1
    }
    out
  }

  /** REAL video decode: walk the MP4 sample tables ([[Mp4.parseKeyframes]]),
    * slice each sync sample's byte range, decode it as an intra-coded
    * image through ImageIO (the synthetic corpus writes PNG frames — see
    * [[Mp4]]'s codec-scope note), and accumulate the luminance histogram
    * COUNTS across keyframes. Integer-exact, so it is oracle-checkable
    * like [[imageHistCounts]]. None when the container doesn't parse or
    * any keyframe fails to decode — all-or-nothing keeps the emitted
    * values a pure function of the payload bytes. */
  def decodeVideoHist(payload: Array[Byte], dim: Int): Option[Array[Long]] = withDecodePermit {
    Mp4.parseKeyframes(payload).flatMap { kfs =>
      val acc = new Array[Long](dim)
      kfs.foreach { k =>
        if (k.offset < 0 || k.size <= 0 || k.offset + k.size > payload.length)
          return None
        val frame = java.util.Arrays.copyOfRange(
          payload, k.offset.toInt, (k.offset + k.size).toInt)
        // reentrant: this thread already holds the decode permit
        decodeImage(frame) match {
          case Some(img) =>
            val h = imageHistCounts(img, dim)
            var i = 0
            while (i < dim) { acc(i) += h(i); i += 1 }
          case None => return None
        }
      }
      Some(acc)
    }
  }

  /** Kind-dispatched decode: images through the real ImageIO path, audio
    * through the real javax.sound path, video through the real MP4
    * container parse + per-keyframe ImageIO decode
    * ([[decodeVideoHist]], normalized to a pixel distribution like
    * [[imageFeatures]]). All fall back to the stub on undecodable bytes
    * rather than failing the batch (corrupt payloads are data, not
    * errors, at corpus scale). */
  def decode(kind: String, payload: Array[Byte], dim: Int): Array[Float] =
    kind match {
      case "image" => decodeImage(payload).map(imageFeatures(_, dim))
        .getOrElse(decodeStub(payload, dim))
      case "audio" => decodeAudio(payload).map(audioFeatures(_, dim))
        .getOrElse(decodeStub(payload, dim))
      case "video" => decodeVideoHist(payload, dim).map { counts =>
          val n = counts.sum.toFloat
          counts.map(c => if (n == 0f) 0f else c / n)
        }.getOrElse(decodeStub(payload, dim))
      case _ => decodeStub(payload, dim)
    }

  /** STUB decoder: bytes → dim-length pseudo-features via a rolling hash.
    * Since every kind now has a real decode path, this is only the
    * corrupt-payload fallback of [[decode]] (and the stand-in for any
    * future kind with no JVM codec). */
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

  /** Kind-contiguous repartition at FULL parallelism: range-partition on
    * (kind, media_id), so partitions are contiguous runs of one kind (at
    * most kinds-1 boundary partitions see two codecs) while every kind
    * spreads over the whole partition count. A plain repartition(kind)
    * leaves ≤3 non-empty partitions regardless of cluster size — a
    * 1000-executor run would decode on 3 cores. */
  private def repartitionByKind(media: DataFrame): DataFrame =
    media.repartitionByRange(col("kind"), col("media_id"))

  /** Feature extraction: kind-homogeneous salted repartition (codec
    * locality at full parallelism), then one mapPartitions pass — the
    * per-partition iterator is the "batch" a real decoder would process
    * (analogous to an Arrow-batched UDF). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = repartitionByKind(media).select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.format"),
      col("meta.duration_ms")).as[Media]
    typed
      .mapPartitions { batch: Iterator[Media] =>
        batch.map(m => MediaFeatures(m.media_id, m.kind, decode(m.kind, m.payload, dim)))
      }
  }

  /** Integer-feature extraction over the REAL decoders: image →
    * luminance histogram counts, audio → windowed PCM energies, video →
    * per-keyframe decoded histogram counts summed ([[decodeVideoHist]]),
    * all via the same repartition-by-kind + mapPartitions batch shape as
    * [[extractFeatures]]. Undecodable payloads yield an EMPTY feature
    * array (they fall out of a posexplode) rather than a stub — this
    * path exists to be oracled end-to-end, so every emitted value must
    * be reproducible from the payload bytes alone. */
  def extractIntFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaIntFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed = repartitionByKind(media).select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.format"),
      col("meta.duration_ms")).as[Media]
    typed
      .mapPartitions { batch: Iterator[Media] =>
        batch.map { m =>
          val feats = m.kind match {
            case "image" => decodeImage(m.payload)
              .map(imageHistCounts(_, dim)).getOrElse(Array.empty[Long])
            case "audio" => decodeAudio(m.payload)
              .map(audioWindowEnergies(_, dim)).getOrElse(Array.empty[Long])
            case "video" => decodeVideoHist(m.payload, dim)
              .getOrElse(Array.empty[Long])
            case _ => Array.empty[Long]
          }
          MediaIntFeatures(m.media_id, m.kind, feats)
        }
      }
  }

  final case class MediaHash(media_id: Long, ahash: Long)
  final case class AudioPrint(media_id: Long, energies: Array[Long])

  /** Acoustic fingerprints for audio payloads: decode + the integer-
    * exact [[audioWindowEnergies]] envelope (the signature mm_av_features
    * already oracles per window). Two payloads with the same decoded PCM
    * produce identical envelopes, so a group-by on the envelope is exact
    * audio dedup — robust to container re-muxing (WAV header variants),
    * not to re-encoding (that needs a spectral fingerprint, which would
    * slot into this same batch shape). */
  def audioPrints(media: DataFrame, dim: Int = 16): Dataset[AudioPrint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        decodeAudio(p).map(s => AudioPrint(id, audioWindowEnergies(s, dim)))
      })
  }

  /** Perceptual hashes for image payloads: decode + [[averageHash]] in
    * the same mapPartitions batch shape as the feature extractors.
    * Undecodable or un-hashable payloads contribute no row (corrupt
    * payloads are data; a dedup pass must simply not dedup them).
    * Input needs (media_id, payload). */
  def imageHashes(media: DataFrame): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        decodeImage(p).flatMap(averageHash).map(MediaHash(id, _))
      })
  }

  final case class VideoKeyframe(media_id: Long, kf_index: Long,
      kf_pts_ms: Long, kf_offset: Long, kf_size: Long)

  /** Keyframe table for video rows, PARSED from the MP4 container bytes
    * (stts/stss/stsz/stco walk — [[Mp4.parseKeyframes]]): 1-based sample
    * index, presentation time, and the payload byte range of every sync
    * sample. This is the real container half of video ingest — the stage
    * that feeds a codec exactly the keyframe byte ranges to decode,
    * without reading the rest of the stream. Narrow per-row parse after
    * the kind repartition; unparseable payloads contribute no rows. */
  def videoKeyframes(media: DataFrame): Dataset[VideoKeyframe] = {
    val spark = media.sparkSession
    import spark.implicits._
    repartitionByKind(media.filter(col("kind") === "video")).select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.format"),
      col("meta.duration_ms")).as[Media]
      .mapPartitions { batch: Iterator[Media] =>
        batch.flatMap { m =>
          Mp4.parseKeyframes(m.payload).getOrElse(Seq.empty).map(k =>
            VideoKeyframe(m.media_id, k.sampleIx.toLong, k.ptsMs, k.offset, k.size))
        }
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
