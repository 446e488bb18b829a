package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal pure-JVM ISO BMFF (MP4) container layer: a writer that renders
  * structurally valid single-track video files and a box parser that
  * recovers the sample tables and extracts SYNC-SAMPLE (keyframe) byte
  * ranges — the container half of video ingest.
  *
  * The frame CODEC is real too, within a deliberately chosen intra-only
  * scope: every sample is a self-contained PNG image (the MJPEG shape —
  * one intra-coded picture per sample — with the JDK's lossless PNG codec
  * standing in for JPEG, so decode needs no native library and decoded
  * pixels are bit-exact for the oracle). The stsd entry declares `png `
  * accordingly. [[Multimodal.decodeVideoHist]] decodes the parsed
  * keyframe ranges through ImageIO end-to-end; an inter-coded codec
  * (H.264) would swap that call for FFmpeg/JNI and this container layer
  * is unchanged. Samples are zero-padded to the deterministic
  * [[sampleSize]] so the byte LAYOUT stays generative (the
  * mm_video_keyframes oracle recomputes offsets in SQL) while payloads
  * carry real images — PNG decoders stop at IEND, so padding is inert.
  *
  * Scope (documented, deliberate): one video trak, samples in one chunk,
  * 32-bit `stco`, one `stts` run — the shape the writer emits and the
  * synthetic corpus uses. Parsing is defensive — any structural
  * violation returns None rather than throwing (corrupt payloads are
  * data, not errors, at corpus scale).
  *
  * Box layout follows the public ISO/IEC 14496-12 structure (ftyp/mdat/
  * moov/trak/mdia/minf/stbl with stsd/stts/stss/stsc/stsz/stco). */
object Mp4 {

  final case class Keyframe(sampleIx: Int, ptsMs: Long, offset: Long, size: Long)

  // ------------------------------------------------------------- writer

  val Timescale = 1000   // ms ticks
  val FrameDeltaMs = 40  // 25 fps
  val SyncEvery = 4      // samples 1, 5, 9, ... are sync samples
  /** ftyp(24) + mdat header(8): first sample's file offset. */
  val FirstSampleOffset = 32

  /** Deterministic sample count for a seed: 8..12. */
  def sampleCount(seed: Long): Int = (8 + math.floorMod(seed, 5L)).toInt

  /** Deterministic size of 0-based sample j: 260..359 bytes — sized to
    * hold any solid 16×16 PNG frame (~100 bytes) plus inert padding, so
    * the byte layout stays a pure function of (seed, j) that the
    * mm_video_keyframes oracle recomputes in SQL. */
  def sampleSize(seed: Long, j: Int): Int =
    (260 + math.floorMod(seed * 31 + j.toLong * 17, 100L)).toInt

  /** Deterministic solid color of 0-based frame j — the generative
    * formula the mm_av_features oracle replicates in SQL (Knuth + a
    * second odd multiplier so frames within a video differ). */
  def frameRgb(seed: Long, j: Int): Int =
    ((seed * 2654435761L + j.toLong * 2246822519L) & 0xffffffL).toInt

  private def beInt(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v).array()

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    beInt(8 + body.length) ++ typ.getBytes(StandardCharsets.US_ASCII) ++ body
  }

  private def fullBox(typ: String, payload: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](0, 0, 0, 0) +: payload): _*)

  /** Render a structurally valid MP4 whose sample layout derives from the
    * seed; frame payloads are REAL solid-color 16×16 PNG images
    * ([[frameRgb]]), zero-padded to the generative [[sampleSize]]. */
  def writeMinimalMp4(seed: Long): Array[Byte] = {
    val n = sampleCount(seed)
    val sizes = Array.tabulate(n)(sampleSize(seed, _))
    val durationMs = n * FrameDeltaMs

    val ftyp = box("ftyp",
      "isom".getBytes(StandardCharsets.US_ASCII), beInt(0),
      "isom".getBytes(StandardCharsets.US_ASCII),
      "mp41".getBytes(StandardCharsets.US_ASCII))
    require(ftyp.length == 24, s"ftyp layout drifted: ${ftyp.length}")

    // frame payloads: one intra-coded PNG per sample, padded to the
    // deterministic size so the file layout stays a generative formula
    val mdatBody = Array.newBuilder[Byte]
    for (j <- 0 until n) {
      val png = Multimodal.renderPngRgb(frameRgb(seed, j))
      require(png.length <= sizes(j),
        s"PNG frame (${png.length} B) exceeds sample slot ${sizes(j)} B")
      mdatBody ++= png
      mdatBody ++= new Array[Byte](sizes(j) - png.length)
    }
    val mdat = box("mdat", mdatBody.result())

    val mvhd = fullBox("mvhd",
      beInt(0), beInt(0),                    // creation, modification
      beInt(Timescale), beInt(durationMs),
      beInt(0x00010000), Array[Byte](1, 0),  // rate 1.0, volume 1.0
      new Array[Byte](2 + 8),                // reserved
      identityMatrix, new Array[Byte](24),   // matrix, predefined
      beInt(2))                              // next track id
    val tkhd = fullBox("tkhd",
      beInt(0), beInt(0), beInt(1), beInt(0), beInt(durationMs),
      new Array[Byte](8), new Array[Byte](2 + 2 + 2 + 2),
      identityMatrix, beInt(16 << 16), beInt(16 << 16)) // 16x16 fixed-point
    val mdhd = fullBox("mdhd",
      beInt(0), beInt(0), beInt(Timescale), beInt(durationMs),
      Array[Byte](0x55.toByte, 0xc4.toByte), new Array[Byte](2)) // 'und'
    val hdlr = fullBox("hdlr",
      beInt(0), "vide".getBytes(StandardCharsets.US_ASCII),
      new Array[Byte](12), Array[Byte](0))
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1), new Array[Byte](8))
    val dref = fullBox("dref", beInt(1),
      box("url ", Array[Byte](0, 0, 0, 1))) // self-contained
    val dinf = box("dinf", dref)

    // `png ` sample entry (QuickTime-registered fourcc for PNG-coded
    // video samples): the 78-byte VisualSampleEntry body per 14496-12
    // §12.1.3 — no decoder-config box needed, each sample is self-coded
    val entryBody = ByteBuffer.allocate(78).order(ByteOrder.BIG_ENDIAN)
    entryBody.putShort(6, 1.toShort)                            // data_ref_ix
    entryBody.putShort(24, 16.toShort).putShort(26, 16.toShort) // width, height
    entryBody.putInt(28, 0x00480000).putInt(32, 0x00480000)     // 72 dpi
    entryBody.putShort(40, 1.toShort)                           // frame_count
    entryBody.putShort(74, 0x0018.toShort)                      // depth 24
    entryBody.putShort(76, 0xffff.toShort)                      // pre_defined -1
    val sampleEntry = box("png ", entryBody.array())
    val stsd = fullBox("stsd", beInt(1), sampleEntry)

    val stts = fullBox("stts", beInt(1), beInt(n), beInt(FrameDeltaMs))
    val syncs = (1 to n by SyncEvery).toArray
    val stss = fullBox("stss", beInt(syncs.length),
      syncs.flatMap(beInt))
    val stsc = fullBox("stsc", beInt(1), beInt(1), beInt(n), beInt(1))
    val stsz = fullBox("stsz", beInt(0), beInt(n), sizes.flatMap(beInt))
    val stco = fullBox("stco", beInt(1), beInt(FirstSampleOffset))

    val stbl = box("stbl", stsd, stts, stss, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)

    ftyp ++ mdat ++ moov
  }

  private def identityMatrix: Array[Byte] = {
    val b = ByteBuffer.allocate(36).order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 0x00010000); b.putInt(16, 0x00010000); b.putInt(32, 0x40000000)
    b.array()
  }

  // ------------------------------------------------------------- parser

  private final case class Box(typ: String, start: Int, end: Int) // payload span

  /** Children of the byte span [from, to): flat, non-recursive walk. */
  private def boxesIn(bytes: Array[Byte], from: Int, to: Int): Seq[Box] = {
    val out = Seq.newBuilder[Box]
    var p = from
    while (p + 8 <= to) {
      val size = ByteBuffer.wrap(bytes, p, 4).order(ByteOrder.BIG_ENDIAN).getInt
      if (size < 8 || p + size > to) return out.result() // truncated/corrupt: stop
      val typ = new String(bytes, p + 4, 4, StandardCharsets.US_ASCII)
      out += Box(typ, p + 8, p + size)
      p += size
    }
    out.result()
  }

  private def find(bytes: Array[Byte], from: Int, to: Int, typ: String): Option[Box] =
    boxesIn(bytes, from, to).find(_.typ == typ)

  private def path(bytes: Array[Byte], names: Seq[String]): Option[Box] =
    names.foldLeft(Option(Box("", 0, bytes.length))) { (cur, name) =>
      cur.flatMap(b => find(bytes, b.start, b.end, name))
    }

  /** Parse the sync-sample (keyframe) table: 1-based sample index,
    * presentation time, absolute byte offset and size of each keyframe's
    * payload in the file. None when the bytes are not a parseable MP4 in
    * this layer's scope (single chunk, 32-bit stco, one-run stts). */
  def parseKeyframes(bytes: Array[Byte]): Option[Seq[Keyframe]] = try {
    val stbl = path(bytes,
      Seq("moov", "trak", "mdia", "minf", "stbl")).getOrElse(return None)
    def table(typ: String): Option[ByteBuffer] =
      find(bytes, stbl.start, stbl.end, typ).map { b =>
        ByteBuffer.wrap(bytes, b.start + 4, b.end - b.start - 4) // skip ver/flags
          .order(ByteOrder.BIG_ENDIAN)
      }

    val stsz = table("stsz").getOrElse(return None)
    val fixedSize = stsz.getInt
    val n = stsz.getInt
    if (n < 0 || n > (1 << 20)) return None
    val sizes = Array.tabulate(n)(_ => if (fixedSize != 0) fixedSize else stsz.getInt)
    // a corrupt stsz can read negative: it would walk the chunk-offset
    // scan backwards and turn the copyOfRange bounds inside out
    if (sizes.exists(_ < 0)) return None

    val stco = table("stco").getOrElse(return None)
    if (stco.getInt != 1) return None // scope: single chunk
    val chunkOffset = stco.getInt.toLong & 0xffffffffL

    val stsc = table("stsc").getOrElse(return None)
    if (stsc.getInt != 1) return None
    stsc.getInt // first_chunk
    if (stsc.getInt < n) return None  // scope: all samples in the one chunk

    val stts = table("stts").getOrElse(return None)
    val sttsRuns = stts.getInt
    val ptsMs = new Array[Long](n)
    var (sample, t) = (0, 0L)
    var run = 0
    while (run < sttsRuns && sample < n) {
      val (count, delta) = (stts.getInt, stts.getInt)
      var c = 0
      while (c < count && sample < n) {
        ptsMs(sample) = t; t += delta; sample += 1; c += 1
      }
      run += 1
    }
    if (sample < n) return None

    val offsets = sizes.scanLeft(chunkOffset)(_ + _)
    val stss = table("stss").getOrElse(return None)
    val nSync = stss.getInt
    if (nSync < 0 || nSync > n) return None
    Some(Seq.tabulate(nSync) { _ =>
      val ix = stss.getInt // 1-based
      if (ix < 1 || ix > n) return None
      Keyframe(ix, ptsMs(ix - 1), offsets(ix - 1), sizes(ix - 1).toLong)
    })
  } catch {
    case _: IndexOutOfBoundsException | _: java.nio.BufferUnderflowException => None
  }

  /** Keyframe payload bytes, concatenated in sample order — the byte
    * stream a real codec would receive (the stub featurizes it). */
  def keyframeBytes(bytes: Array[Byte]): Option[Array[Byte]] =
    parseKeyframes(bytes).flatMap { kfs =>
      val out = Array.newBuilder[Byte]
      kfs.foreach { k =>
        if (k.offset < 0 || k.size < 0 || k.offset + k.size > bytes.length)
          return None
        out ++= java.util.Arrays.copyOfRange(
          bytes, k.offset.toInt, (k.offset + k.size).toInt)
      }
      Some(out.result())
    }
}
