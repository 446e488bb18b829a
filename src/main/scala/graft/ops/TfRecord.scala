package graft.ops

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord export/ingest — the other standard training-loader handoff
  * next to JSONL and token-binary: length-framed `tf.train.Example`
  * protobuf records with masked-CRC32C integrity words, the format
  * tf.data / array_record pipelines memory-stream. Both the framing and
  * the Example message are public specs (TFRecord framing: uint64-LE
  * length + masked crc32c(length) + payload + masked crc32c(payload);
  * Example/Features/Feature: tensorflow/core/example/{example,feature}
  * .proto, standard proto wire format), implemented here directly so the
  * engine carries zero new dependencies.
  *
  * Scale shape matches [[Export.jsonlShards]]: balanced shard assignment
  * by the two-phase prefix-sum rank, one exchange, each shard file
  * written by its owning task in doc_id order (byte-deterministic),
  * staged + atomically renamed. The reader streams shard files record by
  * record (O(record) memory) with CRC verification — a flipped bit fails
  * loudly, not as silent corpus corruption. */
object TfRecord {

  // ------------------------------------------------------------ framing

  /** TFRecord's masked CRC: rotate right 15 then add the mask constant. */
  def maskedCrc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C
    c.update(bytes, off, len)
    val crc = c.getValue.toInt // low 32 bits
    (Integer.rotateRight(crc, 15) + 0xa282ead8) // int arithmetic == mod 2^32
  }

  def writeFramed(out: OutputStream, data: Array[Byte]): Unit = {
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putLong(data.length.toLong)
    head.putInt(maskedCrc32c(head.array(), 0, 8))
    out.write(head.array())
    out.write(data)
    val foot = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    foot.putInt(maskedCrc32c(data, 0, data.length))
    out.write(foot.array())
  }

  /** Stream the framed records of one TFRecord file, verifying both CRC
    * words. Owns and closes `in`. */
  def readFramed(in: InputStream, source: String = "<stream>"): Iterator[Array[Byte]] = {
    val raw = new BufferedInputStream(in, 64 * 1024)
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = null
      private var done = false

      private def readFully(n: Int, ctx: String): Array[Byte] = {
        val a = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = raw.read(a, off, n - off)
          if (r < 0) throw new EOFException(s"$source: EOF $ctx (byte $off of $n)")
          off += r
        }
        a
      }

      private def advance(): Unit = {
        if (done) return
        val first = raw.read()
        if (first < 0) { done = true; raw.close(); return }
        val head = new Array[Byte](12)
        head(0) = first.toByte
        var off = 1
        while (off < 12) {
          val r = raw.read(head, off, 12 - off)
          if (r < 0) throw new EOFException(s"$source: EOF inside record header")
          off += r
        }
        val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        val lenCrc = bb.getInt
        if (lenCrc != maskedCrc32c(head, 0, 8))
          throw new java.io.IOException(s"$source: length CRC mismatch")
        val data = readFully(Math.toIntExact(len), "inside record payload")
        val footBytes = readFully(4, "inside record footer")
        val dataCrc = ByteBuffer.wrap(footBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
        if (dataCrc != maskedCrc32c(data, 0, data.length))
          throw new java.io.IOException(s"$source: payload CRC mismatch")
        nextRec = data
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) {
          try advance()
          catch { case e: Throwable => try raw.close() catch { case _: Throwable => }; throw e }
        }
        nextRec != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  // --------------------------------------------- tf.train.Example wire

  sealed trait FeatureValue
  final case class BytesV(vs: Seq[Array[Byte]]) extends FeatureValue
  final case class FloatV(vs: Seq[Float]) extends FeatureValue
  final case class Int64V(vs: Seq[Long]) extends FeatureValue

  private def varintSize(v: Long): Int = {
    var n = 1; var x = v
    while ((x & ~0x7FL) != 0) { n += 1; x >>>= 7 }
    n
  }

  private final class ProtoOut(cap: Int) {
    val buf = new java.io.ByteArrayOutputStream(cap)
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { buf.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      buf.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3 | wire).toLong)
    def lenDelim(field: Int, bytes: Array[Byte]): Unit = {
      tag(field, 2); varint(bytes.length.toLong); buf.write(bytes)
    }
    def bytes: Array[Byte] = buf.toByteArray
  }

  private def encodeFeature(v: FeatureValue): Array[Byte] = {
    val o = new ProtoOut(64)
    v match {
      case BytesV(vs) => // Feature.bytes_list = 1 { repeated bytes value = 1 }
        val inner = new ProtoOut(64)
        vs.foreach(b => inner.lenDelim(1, b))
        o.lenDelim(1, inner.bytes)
      case FloatV(vs) => // Feature.float_list = 2 { repeated float value = 1 [packed] }
        val packed = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(packed.putFloat)
        val inner = new ProtoOut(16)
        inner.lenDelim(1, packed.array())
        o.lenDelim(2, inner.bytes)
      case Int64V(vs) => // Feature.int64_list = 3 { repeated int64 value = 1 [packed] }
        val packed = new ProtoOut(16)
        vs.foreach(packed.varint)
        val inner = new ProtoOut(16)
        inner.lenDelim(1, packed.bytes)
        o.lenDelim(3, inner.bytes)
    }
    o.bytes
  }

  /** Encode an Example. Feature order is the caller's — pass sorted keys
    * for byte-determinism (proto maps have no canonical order; we pick
    * one and pin it). */
  def encodeExample(features: Seq[(String, FeatureValue)]): Array[Byte] = {
    val fs = new ProtoOut(256)
    features.foreach { case (k, v) =>
      // Features.feature map entry: { string key = 1; Feature value = 2 }
      val entry = new ProtoOut(128)
      entry.lenDelim(1, k.getBytes(StandardCharsets.UTF_8))
      entry.lenDelim(2, encodeFeature(v))
      fs.lenDelim(1, entry.bytes)
    }
    val ex = new ProtoOut(256)
    ex.lenDelim(1, fs.bytes) // Example.features = 1
    ex.bytes
  }

  private final class ProtoIn(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val byte = b(pos); pos += 1
        result |= (byte & 0x7FL) << shift
        if ((byte & 0x80) == 0) return result
        shift += 7
        if (shift >= 64) throw new java.io.IOException("varint overlong")
      }
      result
    }
    def slice(len: Int): ProtoIn = { val s = new ProtoIn(b, pos, pos + len); pos += len; s }
    def sliceBytes(len: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(b, pos, pos + len); pos += len; a
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => val n = Math.toIntExact(varint()); pos += n
      case 5 => pos += 4
      case w => throw new java.io.IOException(s"unsupported wire type $w")
    }
  }

  private def decodeFeature(in: ProtoIn): FeatureValue = {
    var out: FeatureValue = null
    while (in.hasMore) {
      val tag = in.varint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => // bytes_list
          val bl = in.slice(Math.toIntExact(in.varint()))
          val vs = Seq.newBuilder[Array[Byte]]
          while (bl.hasMore) {
            val t = bl.varint()
            if ((t >> 3).toInt == 1 && (t & 7) == 2)
              vs += bl.sliceBytes(Math.toIntExact(bl.varint()))
            else bl.skip((t & 7).toInt)
          }
          out = BytesV(vs.result())
        case (2, 2) => // float_list (packed or repeated)
          val fl = in.slice(Math.toIntExact(in.varint()))
          val vs = Seq.newBuilder[Float]
          while (fl.hasMore) {
            val t = fl.varint()
            if ((t >> 3).toInt == 1 && (t & 7) == 2) {
              val packed = fl.slice(Math.toIntExact(fl.varint()))
              while (packed.hasMore) {
                val bb = ByteBuffer.wrap(packed.sliceBytes(4)).order(ByteOrder.LITTLE_ENDIAN)
                vs += bb.getFloat
              }
            } else if ((t >> 3).toInt == 1 && (t & 7) == 5) {
              val bb = ByteBuffer.wrap(fl.sliceBytes(4)).order(ByteOrder.LITTLE_ENDIAN)
              vs += bb.getFloat
            } else fl.skip((t & 7).toInt)
          }
          out = FloatV(vs.result())
        case (3, 2) => // int64_list (packed or repeated)
          val il = in.slice(Math.toIntExact(in.varint()))
          val vs = Seq.newBuilder[Long]
          while (il.hasMore) {
            val t = il.varint()
            if ((t >> 3).toInt == 1 && (t & 7) == 2) {
              val packed = il.slice(Math.toIntExact(il.varint()))
              while (packed.hasMore) vs += packed.varint()
            } else if ((t >> 3).toInt == 1 && (t & 7) == 0) vs += il.varint()
            else il.skip((t & 7).toInt)
          }
          out = Int64V(vs.result())
        case (_, w) => in.skip(w)
      }
    }
    if (out == null) throw new java.io.IOException("empty Feature")
    out
  }

  def decodeExample(bytes: Array[Byte]): Map[String, FeatureValue] = {
    val ex = new ProtoIn(bytes, 0, bytes.length)
    val out = Map.newBuilder[String, FeatureValue]
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >> 3).toInt == 1 && (tag & 7) == 2) { // Example.features
        val fs = ex.slice(Math.toIntExact(ex.varint()))
        while (fs.hasMore) {
          val ft = fs.varint()
          if ((ft >> 3).toInt == 1 && (ft & 7) == 2) { // map entry
            val entry = fs.slice(Math.toIntExact(fs.varint()))
            var key: String = null
            var value: FeatureValue = null
            while (entry.hasMore) {
              val et = entry.varint()
              ((et >> 3).toInt, (et & 7).toInt) match {
                case (1, 2) =>
                  key = new String(entry.sliceBytes(Math.toIntExact(entry.varint())),
                    StandardCharsets.UTF_8)
                case (2, 2) =>
                  value = decodeFeature(entry.slice(Math.toIntExact(entry.varint())))
                case (_, w) => entry.skip(w)
              }
            }
            if (key != null && value != null) out += key -> value
          } else fs.skip((ft & 7).toInt)
        }
      } else ex.skip((tag & 7).toInt)
    }
    out.result()
  }

  // ---------------------------------------------------- corpus export

  private val docSchema = StructType(Seq(
    StructField("shard", LongType),
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Export the corpus as `n` TFRecord shard files
    * (`shard=<k>/part-<k>.tfrecord`), one Example per document with
    * features (sorted keys) `doc_id`/`n_chars` int64, `lang`/`source`/
    * `text` bytes. */
  def tfrecordShards(docs: DataFrame, dir: String, n: Int): Unit = {
    val out = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(out)
    val existing = java.nio.file.Files.list(out)
    try existing.iterator().asScala.toList
      .filter(_.getFileName.toString.startsWith("shard="))
      .foreach(deleteRecursively)
    finally existing.close()

    Sampling.assignShards(docs.select("doc_id", "text", "lang", "source", "n_chars"), n)
      .repartition(n, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .foreachPartition { (it: Iterator[Row]) => writeShardPartition(dir, it) }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val children = java.nio.file.Files.list(p)
      try children.forEach(deleteRecursively(_)) finally children.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }

  private def writeShardPartition(dir: String, it: Iterator[Row]): Unit = {
    var shard = -1L
    var fileOut: OutputStream = null
    var tmp: java.nio.file.Path = null
    var finalPath: java.nio.file.Path = null
    def closeCurrent(): Unit = if (fileOut != null) {
      fileOut.close(); fileOut = null
      java.nio.file.Files.move(tmp, finalPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    }
    try {
      it.foreach { row =>
        val s = row.getAs[Long]("shard")
        if (s != shard) {
          closeCurrent()
          shard = s
          val shardDir = java.nio.file.Paths.get(dir, s"shard=$s")
          java.nio.file.Files.createDirectories(shardDir)
          tmp = shardDir.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
          finalPath = shardDir.resolve(s"part-$s.tfrecord")
          fileOut = new BufferedOutputStream(
            java.nio.file.Files.newOutputStream(tmp), 256 * 1024)
        }
        val ex = encodeExample(Seq(
          "doc_id" -> Int64V(Seq(row.getAs[Long]("doc_id"))),
          "lang" -> BytesV(Seq(row.getAs[String]("lang").getBytes(StandardCharsets.UTF_8))),
          "n_chars" -> Int64V(Seq(row.getAs[Long]("n_chars"))),
          "source" -> BytesV(Seq(row.getAs[String]("source").getBytes(StandardCharsets.UTF_8))),
          "text" -> BytesV(Seq(row.getAs[String]("text").getBytes(StandardCharsets.UTF_8)))))
        writeFramed(fileOut, ex)
      }
      closeCurrent()
    } finally {
      if (fileOut != null) { try fileOut.close() catch { case _: Throwable => } }
      if (tmp != null) { java.nio.file.Files.deleteIfExists(tmp); () }
    }
  }

  /** Read a [[tfrecordShards]] export back: shard files distribute over
    * tasks (file-granular, like every TFRecord consumer — shard count is
    * chosen as writer/loader parallelism), each streamed record by
    * record with CRC checks. */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Paths.get(dir)
    val listing = java.nio.file.Files.list(root)
    val files: Seq[(Long, String)] =
      try listing.iterator().asScala.toList
        .filter(_.getFileName.toString.startsWith("shard="))
        .map { d =>
          val shard = d.getFileName.toString.stripPrefix("shard=").toLong
          shard -> d.resolve(s"part-$shard.tfrecord").toString
        }.sortBy(_._1)
      finally listing.close()
    val ds = spark.createDataset(files)(
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .repartition(Math.max(files.size, 1))
    ds.mapPartitions { it =>
      it.flatMap { case (shard, path) =>
        readFramed(java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)),
            source = path)
          .map { bytes =>
            val f = decodeExample(bytes)
            def str(k: String) = new String(
              f(k).asInstanceOf[BytesV].vs.head, StandardCharsets.UTF_8)
            def i64(k: String) = f(k).asInstanceOf[Int64V].vs.head
            Row(shard, i64("doc_id"), str("text"), str("lang"), str("source"),
              i64("n_chars"))
          }
      }
    }(Encoders.row(docSchema))
  }
}
