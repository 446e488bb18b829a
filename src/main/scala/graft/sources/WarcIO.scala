package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** WARC (ISO 28500) record framing — the container format of Common Crawl
  * and every web-archive corpus, i.e. the FIRST input format a web-scale
  * training-data pipeline reads. This object holds the engine-neutral
  * byte-level parser and writer; the Spark DataSource V2 surface that
  * plans distributed scans over it lives in [[WarcSource]].
  *
  * Format recap (public spec, ISO 28500 / WARC 1.1): a record is a header
  * block of `Name: value` lines starting with a `WARC/1.x` version line
  * and terminated by an empty line, followed by exactly `Content-Length`
  * payload bytes, followed by two CRLFs. Common Crawl stores each record
  * as its OWN gzip member, members concatenated into a `.warc.gz` file —
  * the writer here emits exactly that layout (so real CC tooling can read
  * our output and skip records without inflating predecessors), and the
  * reader inflates member-concatenated gzip transparently
  * (`GZIPInputStream` consumes successive members).
  */
object WarcIO {

  /** One parsed record. `payload` is null when the scan pruned it. */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      contentLength: Long,
      headers: Map[String, String],
      payload: Array[Byte])

  private val CRLF = "\r\n".getBytes(StandardCharsets.US_ASCII)

  // ------------------------------------------------------------- parser

  /** Stream the records of one WARC file. `keepPayload=false` reads
    * through the payload bytes without retaining them (for header-only
    * scans — the DSv2 column pruning path): on a plain `.warc` stream the
    * bytes are `skip`ped outright; on gzip they still inflate (gzip has
    * no random access within a member) but are discarded buffer-by-buffer
    * instead of accumulated, so a header scan of a payload-heavy corpus
    * allocates O(buffer), not O(record).
    *
    * The iterator owns `in` and closes it at EOF or on parse failure. A
    * truncated record raises EOFException with the record context —
    * archive integrity errors must surface, not silently shorten the
    * corpus. */
  def readRecords(in: InputStream, gz: Boolean, keepPayload: Boolean = true,
      source: String = "<stream>"): Iterator[WarcRecord] = {
    val raw = new BufferedInputStream(if (gz) new GZIPInputStream(in, 64 * 1024) else in, 64 * 1024)
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def readLine(): String = {
        // header lines are US-ASCII per spec; values may carry UTF-8 —
        // decode as UTF-8 which is a superset for our purposes
        val buf = new java.io.ByteArrayOutputStream(128)
        var b = raw.read()
        while (b != -1 && b != '\n') { buf.write(b); b = raw.read() }
        if (b == -1 && buf.size() == 0) null
        else {
          val bytes = buf.toByteArray
          val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
          new String(bytes, 0, n, StandardCharsets.UTF_8)
        }
      }

      private def advance(): Unit = {
        if (done) return
        // skip inter-record blank lines (real archives occasionally pad)
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { done = true; raw.close(); return }
        if (!line.startsWith("WARC/"))
          throw new java.io.IOException(
            s"$source: expected WARC version line, got '${line.take(60)}'")
        var headers = Map.newBuilder[String, String]
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) headers += h.substring(0, i).trim -> h.substring(i + 1).trim
          h = readLine()
        }
        if (h == null) throw new EOFException(s"$source: EOF inside record header block")
        val hm = headers.result()
        val len = hm.getOrElse("Content-Length",
          throw new java.io.IOException(s"$source: record missing Content-Length")).toLong
        val payload =
          if (keepPayload) {
            val a = new Array[Byte](Math.toIntExact(len))
            var off = 0
            while (off < a.length) {
              val r = raw.read(a, off, a.length - off)
              if (r < 0) throw new EOFException(
                s"$source: EOF at payload byte $off of $len")
              off += r
            }
            a
          } else {
            var remaining = len
            val scratch = new Array[Byte](8192)
            while (remaining > 0) {
              val r = raw.read(scratch, 0, Math.min(scratch.length.toLong, remaining).toInt)
              if (r < 0) throw new EOFException(
                s"$source: EOF with $remaining payload bytes unread of $len")
              remaining -= r
            }
            null
          }
        nextRec = WarcRecord(
          hm.getOrElse("WARC-Type", ""),
          hm.getOrElse("WARC-Record-ID", ""),
          hm.getOrElse("WARC-Target-URI", ""),
          hm.getOrElse("WARC-Date", ""),
          hm.getOrElse("Content-Type", ""),
          len, hm, payload)
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) {
          try advance()
          catch { case e: Throwable => try raw.close() catch { case _: Throwable => }; throw e }
        }
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  // ------------------------------------------------------------- writer

  /** Render one record in WARC/1.1 framing to `out`. `extraHeaders` lets
    * the caller attach spec'd extension headers (e.g. the Common-Crawl
    * `WARC-Identified-Content-Language`). */
  def writeRecord(out: OutputStream, warcType: String, recordId: String,
      targetUri: String, warcDate: String, contentType: String,
      payload: Array[Byte], extraHeaders: Seq[(String, String)] = Nil): Unit = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.1\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    sb.append("WARC-Record-ID: ").append(recordId).append("\r\n")
    sb.append("WARC-Date: ").append(warcDate).append("\r\n")
    if (targetUri.nonEmpty) sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    out.write(CRLF); out.write(CRLF)
  }

  /** A gzip member per record (the Common Crawl `.warc.gz` layout): each
    * record deflates independently so an indexed reader can seek to a
    * member offset and inflate just that record. */
  def writeRecordGz(fileOut: OutputStream, warcType: String, recordId: String,
      targetUri: String, warcDate: String, contentType: String,
      payload: Array[Byte], extraHeaders: Seq[(String, String)] = Nil): Unit = {
    val member = new GZIPOutputStream(new FilterNoClose(fileOut), 64 * 1024)
    writeRecord(member, warcType, recordId, targetUri, warcDate, contentType,
      payload, extraHeaders)
    member.finish()
  }

  /** Pass-through that ignores close() — GZIPOutputStream.finish+close
    * must not tear down the shared file stream between members. */
  private final class FilterNoClose(out: OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    override def close(): Unit = flush()
  }

  // ---------------------------------------------------- corpus export

  /** Export a curated corpus as `n` Common-Crawl-layout `.warc.gz` shard
    * files under `dir` (`shard=<k>/part-<k>.warc.gz`). One `conversion`
    * record per document: the text is the payload, `doc_id` and `source`
    * ride the target URI (`graft://<source>/<doc_id>`), `lang` rides the
    * standard `WARC-Identified-Content-Language` header — so the export
    * is honest WARC that external archive tooling reads, not JSON in a
    * trenchcoat, and [[WarcSource]] restores every field losslessly.
    *
    * Scale shape mirrors [[graft.ops.Export.jsonlShards]]: the balanced
    * shard assignment is the two-phase prefix-sum rank, the exchange is
    * one repartition on `shard`, each file is written by the one task
    * owning its partition after an in-partition `doc_id` sort (byte-
    * determinism: record order, IDs, and dates are all functions of the
    * row), staged to a tmp name and atomically renamed so a speculative
    * duplicate attempt cannot interleave bytes. */
  def warcShards(docs: DataFrame, dir: String, n: Int): Unit = {
    val out = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(out)
    // overwrite semantics: stale shard dirs must not merge into this export
    val existing = java.nio.file.Files.list(out)
    try existing.iterator().asScala.toList
      .filter(_.getFileName.toString.startsWith("shard="))
      .foreach(deleteRecursively)
    finally existing.close()

    Sampling.assignShards(docs.select("doc_id", "text", "lang", "source"), n)
      .repartition(n, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        writeShardPartition(dir, it)
      }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p)) {
      val children = java.nio.file.Files.list(p)
      try children.forEach(deleteRecursively(_)) finally children.close()
    }
    java.nio.file.Files.deleteIfExists(p)
    ()
  }

  private def writeShardPartition(dir: String,
      it: Iterator[org.apache.spark.sql.Row]): Unit = {
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
          finalPath = shardDir.resolve(s"part-$s.warc.gz")
          fileOut = new BufferedOutputStream(
            java.nio.file.Files.newOutputStream(tmp), 256 * 1024)
        }
        val docId = row.getAs[Long]("doc_id")
        val text = row.getAs[String]("text")
        val lang = row.getAs[String]("lang")
        val source = row.getAs[String]("source")
        // deterministic record id: a UUID literally derived from the doc
        val rid = s"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(s"graft-doc-$docId".getBytes(StandardCharsets.UTF_8))}>"
        writeRecordGz(fileOut, "conversion", rid,
          s"graft://$source/$docId", "2026-01-01T00:00:00Z",
          "text/plain; charset=UTF-8",
          text.getBytes(StandardCharsets.UTF_8),
          Seq("WARC-Identified-Content-Language" -> lang))
      }
      closeCurrent()
    } finally {
      if (fileOut != null) { try fileOut.close() catch { case _: Throwable => } }
      if (tmp != null) { java.nio.file.Files.deleteIfExists(tmp); () }
    }
  }
}
