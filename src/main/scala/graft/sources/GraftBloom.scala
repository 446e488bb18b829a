package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64

/** Per-data-file BLOOM FILTERS for point lookups on UNCLUSTERED
  * columns — the skipping zone maps cannot do: a [min, max] range over
  * a column the layout does not sort admits every file, while a bloom
  * refutes membership file by file (Delta's bloom filter index / the
  * role of Iceberg's puffin blobs).
  *
  * Layout: the writer task drops one small sidecar per (data file,
  * bloom column) NEXT to the file — `<file>.<col>.bloom` inside the
  * immutable staged dir — so the index travels with the data through
  * commit, restore, rollback, and GC with no manifest growth (a 100 TB
  * table's manifest stays metadata-sized; sidecars are read lazily and
  * only for partitions the zone maps already admitted). A missing
  * sidecar simply never skips.
  *
  * Encoding: values are hashed in their ZONE-MAP STRING rendering (the
  * one encoding the writer, the pushed-filter prober, and the runtime
  * filter all share), double-hashed xxh64 into a fixed 8 KiB bitset
  * with 5 probes — ~0.1% false positives at ~5k distinct values per
  * file, and a false positive only costs reading a file that zone maps
  * admitted anyway. */
object GraftBloom {

  /** Sidecar bytes: 8 KiB bitset. */
  val Bits: Int = 8 * 1024 * 8
  val Probes: Int = 5

  /** Sidecar file name of a data file's bloom for `col`. */
  def sidecarName(dataFile: String, col: String): String =
    s"$dataFile.$col.bloom"

  private def hashes(rendered: String): (Long, Long) = {
    val b = rendered.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      b.length, 0x9747b28cL),
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 0x5bd1e995L))
  }

  /** Mutable single-file builder (one writer task, one file). */
  final class Builder {
    private val bits = new Array[Long](Bits / 64)
    def add(rendered: String): Unit = {
      val (h1, h2) = hashes(rendered)
      var i = 0
      while (i < Probes) {
        val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
        bits(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      bits.foreach(bb.putLong)
      bb.array()
    }
  }

  /** Set `rendered`'s bits directly in sidecar-encoded bytes — the SAME
    * layout [[Builder.toBytes]] produces (big-endian longs), asserted
    * equal by GraftBloomSpec, so distributed rebuilds and writer-task
    * builds are interchangeable. */
  def addToBytes(bits: Array[Byte], rendered: String): Unit = {
    val (h1, h2) = hashes(rendered)
    var i = 0
    while (i < Probes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      val k = pos & 63
      val byteIdx = (pos >> 6) * 8 + 7 - (k >> 3)
      bits(byteIdx) = (bits(byteIdx) | (1 << (k & 7))).toByte
      i += 1
    }
  }

  /** Per-file bloom as a SQL aggregate over the value's string
    * rendering — what lets a REWRITE (clustered compaction, spec
    * evolution) rebuild its output files' sidecars with one grouped
    * aggregation over the staged bytes instead of losing the index.
    * Bounded: the result is one 8 KiB buffer per (file, column). */
  def aggregator: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new org.apache.spark.sql.expressions.Aggregator[
        String, Array[Byte], Array[Byte]] {
        def zero: Array[Byte] = new Array[Byte](Bits / 8)
        def reduce(b: Array[Byte], a: String): Array[Byte] = {
          if (a != null) addToBytes(b, a); b
        }
        def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
          var i = 0
          while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
          x
        }
        def finish(b: Array[Byte]): Array[Byte] = b
        def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
        def outputEncoder = org.apache.spark.sql.Encoders.BINARY
      }, org.apache.spark.sql.Encoders.STRING)

  /** Membership probe against sidecar bytes: false = DEFINITELY absent
    * (the file may be skipped), true = possibly present (must read). */
  def mightContain(bloom: Array[Byte], rendered: String): Boolean = {
    if (bloom.length * 8 != Bits) return true // unknown layout: never skip
    val bb = java.nio.ByteBuffer.wrap(bloom)
    val (h1, h2) = hashes(rendered)
    var i = 0
    while (i < Probes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, Bits).toInt
      if ((bb.getLong((pos >> 6) * 8) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  // sidecars are immutable once committed (they live in immutable data
  // dirs), so a small process-wide cache makes repeated planning passes
  // metadata-cheap; misses (absent sidecars) are cached too
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Array[Byte]]]()
  private val MaxCached = 4096

  // ------------------------------------------------------ dir bundles
  //
  // On object-store media (10-50 ms/GET) a one-sidecar-per-file probe
  // is a scale-killer: a 10k-file point lookup pays 10k sequential GETs
  // of 8 KiB each at PLANNING time. The commit therefore folds each
  // staged dir's sidecars into ONE offset-indexed bundle file (the
  // Iceberg-puffin shape), and the probe loads one bundle per admitted
  // DIR instead of one sidecar per admitted file — planning cost is
  // bounded by the commit structure, not the file count. Per-file
  // sidecars stay the write-side format (task-local, no coordination);
  // the bundle is derived, and a probe that misses the bundle (or a key
  // inside it — e.g. a backfilled column newer than the fold) falls
  // back to the per-file read, so skipping NEVER depends on the bundle.

  /** Bundle file name inside a data dir. Leading underscore: never
    * matches the `.parquet` data listing or the `.bloom` fold listing. */
  val BundleName = "_blooms.bundle"
  private val BundleMagic = 0x47424C42 // "GBLB"

  /** Test/scale hook: simulated latency per remote READ (ms) — models
    * object-store GET round-trips in BloomProbeBench. Applied once per
    * sidecar read and once per bundle read. Off (0) in production. */
  @volatile var simulatedReadDelayMs: Long = 0L
  private def simDelay(): Unit = {
    val d = simulatedReadDelayMs
    if (d > 0L) Thread.sleep(d)
  }

  /** Fold every per-file sidecar in `dir` into one bundle file —
    * called by the committing driver for each staged dir (and by bloom
    * rebuilds/backfills after re-writing sidecars). Layout: magic,
    * int32 index length, JSON index `{"<file>.<col>": [offset, len]}`
    * (offsets into the payload that follows), payload = concatenated
    * filter bytes. Returns the number of entries folded (0 = no
    * sidecars, no bundle written). */
  def writeBundle(dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    try {
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (!fs.exists(p)) return 0
      val sidecars = fs.listStatus(p)
        .filter(_.getPath.getName.endsWith(".bloom")).sortBy(_.getPath.getName)
      if (sidecars.isEmpty) return 0
      val entries = sidecars.map { st =>
        val in = fs.open(st.getPath)
        try {
          val n = st.getLen.toInt
          val buf = new Array[Byte](n)
          in.readFully(0L, buf)
          st.getPath.getName.stripSuffix(".bloom") -> buf
        } finally in.close()
      }
      // Jackson writes the index (not string concatenation): an entry
      // name — data-file name + column name — containing JSON
      // metacharacters must be ESCAPED, or a pathological name could
      // parse into in-range-but-wrong offsets and hand the probe the
      // wrong filter bytes (a silent false negative that skips files
      // holding the key)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val idxNode = mapper.createObjectNode()
      var off = 0
      entries.foreach { case (name, bytes) =>
        val arr = idxNode.putArray(name)
        arr.add(off); arr.add(bytes.length)
        off += bytes.length
      }
      val idxBytes = mapper.writeValueAsBytes(idxNode)
      val out = fs.create(new org.apache.hadoop.fs.Path(p, BundleName), true)
      try {
        val head = java.nio.ByteBuffer.allocate(8)
        head.putInt(BundleMagic).putInt(idxBytes.length)
        out.write(head.array())
        out.write(idxBytes)
        entries.foreach { case (_, b) => out.write(b) }
      } finally out.close()
      invalidateDir(dir)
      entries.length
    } catch { case _: java.io.IOException => 0 }
  }

  // dir path -> parsed bundle (None = dir has no bundle; cached too).
  // One entry holds the dir's full filter set (files x cols x 8 KiB) —
  // bounded by evicting wholesale at the byte cap, which repeated
  // planning refills at one READ per dir, the cost the bundle exists
  // to bound
  private val bundleCache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[Map[String, Array[Byte]]]]()
  private val MaxBundleBytes = 256L * 1024 * 1024
  private val bundleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  // guards every bundleCache MUTATION together with its bundleBytes
  // accounting: the unsynchronized put-then-add left a window where a
  // cap-triggered clear() between them stranded bytes for an entry no
  // longer cached, permanently inflating the counter and driving
  // repeated whole-cache clears (performance, never wrong results —
  // fixed per ADVICE r13). Loads stay OUTSIDE the lock.
  private val bundleLock = new Object

  /** Canonical cache key of a dir: local paths normalize to their
    * scheme-less form — the probe plans with the manifest's plain
    * paths while writer-side invalidation sees input_file_name's
    * `file:/...`-qualified form, and a key mismatch made writeBundle's
    * eviction silently miss (the probe then paid per-file reads until
    * restart). Non-local schemes keep their full URI: the authority
    * distinguishes buckets, and `getPath` alone would collide them. */
  private def bundleKey(dir: String): String = {
    val u = new org.apache.hadoop.fs.Path(dir).toUri
    if (u.getScheme == null || u.getScheme == "file") u.getPath
    else u.toString
  }

  /** Writer-side invalidation after a sidecar rebuild/backfill: drops
    * the dir's bundle entry (bytes-accounted) AND its per-file sidecar
    * entries, so the probe sees the rebuilt filters immediately. */
  private[graft] def invalidateDir(dir: String): Unit = {
    val nk = bundleKey(dir)
    bundleLock.synchronized {
      val removed = bundleCache.remove(nk)
      if (removed != null) removed.foreach(m => bundleBytes.addAndGet(
        -m.valuesIterator.map(_.length.toLong).sum))
    }
    val it = cache.keySet.iterator
    while (it.hasNext) {
      val k = it.next()
      val cut = k.lastIndexOf('#')
      if (cut > 0) {
        val parent = new org.apache.hadoop.fs.Path(
          k.substring(0, cut)).getParent
        if (parent != null && bundleKey(parent.toString) == nk) it.remove()
      }
    }
  }

  private def bundleOf(dir: String): Option[Map[String, Array[Byte]]] = {
    val key = bundleKey(dir)
    val hit = bundleCache.get(key)
    if (hit != null) return hit
    val p = new org.apache.hadoop.fs.Path(dir, BundleName)
    val loaded =
      try {
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        if (!fs.exists(p)) None
        else {
          simDelay() // ONE simulated GET per dir
          bundleReads.incrementAndGet()
          val in = fs.open(p)
          try {
            val n = fs.getFileStatus(p).getLen.toInt
            val buf = new Array[Byte](n)
            in.readFully(0L, buf)
            val bb = java.nio.ByteBuffer.wrap(buf)
            if (bb.getInt() != BundleMagic) None
            else {
              val idxLen = bb.getInt()
              val idx = new String(buf, 8, idxLen,
                java.nio.charset.StandardCharsets.UTF_8)
              val payloadStart = 8 + idxLen
              val node = new com.fasterxml.jackson.databind.ObjectMapper()
                .readTree(idx)
              val b = Map.newBuilder[String, Array[Byte]]
              var valid = true
              node.fields().forEachRemaining { e =>
                val off = e.getValue.get(0).asInt
                val len = e.getValue.get(1).asInt
                // explicit bounds check: copyOfRange ZERO-PADS past the
                // end, and a zero-padded filter answers "absent" for
                // every key — a truncated bundle would silently skip
                // files that hold the key. Out of range = the whole
                // bundle is corrupt; fall back to per-file sidecars.
                if (off < 0 || len <= 0 ||
                    payloadStart.toLong + off + len > buf.length)
                  valid = false
                else b += e.getKey -> java.util.Arrays.copyOfRange(
                  buf, payloadStart + off, payloadStart + off + len)
              }
              if (valid) Some(b.result()) else None
            }
          } finally in.close()
        }
      } catch {
        // NonFatal, not just IOException: a truncated or corrupt bundle
        // (bad index offsets, torn payload) must degrade to "no bundle"
        // — the per-file sidecars still answer, and a missing index
        // never loses rows, it only stops skipping
        case scala.util.control.NonFatal(_) => None
      }
    val entryBytes = loaded.map(
      _.valuesIterator.map(_.length.toLong).sum).getOrElse(0L)
    bundleLock.synchronized {
      val prev = bundleCache.get(key)
      if (prev != null) prev // a concurrent load won; ours is discarded
      else {
        if (bundleBytes.get() + entryBytes > MaxBundleBytes) {
          bundleCache.clear()
          bundleBytes.set(0L)
        }
        bundleCache.put(key, loaded)
        bundleBytes.addAndGet(entryBytes)
        loaded
      }
    }
  }

  /** The sidecar of `dataFile` (absolute, possibly scheme-qualified
    * path) for `col`, None when the write recorded none. Probes the
    * dir's BUNDLE first (one read per dir); a missing bundle or a key
    * the fold predates falls back to the per-file sidecar read. */
  def sidecarOf(dataFile: String, col: String): Option[Array[Byte]] = {
    val data = new org.apache.hadoop.fs.Path(dataFile)
    val entry = sidecarName(data.getName, col).stripSuffix(".bloom")
    bundleOf(data.getParent.toString).flatMap(_.get(entry)) match {
      case some @ Some(_) => return some
      case None => ()
    }
    val key = s"$dataFile#$col"
    val hit = cache.get(key)
    if (hit != null) return hit
    val p = new org.apache.hadoop.fs.Path(data.getParent,
      sidecarName(data.getName, col))
    val loaded =
      try {
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        if (!fs.exists(p)) None
        else {
          simDelay() // one simulated GET per (file, col)
          sidecarReads.incrementAndGet()
          val in = fs.open(p)
          try {
            val n = fs.getFileStatus(p).getLen.toInt
            val buf = new Array[Byte](n)
            in.readFully(0L, buf)
            Some(buf)
          } finally in.close()
        }
      } catch { case _: java.io.IOException => None }
    if (cache.size < MaxCached) cache.put(key, loaded)
    loaded
  }

  /** Test hook: drop both probe caches (bundle + per-sidecar). */
  private[graft] def clearCaches(): Unit = {
    cache.clear()
    bundleLock.synchronized {
      bundleCache.clear()
      bundleBytes.set(0L)
    }
  }

  /** Instrumentation: REMOTE reads performed (bundle loads + per-file
    * sidecar loads) — what an object store would bill as GETs. */
  private[graft] val bundleReads = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val sidecarReads = new java.util.concurrent.atomic.AtomicLong(0L)
}
