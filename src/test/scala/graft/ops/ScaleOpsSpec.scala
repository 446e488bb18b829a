package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Specs for the scale-lever operators: bloom join pruning, SCD2 interval
  * collapse, incremental aggregate maintenance, chunking, weighted
  * sampling. */
class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------- bloom

  test("bloom filter has no false negatives and actually prunes") {
    val keys = (0L until 500L).map(_ * 7L).toDF("k")
    val probe = (0L until 10000L).toDF("x")
    val words = BloomPrune.collectBloom(keys, "k", mBits = 1 << 16, k = 3)
    val kept = probe
      .filter(BloomPrune.mightContain(typedlit(words.toSeq), col("x"), 1 << 16, 3))
      .select("x").as[Long].collect().toSet
    // every true key < 10000 must pass (no false negatives)
    val trueKeys = (0L until 500L).map(_ * 7L).filter(_ < 10000L).toSet
    assert(trueKeys.subsetOf(kept))
    // and the filter must reject the bulk of the non-keys
    assert(kept.size < 3000, s"bloom kept ${kept.size} of 10000 — not pruning")
  }

  test("semiJoinPruned ≡ plain semi join on real tables") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val keys = orders.filter(col("o_totalprice") > 400000.0).select("o_orderkey")
    val pruned = BloomPrune.semiJoinPruned(li, keys, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect().toSet
    val plain = li.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  // -------------------------------------------------------------- scd2

  test("Scd2.intervals collapses runs and re-opens re-activated values") {
    val ev = Seq(
      // key 1: O,O,F,O -> three intervals, O re-activated
      (1L, "O", "2020-01-01", 1L),
      (1L, "O", "2020-02-01", 2L),
      (1L, "F", "2020-03-01", 3L),
      (1L, "O", "2020-04-01", 4L),
      // key 2: single run
      (2L, "F", "2020-01-15", 5L),
      (2L, "F", "2020-06-15", 6L))
      .toDF("k", "status", "d", "id")
      .withColumn("d", col("d").cast("date"))
    val out = Scd2.intervals(ev, "k", "status", "d", "id")
      .orderBy("k", "valid_from")
      .select("k", "status", "valid_from", "valid_to", "n_events", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        r.getDate(3).toString, r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "O", "2020-01-01", "2020-02-01", 2L, false),
      (1L, "F", "2020-03-01", "2020-03-01", 1L, false),
      (1L, "O", "2020-04-01", "2020-04-01", 1L, true),
      (2L, "F", "2020-01-15", "2020-06-15", 2L, true)))
  }

  // ----------------------------------------------------------- incragg

  test("IncrAgg state ⊕ delta == full recompute, bit-for-bit") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val keys = Seq("l_returnflag", "l_linestatus")
    val a = IncrAgg.state(li.filter(col("l_shipdate") < lit("1999-01-01")),
      keys, "l_extendedprice")
    val b = IncrAgg.state(li.filter(col("l_shipdate") >= lit("1999-01-01")),
      keys, "l_extendedprice")
    val merged = IncrAgg.merge(a.unionByName(b), keys)
      .orderBy(keys.map(col): _*).collect().toSeq
    val direct = IncrAgg.merge(IncrAgg.state(li, keys, "l_extendedprice"), keys)
      .orderBy(keys.map(col): _*).collect().toSeq
    assert(merged == direct)
    assert(merged.nonEmpty)
  }

  // ---------------------------------------------------------- chunking

  test("charChunks covers the document with the declared overlap") {
    val docs = Seq((1L, "abcdefgh"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = Chunking.charChunks(docs, size = 5, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, "abcde"), (1L, 1L, "defgh"), (1L, 2L, "gh"),
      (2L, 0L, "xy"),
      (3L, 0L, "")))
    // every character position is covered by at least one chunk
    val covered = out.filter(_._1 == 1L)
      .flatMap { case (_, i, c) => (i * 3) until (i * 3 + c.length) }.toSet
    assert(covered == (0 until 8).map(_.toLong).toSet)
  }

  // -------------------------------------------------------- dedup index

  test("DedupIndex: batch dedups against the index; appends are incremental and idempotent") {
    import java.nio.file.Paths
    val root = java.nio.file.Files.createTempDirectory("graft-idx").toString
    def doc(id: Long, text: String) = (id, text)
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val corpus = Seq(
      doc(1L, base + "alpha beta gamma delta"),
      doc(2L, "completely different content about spark plans " * 5),
      doc(3L, "a third unrelated document with its own words " * 5))
      .toDF("doc_id", "text")
    DedupIndex.append(root, corpus, ingest = "b0")

    // batch 1: near-copy of doc 1 + a novel doc
    val batch1 = Seq(
      doc(10L, base + "alpha beta gamma"), // near-dup of 1
      doc(11L, "entirely novel text that matches nothing at all " * 5))
      .toDF("doc_id", "text")
    val m1 = DedupIndex.matches(spark, root, batch1)
      .select("new_id", "idx_id").as[(Long, Long)].collect().toSet
    assert(m1.contains((10L, 1L)), s"near-dup of doc 1 not found: $m1")
    assert(!m1.exists(_._1 == 11L), s"novel doc must not match: $m1")

    // idempotent append: same tag twice -> same index size
    DedupIndex.append(root, batch1, ingest = "b1")
    val sigs = graft.etl.AtomicTable.read(spark, s"$root/sigs", DedupIndex.sigSchema)
    val n1 = sigs.count()
    DedupIndex.append(root, batch1, ingest = "b1")
    assert(graft.etl.AtomicTable.read(spark, s"$root/sigs", DedupIndex.sigSchema)
      .count() === n1)

    // incremental: batch 2 near-copies a BATCH-1 doc — only the index
    // (not any corpus rescan) can find it
    val batch2 = Seq(doc(20L, "entirely novel text that matches nothing at all " * 5))
      .toDF("doc_id", "text")
    val m2 = DedupIndex.matches(spark, root, batch2)
      .select("new_id", "idx_id").as[(Long, Long)].collect().toSet
    assert(m2.contains((20L, 11L)), s"match against batch-1 doc not found: $m2")
  }

  test("consolidation recency order is numeric — survives the zero-pad " +
      "overflow at batch 1,000,000") {
    val tags = Seq("b999999", "b1000000", DedupIndex.BaseTag, "b000005")
    assert(tags.sortBy(DedupIndex.tagOrder) ===
      Seq(DedupIndex.BaseTag, "b000005", "b999999", "b1000000"))
    intercept[IllegalArgumentException] {
      DedupIndex.consolidate(spark, "/nonexistent", keepRecent = 0)
    }
  }

  test("DedupIndex.consolidate folds old tags into one base partition " +
      "without changing match results") {
    import java.nio.file.Paths
    val root = java.nio.file.Files.createTempDirectory("graft-idxc").toString
    val mk = (id: Long, t: String) => (id, t)
    // five single-doc batches, each its own ingest tag
    for (i <- 0 until 5)
      DedupIndex.append(root,
        Seq(mk(i.toLong, s"distinct content number $i " +
          "with enough words to shingle properly " * 4)).toDF("doc_id", "text"),
        ingest = f"b$i%06d")
    val probe = Seq(mk(100L,
      "distinct content number 2 with enough words to shingle properly " +
        ("with enough words to shingle properly " * 3))).toDF("doc_id", "text")
    val before = DedupIndex.matches(spark, root, probe)
      .select("new_id", "idx_id").as[(Long, Long)].collect().toSet

    DedupIndex.consolidate(spark, root, keepRecent = 2)
    val m = graft.etl.AtomicTable.manifest(
      Paths.get(s"$root/sigs")).get
    assert(m.partitions.keySet ===
      Set(DedupIndex.BaseTag, "b000003", "b000004"))
    // identical rows, identical matches — only the partitioning changed
    assert(graft.etl.AtomicTable.read(spark, s"$root/sigs",
      DedupIndex.sigSchema).count() === 5L)
    val after = DedupIndex.matches(spark, root, probe)
      .select("new_id", "idx_id").as[(Long, Long)].collect().toSet
    assert(after === before)
    assert(after.exists(_._2 == 2L), s"probe must match folded doc 2: $after")

    // a second consolidation after more batches re-folds the SAME base
    // (one base forever, not one per run)
    DedupIndex.append(root,
      Seq(mk(7L, "yet another novel document body " * 6)).toDF("doc_id", "text"),
      ingest = "b000005")
    DedupIndex.consolidate(spark, root, keepRecent = 1)
    val m2 = graft.etl.AtomicTable.manifest(Paths.get(s"$root/sigs")).get
    assert(m2.partitions.keySet === Set(DedupIndex.BaseTag, "b000005"))
    assert(graft.etl.AtomicTable.read(spark, s"$root/sigs",
      DedupIndex.sigSchema).count() === 6L)
  }

  // ------------------------------------------------------------ layout

  test("clusterByZ tiles the key space into small per-partition boxes") {
    // full 256x256 grid, one row per cell
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("x"),
      (col("id") / 256).cast("long").as("y"))
    val clustered = Layout.clusterByZ(grid, "x", "y", n = 16, bits = 8)
    // clustering must not lose or duplicate rows
    assert(clustered.count() == 65536L)
    val boxes = Layout.boundingBoxes(clustered, "x", "y").collect()
    val area = boxes.map { r =>
      val (x0, x1) = (r.getAs[Long]("x_min"), r.getAs[Long]("x_max"))
      val (y0, y1) = (r.getAs[Long]("y_min"), r.getAs[Long]("y_max"))
      (x1 - x0 + 1) * (y1 - y0 + 1)
    }.sum
    // a hash layout gives every partition the ~full grid: area ≈ 16·65536.
    // z-range clustering keeps each partition inside a small rectangle —
    // perfectly aligned splits give exactly 65536 total; allow 3x for the
    // sampled range boundaries.
    assert(area < 200000L, s"z-order bounding-box area $area — no locality")
  }

  // ---------------------------------------------------- weighted sample

  test("weightedSample is deterministic and biased toward heavy rows") {
    val docs = (1L to 1000L)
      .map(i => (i, if (i <= 500) 1000L else 10L))
      .toDF("doc_id", "n_chars")
    val s1 = Sampling.weightedSample(docs, k = 100).select("doc_id")
      .as[Long].collect().toSeq
    val s2 = Sampling.weightedSample(docs, k = 100).select("doc_id")
      .as[Long].collect().toSeq
    assert(s1 == s2, "weighted sample must be deterministic")
    assert(s1.size == 100)
    val heavy = s1.count(_ <= 500)
    assert(heavy > 80, s"heavy rows (100x weight) got only $heavy/100 slots")
  }
}
