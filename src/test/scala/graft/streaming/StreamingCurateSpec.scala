package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.AtomicTable
import graft.ops.DedupIndex

/** End-to-end streaming curated ingest: quality gate → in-batch dedup
  * (exact + near-dup) → cross-batch near-dup via the persistent MinHash
  * index → exactly-once commit to corpus + index. Multi-batch execution
  * is forced (one file per trigger) so the cross-batch and replay
  * semantics actually run. */
class StreamingCurateSpec extends SparkSuite {

  // ≥10 tokens, ≥2 registry stopwords (the/and), all-alpha → passes the
  // shared Gopher gate
  private val passageA = "the quick brown fox and the lazy dog run over " +
    "green hills while morning light settles on quiet fields"
  private val passageAEdit = "the quick brown fox and the lazy dog run over " +
    "green hills while morning light settles on quiet meadows"
  // one word from passageAEdit (hills→slopes), TWO words from passageA —
  // near-dup of AEdit but below the 0.5 Jaccard threshold against A
  private val passageAEdit2 = "the quick brown fox and the lazy dog run over " +
    "green slopes while morning light settles on quiet meadows"
  private val passageB = "a gentle stream winds and turns through the deep " +
    "forest carrying cold clear water past mossy stones today"
  private val passageC = "the old library holds many rare books and scrolls " +
    "that scholars travel great distances to read carefully"

  private def jsonLine(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "source": "s"}"""

  private def freshDirs(): (Path, String, String, String) = {
    val base = Files.createTempDirectory("graft-curate")
    (base.resolve("staging"), s"$base/corpus", s"$base/index", s"$base/ckpt")
  }

  private def corpusSchema = org.apache.spark.sql.types.StructType(
    Streams.documentsSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("batch_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("commit_part",
        org.apache.spark.sql.types.StringType)))

  private def corpusIds(corpus: String): Set[Long] =
    AtomicTable.read(spark, corpus, corpusSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("curated ingest: gate, in-batch dedup, cross-batch dedup via index") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    // batch 1: d1 unique; d2 exact dup of d1; d3 near-dup of d1;
    // d4 fails the quality gate; d5 unique
    Files.writeString(staging.resolve("f1.json"), Seq(
      jsonLine(1, passageA),
      jsonLine(2, passageA),
      jsonLine(3, passageAEdit),
      jsonLine(4, "x"),
      jsonLine(5, passageB)).mkString("", "\n", "\n"))
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    assert(corpusIds(corpus) === Set(1L, 5L))

    // batch 2 (same checkpoint — only the new file is processed):
    // d6 near-dups batch 1's d1 and must be caught by the INDEX, not by
    // any rescan of batch 1's text; d7 is new
    Files.writeString(staging.resolve("f2.json"), Seq(
      jsonLine(6, passageAEdit),
      jsonLine(7, passageC)).mkString("", "\n", "\n"))
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    assert(corpusIds(corpus) === Set(1L, 5L, 7L))

    // the index carries one signature per CONTENT CLASS seen: corpus
    // keepers plus in-batch near-dup variants (d3), but NOT docs that
    // matched the index (d6 — its class is already covered by d1/d3)
    val sigIds = AtomicTable.read(spark, s"$index/sigs", DedupIndex.sigSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds === Set(1L, 3L, 5L, 7L))

    // the per-batch funnel stats commit atomically with the corpus:
    // batch 2 was {d6: index dup, d7: committed}
    val stats = AtomicTable.manifest(java.nio.file.Paths.get(corpus))
      .flatMap(_.properties.get("last_batch_stats")).get
    assert(stats ===
      """{"in":2,"gated":0,"exact_dropped":0,"index_dropped":1,""" +
        """"neardup_dropped":0,"committed":1}""")
  }

  test("a committed document redelivered in a LATER batch is rejected " +
      "by its old index signature, not readmitted") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("f1.json"),
      jsonLine(1, passageA) + "\n")
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    assert(corpusIds(corpus) === Set(1L))
    // the at-least-once source redelivers doc 1 under a NEW batch id —
    // the last_batch_id guard passes, so only the index can stop it.
    // (Before the tag-granular exclusion, the match was discarded because
    // idx_id 1 appeared in the batch, and the corpus got a second copy.)
    import spark.implicits._
    val redelivered = Seq((1L, passageA, "s")).toDF("doc_id", "text", "source")
    Streams.curateBatch(corpus, index)(redelivered, batchId = 7L)
    val copies = AtomicTable.read(spark, corpus, corpusSchema)
      .filter(col("doc_id") === 1L).count()
    assert(copies === 1L)
  }

  test("consolidateCorpus folds old commit tags; data, provenance, and " +
      "later batches are unaffected") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("f1.json"), jsonLine(1, passageA) + "\n")
    Files.writeString(staging.resolve("f2.json"), jsonLine(2, passageB) + "\n")
    Files.writeString(staging.resolve("f3.json"), jsonLine(3, passageC) + "\n")
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    assert(corpusIds(corpus) === Set(1L, 2L, 3L))

    Streams.consolidateCorpus(spark, corpus, keepRecent = 1)
    graft.ops.DedupIndex.consolidate(spark, index, keepRecent = 1)
    val root = java.nio.file.Paths.get(corpus)
    val parts = AtomicTable.manifest(root).get.partitions.keySet
    assert(parts.size === 2 && parts.contains(graft.ops.DedupIndex.BaseTag),
      s"expected base + newest tag, got $parts")
    // rows, per-row batch provenance, and dedup behavior all survive
    val rows = AtomicTable.read(spark, corpus, corpusSchema)
      .select("doc_id", "batch_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // a post-consolidation batch still dedups against folded content
    val passageD = "mountain winds carry the scent of pine and cedar " +
      "across the quiet valley where tired shepherds rest today"
    Files.writeString(staging.resolve("f4.json"),
      Seq(jsonLine(4, passageA), jsonLine(5, passageD)).mkString("", "\n", "\n"))
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    assert(corpusIds(corpus) === Set(1L, 2L, 3L, 5L),
      "exact redelivery of folded doc 1 must still be rejected")
  }

  test("near-dup CHAIN a~b~c keeps one cluster keeper, and a later copy " +
      "of the far end still matches the index") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    // 10~11 and 11~12 are near-dups (one word apart); 10 and 12 are two
    // words apart — below the 0.5 Jaccard threshold, no direct pair
    Files.writeString(staging.resolve("f1.json"), Seq(
      jsonLine(10, passageA),
      jsonLine(11, passageAEdit),
      jsonLine(12, passageAEdit2)).mkString("", "\n", "\n"))
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    // one keeper per CLUSTER (min id), both variants dropped
    assert(corpusIds(corpus) === Set(10L))
    // ...but the dropped variants' signatures ARE indexed, so a later
    // copy of 12's content (which is NOT within threshold of keeper 10)
    // still matches and is rejected
    Files.writeString(staging.resolve("f2.json"),
      jsonLine(13, passageAEdit2) + "\n")
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    assert(corpusIds(corpus) === Set(10L))
  }

  test("deployment form: always-on ProcessingTime trigger under RocksDB " +
      "state config, executor storage stays flat across >= 5 batches") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    // six single-file batches: two unique docs, then four that must be
    // deduped against the corpus through the index, batch after batch
    Files.writeString(staging.resolve("f1.json"), jsonLine(1, passageA) + "\n")
    Files.writeString(staging.resolve("f2.json"), jsonLine(2, passageB) + "\n")
    Files.writeString(staging.resolve("f3.json"), jsonLine(3, passageA) + "\n")
    Files.writeString(staging.resolve("f4.json"), jsonLine(4, passageAEdit) + "\n")
    Files.writeString(staging.resolve("f5.json"), jsonLine(5, passageB) + "\n")
    Files.writeString(staging.resolve("f6.json"), jsonLine(6, passageC) + "\n")
    Streams.withRocksDbState(spark) {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      val q = Streams.curatedIngestProcessingTime(spark, staging.toString,
        corpus, index, ckpt, intervalMs = 50L)
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (corpusIds(corpus) != Set(1L, 2L, 6L) &&
            System.nanoTime() < deadline) Thread.sleep(200)
      } finally q.stop()
    }
    assert(corpusIds(corpus) === Set(1L, 2L, 6L))
    // >= 6 batches ran (one per file); a seventh file keeps flowing
    // through the SAME running shape on restart from the checkpoint
    assert(AtomicTable.manifest(java.nio.file.Paths.get(corpus))
      .flatMap(_.properties.get("last_batch_id")).map(_.toLong).exists(_ >= 5L))
    // bounded storage: the per-batch clearCache plus the ContextCleaner
    // must not let cached plans / checkpoint blocks accumulate per batch
    // (~4 localCheckpoints per batch x 6 batches would show ~24 RDDs)
    assert(spark.sharedState.cacheManager.isEmpty,
      "catalog cache must be empty after every batch")
    val deadline2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var nRdds = Int.MaxValue
    while (nRdds > 8 && System.nanoTime() < deadline2) {
      System.gc()
      Thread.sleep(500)
      nRdds = spark.sparkContext.getRDDStorageInfo.length
    }
    assert(nRdds <= 8,
      s"executor storage grew with batch count: $nRdds cached RDDs")
  }

  test("replayed batch at or below last_batch_id is a no-op") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("f1.json"),
      jsonLine(1, passageA) + "\n")
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    val vBefore = AtomicTable.manifest(java.nio.file.Paths.get(corpus))
      .map(_.version)
    import spark.implicits._
    val replay = Seq((1L, passageA, "s")).toDF("doc_id", "text", "source")
    Streams.curateBatch(corpus, index)(replay, batchId = 0L)
    assert(AtomicTable.manifest(java.nio.file.Paths.get(corpus))
      .map(_.version) === vBefore)
    assert(corpusIds(corpus) === Set(1L))
  }

  test("replay after a crash between index append and corpus commit " +
      "does not drop the batch as a self-duplicate") {
    val (staging, corpus, index, ckpt) = freshDirs()
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("f1.json"),
      jsonLine(1, passageA) + "\n")
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)
    // simulate the torn state: batch 1's index partition committed, but
    // the corpus commit (and its last_batch_id advance) never happened
    import spark.implicits._
    val batch = Seq((8L, passageC, "s")).toDF("doc_id", "text", "source")
    DedupIndex.append(index, batch, ingest = "b000001")
    // the replay must match the index WITHOUT treating its own
    // signatures as an existing duplicate
    Streams.curateBatch(corpus, index)(batch, batchId = 1L)
    assert(corpusIds(corpus) === Set(1L, 8L))
    // and the index partition was replaced, not duplicated
    val sigRows = AtomicTable.read(spark, s"$index/sigs", DedupIndex.sigSchema)
      .filter(col("doc_id") === 8L).count()
    assert(sigRows === 1L)
  }
}
