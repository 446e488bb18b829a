package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Token-binary export internals (the oracled export_tokenbin_roundtrip
  * query proves the end-to-end roundtrip; this spec pins the byte-level
  * format contract and the edge cases). */
class ExportSpec extends SparkSuite {
  import spark.implicits._

  private val merges = Seq(("t", "a"), ("s", "c"))

  test("token-binary format: vocab ids, contiguous offsets, 20-byte " +
      "index records, empty-document records") {
    val docs = Seq(
      (1L, "table scan table"),
      (2L, "12345 !!!"), // no alpha tokens -> zero-length token record
      (3L, "scan data")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-tb").toString
    Export.tokenBinShards(docs, merges, dir, n = 2)

    val vocab = new String(Files.readAllBytes(Paths.get(dir, "vocab.txt")),
      "UTF-8").split("\n", -1).dropRight(1)
    assert(vocab.toSeq === vocab.toSeq.sorted, "vocab must be sorted")
    assert(vocab.toSet.contains("ta"), "merged subword must be in vocab")

    // every shard: idx is k*20 bytes, bin is (sum n_tokens)*4 bytes,
    // offsets are the exact running sum
    val shardDirs = Files.list(Paths.get(dir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val idx = java.nio.ByteBuffer.wrap(
        Files.readAllBytes(d.resolve("index.idx")))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(idx.capacity() % 20 === 0)
      var expectOff = 0L
      var total = 0L
      while (idx.remaining() >= 20) {
        idx.getLong // doc_id
        assert(idx.getLong === expectOff, "offsets must be contiguous")
        val n = idx.getInt
        expectOff += n
        total += n
      }
      assert(Files.size(d.resolve("data.bin")) === total * 4)
    }

    // roundtrip covers the empty-token document too
    val back = Export.readBackTokens(spark, dir)
    assert(back.count() === 3L)
    assert(back.filter($"doc_id" === 2L)
      .select(size($"subs")).as[Int].head() === 0)
    assert(back.filter($"doc_id" === 1L)
      .select($"subs").as[Seq[String]].head() ===
      Seq("ta", "b", "l", "e", "sc", "a", "n", "ta", "b", "l", "e"))
  }

  test("re-export overwrites stale shards; partial exports are refused") {
    val docs = (1L to 30L).map(i => (i, s"table scan data q${i % 5}"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-tb3").toString
    Export.tokenBinShards(docs, merges, dir, n = 6)
    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    // narrower re-export into the same dir: old shard=4..5 must be gone
    Export.tokenBinShards(docs, merges, dir, n = 2)
    val shardDirs = Files.list(Paths.get(dir)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.startsWith("shard=")).toSet
    assert(shardDirs === Set("shard=0", "shard=1"),
      s"stale shards survived the re-export: $shardDirs")
    assert(Export.readBackTokens(spark, dir).count() === 30L)
    // a dir without the completion marker reads as an error, not as a
    // silently truncated corpus
    Files.delete(Paths.get(dir, "_SUCCESS"))
    intercept[IllegalArgumentException] {
      Export.readBackTokens(spark, dir)
    }
  }

  test("export is deterministic: same corpus, byte-identical shards") {
    val docs = (1L to 40L).map(i => (i, s"table scan data value q${i % 5}"))
      .toDF("doc_id", "text")
    def export(): Map[String, Seq[Byte]] = {
      val dir = Files.createTempDirectory("graft-tb2").toString
      Export.tokenBinShards(docs, merges, dir, n = 4)
      Files.walk(Paths.get(dir)).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .filter(Files.isRegularFile(_))
        .map(p => Paths.get(dir).relativize(p).toString ->
          Files.readAllBytes(p).toSeq)
        .toMap
    }
    assert(export() === export())
  }
}
