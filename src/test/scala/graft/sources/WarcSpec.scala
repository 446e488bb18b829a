package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** WARC container: byte-level framing (WarcIO) and the DSv2 scan surface
  * (WarcSource) — the Common Crawl ingest path. */
class WarcSpec extends SparkSuite {

  private def writeFixture(dir: java.nio.file.Path, name: String, gz: Boolean,
      recs: Seq[(String, String, String)]): Unit = {
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(dir.resolve(name)))
    try recs.foreach { case (uri, lang, text) =>
      val payload = text.getBytes("UTF-8")
      if (gz)
        WarcIO.writeRecordGz(out, "conversion", s"<urn:uuid:test-$uri>", uri,
          "2026-02-03T04:05:06Z", "text/plain; charset=UTF-8", payload,
          Seq("WARC-Identified-Content-Language" -> lang))
      else
        WarcIO.writeRecord(out, "conversion", s"<urn:uuid:test-$uri>", uri,
          "2026-02-03T04:05:06Z", "text/plain; charset=UTF-8", payload,
          Seq("WARC-Identified-Content-Language" -> lang))
    } finally out.close()
  }

  test("parser roundtrips plain and member-gzip records, UTF-8 payloads included") {
    val dir = Files.createTempDirectory("graft-warc")
    val recs = Seq(
      ("graft://web/1", "en", "hello archive"),
      ("graft://web/2", "de", "grüße — ünïcodé ü"),
      ("graft://web/3", "ja", "こんにちは"))
    for (gzFlag <- Seq(false, true)) {
      val name = if (gzFlag) "a.warc.gz" else "a.warc"
      writeFixture(dir, name, gzFlag, recs)
      val got = WarcIO.readRecords(Files.newInputStream(dir.resolve(name)),
        gz = gzFlag).toList
      assert(got.map(_.targetUri) === recs.map(_._1))
      assert(got.map(r => new String(r.payload, "UTF-8")) === recs.map(_._3))
      assert(got.map(_.headers("WARC-Identified-Content-Language")) === recs.map(_._2))
      assert(got.forall(_.warcType == "conversion"))
      assert(got.forall(r => r.contentLength == r.payload.length.toLong))
    }
  }

  test("keepPayload=false still frames records correctly (header-only scan)") {
    val dir = Files.createTempDirectory("graft-warc")
    writeFixture(dir, "a.warc.gz", gz = true,
      Seq(("u://1", "en", "x" * 50000), ("u://2", "fr", "tail record")))
    val got = WarcIO.readRecords(Files.newInputStream(dir.resolve("a.warc.gz")),
      gz = true, keepPayload = false).toList
    assert(got.map(_.targetUri) === Seq("u://1", "u://2"))
    assert(got.map(_.contentLength) === Seq(50000L, 11L))
    assert(got.forall(_.payload == null))
  }

  test("truncated payload surfaces as EOFException, not a silent short corpus") {
    val dir = Files.createTempDirectory("graft-warc")
    writeFixture(dir, "a.warc", gz = false, Seq(("u://1", "en", "full record text")))
    val bytes = Files.readAllBytes(dir.resolve("a.warc"))
    Files.write(dir.resolve("cut.warc"), bytes.dropRight(12))
    val ex = intercept[java.io.EOFException] {
      WarcIO.readRecords(Files.newInputStream(dir.resolve("cut.warc")),
        gz = false, source = "cut.warc").toList
    }
    assert(ex.getMessage.contains("cut.warc"))
  }

  test("DSv2 scan: schema, per-file partitions, date parse, header map") {
    val dir = Files.createTempDirectory("graft-warc")
    writeFixture(dir, "a.warc.gz", gz = true, Seq(("u://a/1", "en", "alpha")))
    writeFixture(dir, "b.warc.gz", gz = true,
      Seq(("u://b/1", "de", "beta"), ("u://b/2", "fr", "gamma")))
    Files.write(dir.resolve("_ignored.txt"), "noise".getBytes)

    val df = spark.read.format("warc").load(dir.toString)
    assert(df.schema === WarcSource.schema)
    assert(df.count() === 3)
    assert(df.rdd.getNumPartitions === 2, "one input partition per archive file")
    val rows = df.orderBy("target_uri")
      .select("target_uri", "warc_date", "content_type", "content_length")
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("u://a/1", "u://b/1", "u://b/2"))
    assert(rows.forall(_.getTimestamp(1).toInstant.toString == "2026-02-03T04:05:06Z"))
    assert(rows.forall(_.getString(2).startsWith("text/plain")))
    val langs = df.select(element_at(col("headers"), "WARC-Identified-Content-Language"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(langs === Seq("de", "en", "fr"))
    val texts = df.select(col("payload").cast("string")).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(texts === Seq("alpha", "beta", "gamma"))
  }

  test("column pruning reaches the scan: payload absent from the read schema") {
    val dir = Files.createTempDirectory("graft-warc")
    writeFixture(dir, "a.warc.gz", gz = true, Seq(("u://a/1", "en", "alpha")))
    val pruned = spark.read.format("warc").load(dir.toString)
      .select("target_uri", "content_length")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("target_uri"))
    assert(!plan.contains("payload"),
      s"pruned scan must not read payload:\n$plan")
    // and the pruned path still frames records correctly
    assert(pruned.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("u://a/1", 5L)))
  }

  test("warcShards exports the corpus losslessly; the DSv2 read restores every field") {
    val docs = Tables.documents(spark, sf0001)
    val dir = Files.createTempDirectory("graft-warc-export").toString
    WarcIO.warcShards(docs, dir, 4)

    val back = spark.read.format("warc").load(dir)
      .select(
        element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        col("payload").cast("string").as("text"),
        element_at(col("headers"), "WARC-Identified-Content-Language").as("lang"),
        element_at(split(col("target_uri"), "/"), 3).as("source"),
        length(col("payload").cast("string")).cast("long").as("n_chars"))
    assert(back.count() === docs.count())
    val diff = back.exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars"))
      .unionByName(docs.select("doc_id", "text", "lang", "source", "n_chars").exceptAll(back))
    assert(diff.isEmpty, "WARC export+read must be a lossless roundtrip")

    // balanced shards: ±1 docs per shard by the prefix-sum assignment
    val perShard = spark.read.format("warc").load(dir)
      .groupBy(regexp_extract(col("source_file"), "shard=(\\d+)", 1))
      .count().collect().map(_.getLong(1))
    assert(perShard.length === 4)
    assert(perShard.max - perShard.min <= 1)
  }

  test("export is deterministic: two runs produce byte-identical shard files") {
    val docs = Tables.documents(spark, sf0001).limit(60)
    val d1 = Files.createTempDirectory("graft-warc-det1").toString
    val d2 = Files.createTempDirectory("graft-warc-det2").toString
    WarcIO.warcShards(docs, d1, 2)
    WarcIO.warcShards(docs, d2, 2)
    for (s <- 0 until 2) {
      val f1 = Files.readAllBytes(java.nio.file.Paths.get(d1, s"shard=$s", s"part-$s.warc.gz"))
      val f2 = Files.readAllBytes(java.nio.file.Paths.get(d2, s"shard=$s", s"part-$s.warc.gz"))
      assert(java.util.Arrays.equals(f1, f2), s"shard $s must be byte-identical")
    }
  }
}
