package graft.streaming

import java.nio.file.{Files, Path, Paths}

import graft.SparkSuite
import graft.etl.AtomicTable
import graft.ops.DedupIndex

/** Two-PROCESS crash/restart for the streaming curated ingest: a child
  * JVM runs the ingest and is halted (the deterministic in-process
  * `kill -9`) in the exactly-once protocol's worst window — the batch's
  * signatures are already appended to the dedup index, the corpus
  * commit has not happened. This process then restarts the ingest over
  * the same checkpoint and must converge to EXACTLY the corpus a
  * never-crashed run produces: the replayed batch's index append is
  * tag-granular (REPLACES its own partition), the index match excludes
  * the batch's own ingest tag (so the half-committed attempt's
  * signatures don't reject their own replay), and the corpus commit
  * carries last_batch_id (so nothing double-commits). Composes the
  * cross-process AtomicTable commit protocol with the streaming replay
  * guards — the full deployment story, across a real process boundary. */
class CurateCrashRestartSpec extends SparkSuite {

  private val passageA = "the quick brown fox and the lazy dog run over " +
    "green hills while morning light settles on quiet fields"
  private val passageAEdit = "the quick brown fox and the lazy dog run over " +
    "green hills while morning light settles on quiet meadows"
  private val passageB = "a gentle stream winds and turns through the deep " +
    "forest carrying cold clear water past mossy stones today"
  private val passageC = "the old library holds many rare books and scrolls " +
    "that scholars travel great distances to read carefully"
  private val passageD = "bright kites drift and climb above the open shore " +
    "while children chase long shadows across the warm sand"

  private def jsonLine(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text", "source": "s"}"""

  private def corpusSchema = org.apache.spark.sql.types.StructType(
    Streams.documentsSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("batch_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("commit_part",
        org.apache.spark.sql.types.StringType)))

  private def corpusRows(corpus: String): Set[(Long, String, String)] =
    AtomicTable.read(spark, corpus, corpusSchema)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private def sigIds(index: String): Set[Long] =
    AtomicTable.read(spark, s"$index/sigs", DedupIndex.sigSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def writeStaging(staging: Path): Unit = {
    Files.createDirectories(staging)
    // batch 0: two unique docs. batch 1 (the crash batch): a near-dup of
    // doc 1 that only the INDEX can reject, plus a genuinely new doc.
    // batch 2: a new doc plus a redelivery of doc 5's content, which only
    // doc 5's batch-0 signature can reject.
    Files.writeString(staging.resolve("f1.json"), Seq(
      jsonLine(1, passageA), jsonLine(5, passageB)).mkString("", "\n", "\n"))
    Files.writeString(staging.resolve("f2.json"), Seq(
      jsonLine(6, passageAEdit), jsonLine(7, passageC)).mkString("", "\n", "\n"))
    Files.writeString(staging.resolve("f3.json"), Seq(
      jsonLine(8, passageD), jsonLine(9, passageB)).mkString("", "\n", "\n"))
    ()
  }

  private def addOpens: Seq[String] = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar")
    .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")

  test("child JVM halted between index append and corpus commit: the " +
      "restarted ingest converges to the never-crashed corpus") {
    val base = Files.createTempDirectory("graft-crash")
    val staging = base.resolve("staging")
    val (corpus, index, ckpt) =
      (s"$base/corpus", s"$base/index", s"$base/ckpt")
    writeStaging(staging)

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx4g",
      "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
      "graft.tools.CurateCrashChild",
      staging.toString, corpus, index, ckpt, "1")
    val child = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
    val code = child.waitFor()
    assert(code === 137, s"child must die by halt(137), got $code:\n$out")
    assert(out.contains("HALTING-IN-WINDOW batch=1"),
      s"crash must fire in the injected window:\n$out")

    // the torn state the crash left behind: batch 1's signatures are in
    // the index under its tag, but the corpus never saw batch 1
    val lastCommitted = AtomicTable.manifest(Paths.get(corpus))
      .flatMap(_.properties.get("last_batch_id")).map(_.toLong)
    assert(lastCommitted === Some(0L),
      "corpus must still be at batch 0 — the crash preceded its commit")
    val idxTags = AtomicTable.manifest(Paths.get(s"$index/sigs"))
      .map(_.partitions.keySet).getOrElse(Set.empty)
    assert(idxTags.contains("b000001"),
      s"index must already hold the crashed batch's tag, got $idxTags")

    // restart from THIS process over the same checkpoint: batch 1
    // replays under its original id, batch 2 runs fresh
    Streams.curatedIngestAvailableNow(spark, staging.toString, corpus,
      index, ckpt)

    // a never-crashed reference run over the same staging input
    val cleanBase = Files.createTempDirectory("graft-clean")
    val cleanStaging = cleanBase.resolve("staging")
    writeStaging(cleanStaging)
    Streams.curatedIngestAvailableNow(spark, cleanStaging.toString,
      s"$cleanBase/corpus", s"$cleanBase/index", s"$cleanBase/ckpt")

    val crashed = corpusRows(corpus)
    val clean = corpusRows(s"$cleanBase/corpus")
    assert(crashed === clean,
      "crash+restart must produce exactly the never-crashed corpus")
    // and concretely: the near-dup (6) and the redelivered content (9)
    // stayed out, nothing admitted was lost, nothing is double-admitted
    assert(crashed.map(_._1) === Set(1L, 5L, 7L, 8L))
    assert(AtomicTable.read(spark, corpus, corpusSchema).count() === 4L)
    assert(sigIds(index) === sigIds(s"$cleanBase/index"))
  }
}
