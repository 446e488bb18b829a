package graft.etl

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Cross-PROCESS commit linearizability: the in-JVM lock cannot reach
  * another OS process, so everything here rests on the POSIX link(2)
  * create-new version claim ([[AtomicTable.tryPublishManifest]]) — two
  * forked JVMs and this test's own thread race interleaved commits
  * against one table root, and every commit must land as its own
  * version with no partition, property, or version lost. This is the
  * multi-writer deployment reality a 100 TB table hits first (several
  * ingest drivers sharing one warehouse table); rounds 1-7 documented
  * it out of contract on the wrong premise that a local filesystem has
  * no put-if-absent primitive. No Spark needed: the race is purely in
  * the metadata commit protocol (WriterRaceSpec covers the staged-data
  * path in-JVM). */
class CrossProcessCommitSpec extends AnyFunSuite {

  private val perWriter = 12
  private val retain = 1000 // keep every version so the spec can audit the chain

  private def forkChild(table: String, tag: String): Process = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.CommitRaceChild",
      table, tag, perWriter.toString, retain.toString)
      .redirectErrorStream(true)
      .start()
  }

  test("three OS processes committing interleaved: every commit lands, " +
      "versions linearize, nothing is lost") {
    val root = Files.createTempDirectory("graft-xproc").resolve("t")
    val table = root.toString

    val children = Seq(forkChild(table, "a"), forkChild(table, "b"))
    // this JVM is the third writer, through the same public API
    var parentFailure: Option[Throwable] = None
    val parent = new Thread(() => {
      try {
        for (k <- 1 to perWriter) {
          val part = s"p_$k"
          val dir = root.resolve("data").resolve(s"txn-p-$k").resolve(s"part=$part")
          Files.createDirectories(dir)
          Files.writeString(dir.resolve("marker.parquet"), s"p $k")
          AtomicTable.commitManifest(root,
            written = Map(part -> Seq(s"data/txn-p-$k/part=$part")),
            properties = Map("last_p" -> k.toString), retain = retain)
          ()
        }
      } catch { case t: Throwable => parentFailure = Some(t) }
    })
    parent.start()
    children.foreach { c =>
      val out = new String(c.getInputStream.readAllBytes(), "UTF-8")
      assert(c.waitFor() === 0, s"child process failed:\n$out")
    }
    parent.join(120000)
    parentFailure.foreach(t => fail(s"parent writer failed: $t", t))

    val total = 3L * perWriter
    val v = AtomicTable.currentVersion(root)
    assert(v === Some(total), "every commit must claim its own version")
    val m = AtomicTable.manifest(root).get
    val expected = (1 to perWriter)
      .flatMap(k => Seq(s"a_$k", s"b_$k", s"p_$k")).toSet
    assert(m.partitions.keySet === expected,
      "a lost read-modify-write would drop another process's partitions")
    // each writer's property stream survived the three-way merge
    assert(m.properties.get("last_a") === Some(perWriter.toString))
    assert(m.properties.get("last_b") === Some(perWriter.toString))
    assert(m.properties.get("last_p") === Some(perWriter.toString))
    // the version chain is gap-free and monotone: version k carries
    // exactly k partitions (every commit added exactly one)
    for (k <- 1L to total) {
      val mk = AtomicTable.manifestAt(root, k)
      assert(mk.version === k)
      assert(mk.partitions.size === k.toInt,
        s"manifest v$k must hold exactly $k partitions")
    }
    // every data dir each manifest references exists on disk (no GC ran
    // inside the retention window)
    assert(m.partitions.values.flatten.forall(d => Files.isDirectory(root.resolve(d))))
  }

  test("the version pointer is advisory: a stale or missing cache never " +
      "hides a committed version") {
    val root = Files.createTempDirectory("graft-xptr").resolve("t")
    for (k <- 1 to 3) {
      val dir = root.resolve("data").resolve(s"txn-$k").resolve(s"part=x$k")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("marker.parquet"), k.toString)
      AtomicTable.commitManifest(root,
        written = Map(s"x$k" -> Seq(s"data/txn-$k/part=x$k")), retain = 1000)
      ()
    }
    assert(AtomicTable.currentVersion(root) === Some(3L))
    // simulate a writer that crashed between the manifest link and the
    // pointer refresh: regress the cache, then delete it outright
    Files.writeString(root.resolve("_graft_version"), "1")
    assert(AtomicTable.currentVersion(root) === Some(3L))
    Files.delete(root.resolve("_graft_version"))
    assert(AtomicTable.currentVersion(root) === Some(3L))
    // and the next commit proceeds from the true current version
    val dir = root.resolve("data").resolve("txn-4").resolve("part=x4")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("marker.parquet"), "4")
    val m = AtomicTable.commitManifest(root,
      written = Map("x4" -> Seq("data/txn-4/part=x4")), retain = 1000)
    assert(m.version === 4L)
  }

  test("a crashed claim leaves only a tmp orphan that vacuum's tmp sweep " +
      "reclaims") {
    val root = Files.createTempDirectory("graft-xtmp").resolve("t")
    Files.createDirectories(root.resolve("_manifests"))
    val orphan = root.resolve("_manifests").resolve(".tmp-deadbeef")
    Files.writeString(orphan, "{\"version\": 99}")
    // age the orphan explicitly: the gate is a strict mtime compare,
    // and "write then vacuum(0)" can land in the same clock millisecond
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60_000L))
    // the orphan is invisible to version discovery ...
    assert(AtomicTable.currentVersion(root) === None)
    // ... and reclaimed by the age-gated vacuum
    AtomicTable.vacuum(root, olderThanMs = 1000L)
    assert(!Files.exists(orphan))
  }
}
