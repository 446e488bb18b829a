package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Concurrent-writer linearizability for the AtomicTable commit protocol:
  * two threads committing interleaved must BOTH land — the read-modify-
  * write of the partition map is the race (each writer carries forward
  * the other's partitions by reference), and without the per-root commit
  * lock a lost update silently drops the loser's partitions while its
  * data dirs leak. Cross-process writers are documented out of contract
  * (AtomicTable.commitLocks scaladoc). */
class WriterRaceSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", IntegerType),
    StructField("part", StringType)))

  test("two interleaved committers: every commit lands, versions " +
      "linearize, no partition or property is lost") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-race").resolve("t").toString
    val n = 8
    @volatile var failure: Option[Throwable] = None
    def writer(tag: String): Thread = new Thread(() => {
      try {
        for (i <- 1 to n) {
          val df = Seq((s"$tag$i", i)).toDF("k", "v")
            .withColumn("part", lit(s"$tag$i"))
          AtomicTable.replacePartitions(spark, table, df, "part",
            properties = Map(s"last_$tag" -> i.toString))
        }
      } catch { case t: Throwable => failure = Some(t) }
    })
    val (a, b) = (writer("a"), writer("b"))
    a.start(); b.start(); a.join(60000); b.join(60000)
    failure.foreach(t => fail(s"writer thread failed: $t", t))

    val m = AtomicTable.manifest(Paths.get(table))
      .getOrElse(fail("no manifest committed"))
    // every commit got its own version — nothing was overwritten
    assert(m.version === 2L * n)
    // both writers' partitions all present (a lost update drops a set)
    val expected = (1 to n).flatMap(i => Seq(s"a$i", s"b$i")).toSet
    assert(m.partitions.keySet === expected)
    // the property merge carried BOTH writers' final keys forward
    assert(m.properties.get("last_a") === Some(n.toString))
    assert(m.properties.get("last_b") === Some(n.toString))
    // and the committed data is complete and readable
    val rows = AtomicTable.read(spark, table, schema)
    assert(rows.count() === 2L * n)
    assert(rows.select("part").distinct().count() === 2L * n)
  }

  test("expectedVersion aborts a stale read-modify-write instead of " +
      "clobbering a concurrent commit") {
    import spark.implicits._
    val table = Files.createTempDirectory("graft-occ").resolve("t").toString
    val df1 = Seq(("a", 1)).toDF("k", "v").withColumn("part", lit("p1"))
    AtomicTable.replacePartitions(spark, table, df1, "part") // v1
    val readAtV = AtomicTable.currentVersion(Paths.get(table)).get
    // another writer replaces p1 while the maintenance job holds its read
    val df2 = Seq(("a", 2)).toDF("k", "v").withColumn("part", lit("p1"))
    AtomicTable.replacePartitions(spark, table, df2, "part") // v2
    // the stale rewrite must abort...
    val stale = Seq(("a", 99)).toDF("k", "v").withColumn("part", lit("p1"))
    intercept[java.util.ConcurrentModificationException] {
      AtomicTable.replacePartitions(spark, table, stale, "part",
        expectedVersion = Some(readAtV))
    }
    // ...and the concurrent writer's data must survive
    assert(AtomicTable.read(spark, table, schema)
      .select("v").as[Int].head() === 2)
  }

  test("vacuum reclaims aged never-committed orphans but spares " +
      "in-flight (recent) staging dirs and committed data") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vacuum").resolve("t")
    val df = Seq(("a", 1)).toDF("k", "v").withColumn("part", lit("p1"))
    AtomicTable.replacePartitions(spark, root.toString, df, "part")
    // a crash orphan: staged long ago, never referenced by any manifest
    val orphan = root.resolve("data").resolve("txn-dead")
    Files.createDirectories(orphan.resolve("part=zz"))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    // an in-flight writer's staging dir: unreferenced but RECENT
    val inflight = root.resolve("data").resolve("txn-live")
    Files.createDirectories(inflight.resolve("part=yy"))
    AtomicTable.vacuum(root)
    assert(!Files.exists(orphan), "aged orphan must be reclaimed")
    assert(Files.exists(inflight), "recent staging dir must survive")
    assert(AtomicTable.read(spark, root.toString, schema).count() === 1L)
  }
}
