package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.Tables
import graft.etl.AtomicTable

/** The persistent IVF index (ops/VectorIndex): build, probe-pruned
  * query, frozen-centroid append, and the warehouse inheritance. */
class VectorIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus() = Tables.embeddings(spark, sf0001)

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-vix").toString
    VectorIndex.build(spark, r, corpus(), iters = 2)
    r
  }

  test("build materializes bucket-partitioned postings with zone maps") {
    val m = AtomicTable.manifest(Paths.get(root, "postings")).get
    assert(m.partitions.size > 1, "multiple inverted lists")
    assert(m.partitions.keySet.subsetOf(m.stats.keySet), "vec_id zone-mapped")
    assert(m.stats.values.map(_.rows).sum === corpus().count())
    val cents = VectorIndex.loadCentroids(spark, root)
    assert(cents.count().toInt === m.partitions.size)
  }

  test("query matches the in-memory IVF search it persists") {
    val queries = corpus().filter(col("vec_id") % 100 === 0)
    val got = VectorIndex.query(spark, root, queries, k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Similarity.ivfKMeansTopK(queries, corpus(), k = 3,
      nprobe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("append assigns against frozen centroids and is an atomic upsert") {
    val r = Files.createTempDirectory("graft-vix-app").toString
    VectorIndex.build(spark, r, corpus(), iters = 1)
    val centsBefore = VectorIndex.loadCentroids(spark, r).collect().toSet
    // near-duplicates of a slice, new ids: must land next to their twins
    val extra = corpus().filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 5000000L).as("vec_id"),
        col("embedding"), col("label"))
    VectorIndex.append(spark, r, extra)
    assert(VectorIndex.loadCentroids(spark, r).collect().toSet === centsBefore,
      "append never retrains the quantizer")
    val hits = VectorIndex.query(spark, r,
      corpus().filter(col("vec_id") % 50 === 0), k = 1, nprobe = 1)
    val found = hits.filter(col("neighbor_id") === col("query_id") + 5000000L)
    assert(found.count() === hits.count(),
      "every appended twin is its source's nearest neighbor")
    // re-append the same ids: upsert replaces, never duplicates
    val n1 = AtomicTable.read(spark, s"$r/postings",
      VectorIndex.PostingsSchema).count()
    VectorIndex.append(spark, r, extra)
    assert(AtomicTable.read(spark, s"$r/postings",
      VectorIndex.PostingsSchema).count() === n1)
  }

  test("the probe reads only the probed inverted lists") {
    val m = AtomicTable.manifest(Paths.get(root, "postings")).get
    // readPartitions of a single bucket returns exactly that list's rows
    val one = m.partitions.keySet.head
    val got = AtomicTable.readPartitions(spark, s"$root/postings",
      VectorIndex.PostingsSchema, Set(one))
    assert(got.select("bucket").distinct().as[String].collect().toSeq
      === Seq(one))
    assert(got.count() === m.stats(one).rows)
  }
}
