package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.etl.AtomicTable

/** Runtime zone-map skipping on NON-partition columns: the join side's
  * key values (the DPP subquery result) are tested against the
  * manifest's partition- and file-level [min, max] bounds, so a
  * selective join on an id column prunes a range-laid-out fact to the
  * partitions — and inside them, the FILES — whose ranges could hold
  * the keys. Partition pruning alone cannot do this (id is not a
  * partition column); static file skipping cannot either (the values
  * only exist at runtime). */
class GraftRuntimeSkipSpec extends SparkSuite {
  import spark.implicits._

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case b: BatchScanExec => Seq(b)
    case o => o.children.flatMap(scansOf)
  }

  /** id-ranged fact: partition pK holds ids [K*1000, K*1000+999], two
    * files each with disjoint id halves — both stats levels recorded. */
  private def seedFact(): String = {
    val dir = Files.createTempDirectory("graft-rts").toString
    def half(lo: Long, hi: Long): DataFrame =
      (lo until hi).map(i => (i, i * 2.0, s"p${i / 1000}")).toDF("id", "v", "p")
        .repartition(col("p"))
    AtomicTable.replacePartitions(spark, dir, half(0L, 500L), "p",
      statsColumns = Seq("id"), retain = 10)
    for (k <- 0 to 2; (lo, hi) <- Seq((k * 1000L, k * 1000L + 500L),
      (k * 1000L + 500L, k * 1000L + 1000L))
      if !(k == 0 && lo == 0L))
      AtomicTable.appendPartitions(spark, dir, half(lo, hi), "p",
        statsColumns = Seq("id"), retain = 10)
    dir
  }

  private def dimOf(ids: Long*): DataFrame = {
    val dimPath = Files.createTempDirectory("graft-rts-dim").toString
    ((1L to 3000L).map(i => (i, if (ids.contains(i)) "keep" else "drop")))
      .toDF("id", "tag").write.mode("overwrite").parquet(dimPath)
    spark.read.parquet(dimPath).filter(col("tag") === "keep")
  }

  test("a selective join on a zone-mapped id prunes partitions AND files") {
    val dir = seedFact()
    val m = AtomicTable.manifest(java.nio.file.Paths.get(dir)).get
    assert(m.stats("p1").mins("id") === "1000" &&
      m.stats("p1").maxs("id") === "1999")
    assert(m.fileStats.nonEmpty, "file-level bounds must be recorded")

    val joined = spark.read.format("graft").load(dir)
      .join(broadcast(dimOf(1500L, 1501L)), Seq("id"))
    val rows = joined.collect()
    assert(rows.length === 2)

    val scan = scansOf(joined.queryExecution.executedPlan).head
    assert(scan.runtimeFilters.nonEmpty,
      "the join must deliver a runtime filter on the id column")
    val parts = scan.scan.asInstanceOf[GraftScan].planInputPartitions()
      .map(_.asInstanceOf[GraftInputPartition])
    assert(parts.map(_.partValue).distinct.toSeq === Seq("p1"),
      s"id bounds must prune p0/p2 at runtime, kept ${parts.map(_.partValue).toSeq}")
    // file granularity: ids 1500/1501 live in p1's SECOND half-file; the
    // first half's split empties (its key stays visible), so exactly one
    // data file is read from a 6-file table
    assert(parts.flatMap(_.dataFiles).length === 1,
      s"only the admitting half-file must survive, planned " +
        s"${parts.flatMap(_.dataFiles).toSeq}")
  }

  test("values outside every bound prune the whole scan; results stay exact") {
    val dir = seedFact()
    val joined = spark.read.format("graft").load(dir)
      .join(broadcast(dimOf(999999L)), Seq("id"))
    assert(joined.collect().isEmpty)
    // unmatched keys refute every partition's bounds (AQE may collapse
    // the empty join before the scan even runs — also a win)
    assert(scansOf(joined.queryExecution.executedPlan).headOption.forall(
      _.scan.asInstanceOf[GraftScan].planInputPartitions().isEmpty),
      "no partition's bounds admit an out-of-range key")
  }

  test("columns without bounds are never offered, and never over-prune") {
    val dir = Files.createTempDirectory("graft-rts-plain").toString
    AtomicTable.replacePartitions(spark, dir,
      (1L to 100L).map(i => (i, s"p${i % 2}")).toDF("id", "p")
        .repartition(col("p")), "p", retain = 10) // NO statsColumns
    val joined = spark.read.format("graft").load(dir)
      .join(broadcast(dimOf(7L)), Seq("id"))
    assert(joined.collect().map(_.getLong(0)).toSeq === Seq(7L),
      "an untracked table must answer exactly (nothing to skip by)")
  }
}
