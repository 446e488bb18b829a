package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite
import graft.etl.AtomicTable

/** Scan-reported output ordering (SupportsReportOrdering): the manifest
  * records per dir which columns its files are internally sorted by
  * (write_order INSERTs, clustered compaction), and the scan claims the
  * common prefix — identity partition columns leading for free (they
  * are constant within a split). The payoff pinned here: a
  * storage-partitioned join over two clustered tables plans with
  * NEITHER exchanges NOR sorts. Honesty guards: an unmarked commit
  * collapses the claim; multi-file key groups are Spark's own guard
  * (ordering is dropped, a sort comes back, results stay exact). */
class GraftSortOrderSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-so").toString
    spark.conf.set("spark.sql.catalog.gso", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gso.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gso.db")
    w
  }

  private def scansOf(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case b: BatchScanExec => Seq(b)
    case o => o.children.flatMap(scansOf)
  }

  private def withSpjConf[A](body: => A): A = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // join keys (p, k) are a SUPERSET of the partition keys (p): both
    // sides are key-grouped identically on p, which co-partitions the
    // join once the all-keys requirement is relaxed (the SPJ contract
    // for "partition keys subset of join keys")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("write_order INSERT records per-dir sort markers; the scan claims them") {
    warehouse
    spark.sql("CREATE TABLE gso.db.w1 (p STRING, k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('write_order'='k', 'retain'='5')")
    Seq("a", "b").flatMap(p => (0L until 50L).map(i => (p, i, i * 1.0)))
      .toDF("p", "k", "v").createOrReplaceTempView("src_w1")
    spark.sql("INSERT INTO gso.db.w1 SELECT * FROM src_w1")
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "w1")).get
    assert(m.sorted.nonEmpty &&
      m.partitions.values.flatten.forall(d => m.sorted.get(d).contains("k")),
      s"every written dir must carry the 'k' sort marker, got ${m.sorted}")
    val q = spark.sql("SELECT p, k, v FROM gso.db.w1")
    q.collect()
    val ordering = scansOf(q.queryExecution.executedPlan).head.scan
      .asInstanceOf[GraftScan].outputOrdering()
    assert(ordering.map(_.expression().describe()).toSeq === Seq("p", "k"),
      "claim = identity partition prefix ++ marker cols")
    // projection that prunes k keeps only the constant partition prefix
    val q2 = spark.sql("SELECT p, v FROM gso.db.w1")
    q2.collect()
    assert(scansOf(q2.queryExecution.executedPlan).head.scan
      .asInstanceOf[GraftScan].outputOrdering()
      .map(_.expression().describe()).toSeq === Seq("p"))
  }

  test("storage-partitioned join over clustered tables: no exchange AND no sort") {
    warehouse
    for (t <- Seq("f1", "f2")) {
      spark.sql(s"CREATE TABLE gso.db.$t (p STRING, k BIGINT, v DOUBLE) " +
        "PARTITIONED BY (p) " +
        "TBLPROPERTIES ('cluster_by'='k', 'retain'='5')")
      // two unordered commits -> fragmented, unmarked
      Seq("a", "b").flatMap(p => (0L until 40L).map(i => (p, i, i * 1.0)))
        .toDF("p", "k", "v").createOrReplaceTempView(s"src_$t")
      spark.sql(s"INSERT INTO gso.db.$t SELECT * FROM src_$t " +
        "WHERE k % 2 = 0")
      spark.sql(s"INSERT INTO gso.db.$t SELECT * FROM src_$t " +
        "WHERE k % 2 = 1")
      // clustered compaction: one k-sorted file per partition + marker
      spark.sql(s"CALL gso.system.compact('db.$t', 2)")
      val m = AtomicTable.manifest(Paths.get(warehouse, "db", t)).get
      assert(m.partitions.values.flatten
        .forall(d => m.sorted.get(d).contains("k")),
        s"compacted dirs of $t must carry the cluster_by marker")
    }
    withSpjConf {
      val j = spark.sql("SELECT t1.p, t1.k, t1.v, t2.v AS v2 " +
        "FROM gso.db.f1 t1 JOIN gso.db.f2 t2 ON t1.p = t2.p AND t1.k = t2.k")
      val rows = j.collect()
      assert(rows.length === 80)
      val plan = j.queryExecution.executedPlan
      assert(!plan.toString.contains("Exchange"),
        s"same-partitioned join must plan zero exchanges:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty,
        s"marker-sorted single-file groups must plan zero sorts:\n$plan")
    }
  }

  test("an unmarked commit collapses the claim; the join sorts again, exactly") {
    warehouse
    // append an UNSORTED dir through the Scala API (no sortedBy claim)
    AtomicTable.appendPartitions(spark,
      Paths.get(warehouse, "db", "f1").toString,
      Seq(("a", 1000L, -1.0), ("b", 1001L, -2.0)).toDF("p", "k", "v"),
      "p", retain = 5)
    val m = AtomicTable.manifest(Paths.get(warehouse, "db", "f1")).get
    assert(!m.partitions.values.flatten.forall(m.sorted.contains),
      "the fresh dir must carry NO marker")
    val q = spark.sql("SELECT p, k FROM gso.db.f1")
    q.collect()
    assert(scansOf(q.queryExecution.executedPlan).head.scan
      .asInstanceOf[GraftScan].outputOrdering()
      .map(_.expression().describe()).toSeq === Seq("p"),
      "marker claim must collapse to the constant partition prefix")
    withSpjConf {
      val j = spark.sql("SELECT t1.p, t1.k, t1.v, t2.v AS v2 " +
        "FROM gso.db.f1 t1 JOIN gso.db.f2 t2 ON t1.p = t2.p AND t1.k = t2.k")
      val rows = j.collect()
      assert(rows.length === 80, "the unmatched appended keys join nothing")
      assert(j.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.nonEmpty,
        "multi-file groups / missing markers must bring the sort back")
    }
  }
}
