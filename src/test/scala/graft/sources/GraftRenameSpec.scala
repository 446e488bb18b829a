package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSuite
import graft.etl.AtomicTable

/** ALTER TABLE ... RENAME COLUMN / DROP COLUMN as METADATA-ONLY
  * evolutions: zero files rewritten, reads resolve old files through
  * the alias chain, and — the demanding half — every pruning tier
  * stays CORRECT through the rename, not just disabled: partition
  * zone maps recorded under the old name still prune (and the blob
  * hydration proves which partitions planning touched), bloom
  * sidecars written under the old name still answer point lookups
  * file by file. Name reuse after a drop/rename is refused: stale
  * file-level metadata under the name would silently mis-prune. */
class GraftRenameSpec extends SparkSuite {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-rename").toString
    spark.conf.set("spark.sql.catalog.grn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grn.root", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grn.db")
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
  private def plannedFiles(df: DataFrame): Int = {
    df.collect()
    GraftSource.plannedFileCount(
      scansOf(df.queryExecution.executedPlan).head.scan).get
  }

  test("rename is metadata-only; both generations read; zone maps prune through the alias") {
    warehouse
    spark.sql("CREATE TABLE grn.db.t1 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k', 'retain'='5')")
    (0L until 100L).map(i => (i, i * 1.0, "a")).toDF("k", "v", "p")
      .createOrReplaceTempView("rn_a")
    (1000L until 1100L).map(i => (i, i * 1.0, "b")).toDF("k", "v", "p")
      .createOrReplaceTempView("rn_b")
    spark.sql("INSERT INTO grn.db.t1 SELECT * FROM rn_a")
    spark.sql("INSERT INTO grn.db.t1 SELECT * FROM rn_b")
    val dir = Paths.get(warehouse, "db", "t1")
    val dirsBefore = AtomicTable.rootOpt(dir).get.partitions

    spark.sql("ALTER TABLE grn.db.t1 RENAME COLUMN k TO key")

    // metadata-only: identical data dirs, and the alias is on record
    assert(AtomicTable.rootOpt(dir).get.partitions === dirsBefore)
    assert(AtomicTable.rootOpt(dir).get
      .properties(GraftSource.RenamePrefix + "key") === "k")
    assert(spark.table("grn.db.t1").schema.fieldNames.toSeq ===
      Seq("key", "v", "p"))

    // post-rename writes land under the NEW name
    (2000L until 2100L).map(i => (i, i * 1.0, "c")).toDF("key", "v", "p")
      .createOrReplaceTempView("rn_c")
    spark.sql("INSERT INTO grn.db.t1 SELECT * FROM rn_c")

    // both generations read through one name
    assert(spark.sql("SELECT count(*) FROM grn.db.t1").as[Long].head() === 300L)
    assert(spark.sql("SELECT sum(key) FROM grn.db.t1 WHERE key < 100")
      .as[Long].head() === (0L until 100L).sum)

    // THE PRUNING PIN: the range predicate on the RENAMED column must
    // prune partitions via bounds recorded under the OLD name — and the
    // blob-read log proves planning hydrated ONLY the admitted
    // partition (pruning decided on the root, through the alias)
    val blobOf = AtomicTable.rootOpt(dir).get.blobs
    AtomicTable.blobReadLog.clear()
    AtomicTable.recordBlobReads = true
    try {
      val got = spark.sql(
        "SELECT sum(key) FROM grn.db.t1 WHERE key BETWEEN 1000 AND 1099")
        .as[Long].head()
      assert(got === (1000L until 1100L).sum)
      val read = AtomicTable.blobReadLog.iterator()
      val readSet = scala.jdk.CollectionConverters
        .IteratorHasAsScala(read).asScala.toSet
      assert(readSet === Set(blobOf("b")),
        s"alias-aware zone maps must admit only partition b; hydrated " +
          s"$readSet of ${blobOf.values.toSet}")
    } finally {
      AtomicTable.recordBlobReads = false
      AtomicTable.blobReadLog.clear()
    }
  }

  test("bloom sidecars written under the old name keep point skipping after a rename") {
    warehouse
    spark.sql("CREATE TABLE grn.db.t2 (id BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES " +
      "('bloom_columns'='id', 'retain'='5')")
    // three interleaved key-thirds: every file spans the whole range,
    // so only the blooms can skip
    (0 until 3).foreach { k =>
      (0L until 300L).filter(_ % 3 == k).map(i => (i, i * 1.5, "a"))
        .toDF("id", "v", "p").coalesce(1).createOrReplaceTempView("rn_bl")
      spark.sql("INSERT INTO grn.db.t2 SELECT * FROM rn_bl")
    }
    spark.sql("ALTER TABLE grn.db.t2 RENAME COLUMN id TO ident")
    // declared bloom meta followed the rename
    val q = spark.sql("SELECT v FROM grn.db.t2 WHERE ident = 7")
    assert(q.as[Double].collect().toSeq === Seq(10.5))
    assert(plannedFiles(q) === 1,
      "the point lookup must skip two of three files via the OLD-name " +
        "sidecars (alias probe)")
    // and an absent key reads zero files
    val q2 = spark.sql("SELECT v FROM grn.db.t2 WHERE ident = 999999")
    assert(q2.collect().isEmpty)
    assert(plannedFiles(q2) === 0)
  }

  test("drop column is metadata-only; retired names are refused for re-add and rename") {
    warehouse
    spark.sql("CREATE TABLE grn.db.t3 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    (0L until 50L).map(i => (i, i * 2.0, "a")).toDF("k", "v", "p")
      .createOrReplaceTempView("rn_d")
    spark.sql("INSERT INTO grn.db.t3 SELECT * FROM rn_d")
    val dir = Paths.get(warehouse, "db", "t3")
    val dirsBefore = AtomicTable.rootOpt(dir).get.partitions

    spark.sql("ALTER TABLE grn.db.t3 DROP COLUMN v")

    assert(AtomicTable.rootOpt(dir).get.partitions === dirsBefore,
      "DROP COLUMN must move zero data")
    assert(spark.table("grn.db.t3").schema.fieldNames.toSeq === Seq("k", "p"))
    assert(spark.sql("SELECT count(*) FROM grn.db.t3").as[Long].head() === 50L)
    assert(AtomicTable.rootOpt(dir).get
      .properties(GraftSource.DroppedColsProperty) === "v")

    // re-adding the dropped name is refused: stale file metadata under
    // 'v' could mis-prune a NEW column reusing it
    val readd = intercept[Exception] {
      spark.sql("ALTER TABLE grn.db.t3 ADD COLUMNS (v DOUBLE)")
    }
    assert(readd.getMessage.contains("previously dropped or renamed"),
      s"got: ${readd.getMessage}")
    // renaming ONTO a retired name is refused the same way
    val onto = intercept[Exception] {
      spark.sql("ALTER TABLE grn.db.t3 RENAME COLUMN k TO v")
    }
    assert(onto.getMessage.contains("stale zone maps"),
      s"got: ${onto.getMessage}")
    // a FRESH name is fine
    spark.sql("ALTER TABLE grn.db.t3 ADD COLUMNS (w DOUBLE)")
    assert(spark.table("grn.db.t3").schema.fieldNames.toSeq ===
      Seq("k", "p", "w"))
  }

  test("partition levels refuse rename and drop loudly") {
    warehouse
    spark.sql("CREATE TABLE grn.db.t4 (k BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    val rn = intercept[Exception] {
      spark.sql("ALTER TABLE grn.db.t4 RENAME COLUMN p TO q")
    }
    assert(rn.getMessage.contains("partition level"), s"got: ${rn.getMessage}")
    val dp = intercept[Exception] {
      spark.sql("ALTER TABLE grn.db.t4 DROP COLUMN p")
    }
    assert(dp.getMessage.contains("partition level"), s"got: ${dp.getMessage}")
    // a bucket level's SOURCE column is structurally pinned too
    spark.sql("CREATE TABLE grn.db.t5 (k BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    val src = intercept[Exception] {
      spark.sql("ALTER TABLE grn.db.t5 RENAME COLUMN k TO kk")
    }
    assert(src.getMessage.contains("partition level"), s"got: ${src.getMessage}")
  }

  test("the changefeed spans a rename boundary; stale-schema views refuse loudly") {
    warehouse
    spark.sql("CREATE TABLE grn.db.cf (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO grn.db.cf VALUES (1, 1.0, 'a'), (2, 2.0, 'b')") // v1
    spark.sql("ALTER TABLE grn.db.cf RENAME COLUMN v TO val")              // v2
    spark.sql("INSERT INTO grn.db.cf VALUES (3, 3.0, 'a')")                // v3
    // full-fidelity CDC ACROSS the rename: version 1's rows live in
    // pre-rename files (parquet column 'v'), version 3's in post-rename
    // ones ('val') — the feed reads both generations under the DECLARED
    // name through the alias chain
    val ch = spark.sql(
      "CALL grn.system.table_changes('db.cf', 1, 3, 'k', 'cf_ch')")
    assert(ch.collect().nonEmpty)
    val rows = spark.sql(
      "SELECT k, val, _change_type FROM cf_ch ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(rows.toSeq === Seq((1L, 1.0, "insert"), (2L, 2.0, "insert"),
      (3L, 3.0, "insert")),
      s"pre-rename generations must surface under the new name, got " +
        rows.mkString(", "))

    // an incremental view DEFINED BEFORE the rename holds a stale
    // sourceSchema: its refresh must refuse loudly, never feed nulls
    val mv = java.nio.file.Files.createTempDirectory("grn-mv")
      .resolve("mv").toString
    val src = java.nio.file.Paths.get(warehouse, "db", "cf").toString
    val staleSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("val",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
    graft.etl.IncrementalView.create(spark, src, staleSchema, mv,
      Seq("p"), Seq("v_sum" -> "CAST(val AS DECIMAL(18,2))"), "p",
      keyCols = Seq("k"))
    spark.sql("ALTER TABLE grn.db.cf RENAME COLUMN val TO value2")     // v4
    spark.sql("INSERT INTO grn.db.cf VALUES (9, 9.0, 'b')")            // v5
    val err = intercept[IllegalStateException] {
      graft.etl.IncrementalView.refresh(spark, mv)
    }
    assert(err.getMessage.contains("renamed after view"),
      s"got: ${err.getMessage}")
  }

  test("a streaming read spans the rename: both generations surface under the new name") {
    warehouse
    spark.sql("CREATE TABLE grn.db.st (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO grn.db.st VALUES (1, 1.5, 'a')")            // v1
    spark.sql("ALTER TABLE grn.db.st RENAME COLUMN v TO val")          // v2
    spark.sql("INSERT INTO grn.db.st VALUES (2, 2.5, 'b')")            // v3
    val ckpt = Files.createTempDirectory("grn-st").toString
    // the stream plans v1's dirs (parquet column 'v') AND v3's ('val')
    // in one drain; the micro-batch reader resolves per FILE through
    // the head root's alias chain
    val q = spark.readStream.table("grn.db.st")
      .writeStream.format("memory").queryName("grn_st_out")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val got = spark.sql("SELECT k, val FROM grn_st_out ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1.5), (2L, 2.5)),
      s"the pre-rename generation must stream under the NEW name, got $got")
  }

  test("a renamed delete-key column still hides MOR-deleted rows in pre-rename files") {
    warehouse
    // contract under test: rename of a (folded) delete-key column is
    // metadata-only, and a LATER MOR delete keyed on the NEW name must
    // subtract rows from PRE-RENAME files too — those parquet files
    // store the key under the OLD field name, so the reader's probe
    // has to resolve the key through the alias chain per file
    spark.sql("CREATE TABLE grn.db.t7 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO grn.db.t7 VALUES (1, 1.0, 'a'), (2, 2.0, 'a'), " +
      "(3, 3.0, 'a')")
    spark.sql("ALTER TABLE grn.db.t7 RENAME COLUMN k TO key")
    spark.sql("INSERT INTO grn.db.t7 VALUES (4, 4.0, 'a'), (5, 5.0, 'a')")
    val dir = Paths.get(warehouse, "db", "t7").toString
    val schema = spark.table("grn.db.t7").schema
    // one vector, keys spanning BOTH generations (2 pre-rename, 4 post)
    graft.etl.MergeInto.deleteKeysMor(spark, dir, schema,
      Seq((2L, "a"), (4L, "a")).toDF("key", "p"), Seq("key"), "p",
      retain = 10)
    assert(AtomicTable.rootOpt(Paths.get(dir)).get.deletes.nonEmpty)
    // the pre-rename victim (parquet field 'k') must stay hidden
    assert(spark.sql("SELECT key FROM grn.db.t7 ORDER BY key")
      .as[Long].collect().toSeq === Seq(1L, 3L, 5L))
    // ... including when the key column is NOT in the projection (the
    // reader must still materialize it under the file-side alias)
    assert(spark.sql("SELECT count(*) FROM grn.db.t7").as[Long].head() === 3L)
    assert(spark.sql("SELECT sum(v) FROM grn.db.t7").as[Double].head() === 9.0)
  }

  test("an append after a rename keeps (and widens) the partition zone map") {
    warehouse
    // the previous zone map is recorded under the PRE-RENAME name; the
    // first post-rename append must translate it through the alias
    // chain before the bound merge — a raw name intersection would come
    // up empty and silently drop this partition's pruning forever
    spark.sql("CREATE TABLE grn.db.t8 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('stats_columns'='k', 'retain'='5')")
    spark.sql("INSERT INTO grn.db.t8 VALUES (10, 1.0, 'a'), (20, 2.0, 'a')")
    spark.sql("ALTER TABLE grn.db.t8 RENAME COLUMN k TO key")
    spark.sql("INSERT INTO grn.db.t8 VALUES (30, 3.0, 'a')") // APPEND
    val st = AtomicTable.rootOpt(Paths.get(warehouse, "db", "t8"))
      .get.stats("a")
    assert(st.rows === 3L)
    assert(st.mins.get("key").map(_.toLong) === Some(10L),
      s"merged zone map must carry the old-name lower bound, got $st")
    assert(st.maxs.get("key").map(_.toLong) === Some(30L),
      s"merged zone map must widen to the appended upper bound, got $st")
  }

  test("an orphaned rename alias from a crashed evolve is inert for MV refresh") {
    warehouse
    spark.sql("CREATE TABLE grn.db.t9 (k BIGINT, v DOUBLE, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO grn.db.t9 VALUES (1, 1.0, 'a')")
    val src = Paths.get(warehouse, "db", "t9").toString
    val schema = spark.table("grn.db.t9").schema
    val mv = Files.createTempDirectory("grn-mv9").resolve("mv").toString
    graft.etl.IncrementalView.create(spark, src, schema, mv,
      Seq("p"), Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"), "p",
      keyCols = Seq("k"))
    // simulate the evolve crash window: the properties commit landed
    // but the meta flip did not — 'v' is still the live declared column
    // and nothing on disk was ever written under 'v2'
    AtomicTable.commitManifest(Paths.get(src), Map.empty,
      properties = Map(GraftSource.RenamePrefix + "v2" -> "v"),
      retain = 10, operation = "evolve")
    spark.sql("INSERT INTO grn.db.t9 VALUES (2, 2.0, 'a')")
    // the staleness check must see the alias is an inert orphan (old
    // name still declared) and fold the new row, not refuse
    graft.etl.IncrementalView.refresh(spark, mv)
    val got = graft.etl.IncrementalView.read(spark, mv)
      .select($"p", $"v_sum".cast("double"))
      .as[(String, Double)].collect().toSeq
    assert(got === Seq(("a", 3.0)), s"got $got")
  }

  test("rename of a grouped view column between refreshes refuses loudly") {
    warehouse
    // the cross-feature seam after the aggregated-column pin: the
    // RENAMED column is the view's GROUP KEY. The changefeed diffs on
    // schema columns, so a silently-stale group key would mis-group
    // the delta — refresh must refuse up front, exactly like the
    // aggregated-column case
    spark.sql("CREATE TABLE grn.db.t10 (k BIGINT, g STRING, v DOUBLE, " +
      "p STRING) PARTITIONED BY (p) TBLPROPERTIES ('retain'='10')")
    spark.sql("INSERT INTO grn.db.t10 VALUES (1, 'x', 1.0, 'a'), " +
      "(2, 'y', 2.0, 'a')")
    val src = Paths.get(warehouse, "db", "t10").toString
    val schema = spark.table("grn.db.t10").schema
    val mv = Files.createTempDirectory("grn-mv10").resolve("mv").toString
    graft.etl.IncrementalView.create(spark, src, schema, mv,
      Seq("p", "g"), Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"), "p",
      keyCols = Seq("k"))
    spark.sql("ALTER TABLE grn.db.t10 RENAME COLUMN g TO grp")
    spark.sql("INSERT INTO grn.db.t10 VALUES (3, 'x', 3.0, 'a')")
    val err = intercept[IllegalStateException] {
      graft.etl.IncrementalView.refresh(spark, mv)
    }
    assert(err.getMessage.contains("renamed after view") &&
      err.getMessage.contains("g"), s"got: ${err.getMessage}")
  }

  test("rename chains compose: a->b then b->c reads all three generations") {
    warehouse
    spark.sql("CREATE TABLE grn.db.t6 (a BIGINT, p STRING) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('retain'='5')")
    Seq((1L, "x")).toDF("a", "p").createOrReplaceTempView("rn_g1")
    spark.sql("INSERT INTO grn.db.t6 SELECT * FROM rn_g1")
    spark.sql("ALTER TABLE grn.db.t6 RENAME COLUMN a TO b")
    Seq((2L, "y")).toDF("b", "p").createOrReplaceTempView("rn_g2")
    spark.sql("INSERT INTO grn.db.t6 SELECT * FROM rn_g2")
    spark.sql("ALTER TABLE grn.db.t6 RENAME COLUMN b TO c")
    Seq((3L, "z")).toDF("c", "p").createOrReplaceTempView("rn_g3")
    spark.sql("INSERT INTO grn.db.t6 SELECT * FROM rn_g3")
    assert(spark.sql("SELECT sum(c) FROM grn.db.t6").as[Long].head() === 6L)
    // and renaming BACK to a name in the chain is refused
    val back = intercept[Exception] {
      spark.sql("ALTER TABLE grn.db.t6 RENAME COLUMN c TO a")
    }
    assert(back.getMessage.contains("stale zone maps"),
      s"got: ${back.getMessage}")
  }
}
