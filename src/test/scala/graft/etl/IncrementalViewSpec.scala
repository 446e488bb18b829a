package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Incrementally-maintained aggregate views ([[IncrementalView]]): every
  * refresh must land the view EXACTLY on the full recompute, with cost
  * bounded by the change volume (touched partitions only) and
  * exactly-once version accounting riding the commit. */
class IncrementalViewSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType),
    StructField("p", StringType)))

  private def df(rows: (Long, Double, String)*) = {
    val rdd = spark.sparkContext.parallelize(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)))
    spark.createDataFrame(rdd, schema)
  }

  private val sums = Seq(
    "v_sum" -> "CAST(v AS DECIMAL(18,2))",
    "id_sum" -> "id")

  private def recompute(src: String): Set[(String, java.math.BigDecimal, Long, Long)] =
    IncrementalView.aggregate(
      MergeInto.readMerged(spark, src, schema), Seq("p"), sums)
      .select(col("p"), col("v_sum"), col("id_sum"), col(IncrementalView.RowsCol))
      .as[(String, java.math.BigDecimal, Long, Long)].collect().toSet

  private def viewRows(mv: String): Set[(String, java.math.BigDecimal, Long, Long)] =
    IncrementalView.read(spark, mv)
      .select(col("p"), col("v_sum"), col("id_sum"), col(IncrementalView.RowsCol))
      .as[(String, java.math.BigDecimal, Long, Long)].collect().toSet

  test("refresh lands exactly on the full recompute across insert/rewrite/delete") {
    val src = Files.createTempDirectory("mv-src").toString
    val mv = Files.createTempDirectory("mv-view").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 1.5, "a"), (2L, 2.5, "a"), (5L, 5.0, "b")), "p",
      retain = 100)                                                  // v1
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"))
    assert(viewRows(mv) === recompute(src))

    AtomicTable.appendPartitions(spark, src,
      df((3L, 3.0, "a"), (7L, 7.0, "c")), "p", retain = 100)         // v2
    MergeInto.upsert(spark, src, schema,
      df((2L, 20.0, "a")), Seq("id"), "p", retain = 100)             // v3
    MergeInto.deleteKeys(spark, src, schema,
      Seq((5L, "b")).toDF("id", "p"), Seq("id"), "p", retain = 100)  // v4

    val (m, from, to) = IncrementalView.refresh(spark, mv)
    assert(from === 2L && to === 4L)
    assert(viewRows(mv) === recompute(src))
    assert(viewRows(mv).map(_._1) === Set("a", "c"),
      "partition b's last group must leave the view")
    assert(!m.partitions.contains("b"),
      "the emptied group's view partition drops in the same commit")
    assert(m.properties(IncrementalView.SourceVersionProperty) === "4")

    // already current: no commit, from == to + 1
    val (m2, f2, t2) = IncrementalView.refresh(spark, mv)
    assert(m2.version === m.version && f2 === t2 + 1)
  }

  test("refresh rewrites only the partitions the delta touches") {
    val src = Files.createTempDirectory("mv-src2").toString
    val mv = Files.createTempDirectory("mv-view2").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "c")), "p", retain = 100)
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"))
    val before = AtomicTable.manifest(Paths.get(mv)).get
    AtomicTable.appendPartitions(spark, src,
      df((10L, 10.0, "b")), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    val after = AtomicTable.manifest(Paths.get(mv)).get
    assert(after.partitions("a") === before.partitions("a") &&
      after.partitions("c") === before.partitions("c"),
      "untouched view partitions must carry by reference (same data dirs)")
    assert(after.partitions("b") !== before.partitions("b"))
    assert(viewRows(mv) === recompute(src))
  }

  test("maintenance-only source commits advance the version with a properties-only commit") {
    val src = Files.createTempDirectory("mv-src3").toString
    val mv = Files.createTempDirectory("mv-view3").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 1.0, "a")), "p", retain = 100)
    AtomicTable.appendPartitions(spark, src,
      df((2L, 2.0, "a")), "p", retain = 100)
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"))
    val before = AtomicTable.manifest(Paths.get(mv)).get
    // v3: compaction — rewrites partition a with identical rows
    AtomicTable.compactFragmented(spark, src, schema, "p",
      minFiles = 2, retain = 100)
    val (m, from, to) = IncrementalView.refresh(spark, mv)
    assert(from === 3L && to === 3L)
    assert(m.version === before.version + 1)
    assert(m.partitions === before.partitions,
      "a no-change delta must not restage any view partition")
    assert(m.properties(IncrementalView.SourceVersionProperty) === "3")
    assert(viewRows(mv) === recompute(src))
  }

  test("a sum returns to NULL when deletes remove every non-null contributor") {
    val nullable = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType, nullable = true),
      StructField("p", StringType)))
    def ndf(rows: (Long, java.lang.Double, String)*) = {
      val rdd = spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)))
      spark.createDataFrame(rdd, nullable)
    }
    val src = Files.createTempDirectory("mv-src4").toString
    val mv = Files.createTempDirectory("mv-view4").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      ndf((1L, 1.5, "a"), (2L, null, "a")), "p", retain = 100)
    IncrementalView.create(spark, src, nullable, mv,
      Seq("p"), Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"), "p",
      keyCols = Seq("id"))
    // delete the only non-null contributor; the null row remains
    MergeInto.deleteKeys(spark, src, nullable,
      Seq((1L, "a")).toDF("id", "p"), Seq("id"), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    val rows = IncrementalView.read(spark, mv)
      .select("p", "v_sum", IncrementalView.RowsCol).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "a" && rows(0).isNullAt(1) &&
      rows(0).getLong(2) === 1L,
      "SUM over zero non-null contributors is NULL, and the group stays " +
        "alive while null rows remain")
  }

  test("refresh applies updates by key (pre/post images cancel exactly)") {
    val src = Files.createTempDirectory("mv-src5").toString
    val mv = Files.createTempDirectory("mv-view5").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 10.0, "a"), (2L, 20.0, "a")), "p", retain = 100)
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"))
    // reprice id=2: the feed emits update_preimage(-20) + postimage(+21)
    MergeInto.upsert(spark, src, schema,
      df((2L, 21.0, "a")), Seq("id"), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    assert(viewRows(mv) === recompute(src))
    val r = viewRows(mv).head
    assert(r._2.compareTo(new java.math.BigDecimal("31.00")) === 0 &&
      r._4 === 2L)
  }

  test("a refresh crash before the commit changes nothing; the retry lands once") {
    val src = Files.createTempDirectory("mv-src6").toString
    val mv = Files.createTempDirectory("mv-view6").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 1.0, "a"), (2L, 2.0, "b")), "p", retain = 100)
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"))
    AtomicTable.appendPartitions(spark, src,
      df((3L, 3.0, "a")), "p", retain = 100)
    val before = AtomicTable.manifest(Paths.get(mv)).get
    intercept[RuntimeException] {
      IncrementalView.refresh(spark, mv,
        beforeCommit = () => throw new RuntimeException("torn"))
    }
    val after = AtomicTable.manifest(Paths.get(mv)).get
    assert(after.version === before.version &&
      after.properties(IncrementalView.SourceVersionProperty) === "1",
      "a crash before the swap must leave the view and its version intact")
    // the retry derives the same delta and applies it exactly once
    val (m, from, to) = IncrementalView.refresh(spark, mv)
    assert(from === 2L && to === 2L)
    assert(viewRows(mv) === recompute(src))
    // and a second retry no-ops
    val (m2, f2, t2) = IncrementalView.refresh(spark, mv)
    assert(m2.version === m.version && f2 === t2 + 1)
  }

  test("multi-level view partitioning: refresh touches one (g1,g2) slice") {
    val twoCol = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType),
      StructField("g1", StringType),
      StructField("g2", StringType)))
    def tdf(rows: (Long, Double, String, String)*) = {
      val rdd = spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)))
      spark.createDataFrame(rdd, twoCol)
    }
    val src = Files.createTempDirectory("mv-src7").toString
    val mv = Files.createTempDirectory("mv-view7").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      tdf((1L, 1.0, "x", "m"), (2L, 2.0, "x", "n"), (3L, 3.0, "y", "m")),
      "g1,g2", retain = 100)
    IncrementalView.create(spark, src, twoCol, mv,
      Seq("g1", "g2"), Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"),
      "g1,g2", keyCols = Seq("id"))
    val before = AtomicTable.manifest(Paths.get(mv)).get
    AtomicTable.appendPartitions(spark, src,
      tdf((4L, 4.0, "x", "n")), "g1,g2", retain = 100)
    IncrementalView.refresh(spark, mv)
    val after = AtomicTable.manifest(Paths.get(mv)).get
    assert(after.partitions("x/m") === before.partitions("x/m") &&
      after.partitions("y/m") === before.partitions("y/m"),
      "only the (x, n) slice may restage")
    assert(after.partitions("x/n") !== before.partitions("x/n"))
    val got = IncrementalView.read(spark, mv)
      .select("g1", "g2", "v_sum", IncrementalView.RowsCol)
      .as[(String, String, java.math.BigDecimal, Long)].collect()
      .map(r => (r._1, r._2, r._3.stripTrailingZeros.toPlainString, r._4))
      .toSet
    assert(got === Set(("x", "m", "1", 1L), ("x", "n", "6", 2L),
      ("y", "m", "3", 1L)))
  }

  test("min/max: inserts merge directly, deletes recompute the touched group") {
    val src = Files.createTempDirectory("mv-src8").toString
    val mv = Files.createTempDirectory("mv-view8").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 10.0, "a"), (2L, 30.0, "a"), (3L, 5.0, "b")), "p", retain = 100)
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"),
      extremes = Seq(("v_min", "v", "min"), ("v_max", "v", "max")))
    def minmax(): Map[String, (Double, Double)] =
      IncrementalView.read(spark, mv).select("p", "v_min", "v_max")
        .as[(String, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    assert(minmax() === Map("a" -> (10.0, 30.0), "b" -> (5.0, 5.0)))

    // insert-only: extremes widen without any source rescan
    AtomicTable.appendPartitions(spark, src,
      df((4L, 50.0, "a"), (5L, 1.0, "a")), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    assert(minmax() === Map("a" -> (1.0, 50.0), "b" -> (5.0, 5.0)))

    // delete the current max of a: the group recomputes to the runner-up
    MergeInto.deleteKeys(spark, src, schema,
      Seq((4L, "a")).toDF("id", "p"), Seq("id"), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    assert(minmax() === Map("a" -> (1.0, 30.0), "b" -> (5.0, 5.0)))

    // an update that lowers the max: pre/post both touch the group
    MergeInto.upsert(spark, src, schema,
      df((2L, 2.0, "a")), Seq("id"), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    assert(minmax() === Map("a" -> (1.0, 10.0), "b" -> (5.0, 5.0)))
    assert(viewRows(mv) === recompute(src),
      "the sums stay exact alongside the extremes")
  }

  test("min/max agree with the full recompute after a mixed history") {
    val src = Files.createTempDirectory("mv-src9").toString
    val mv = Files.createTempDirectory("mv-view9").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L to 40L).map(i => (i, (i * 7 % 23).toDouble, s"p${i % 3}")): _*),
      "p", retain = 100)
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"),
      extremes = Seq(("v_min", "v", "min"), ("v_max", "v", "max")))
    AtomicTable.appendPartitions(spark, src,
      df((41L to 60L).map(i => (i, (i * 11 % 29).toDouble, s"p${i % 3}")): _*),
      "p", retain = 100)
    MergeInto.deleteKeys(spark, src, schema,
      (1L to 60L by 4L).map(i => (i, s"p${i % 3}")).toDF("id", "p"),
      Seq("id"), "p", retain = 100)
    MergeInto.upsert(spark, src, schema,
      df((2L, 100.0, "p2"), (6L, -1.0, "p0")), Seq("id"), "p", retain = 100)
    IncrementalView.refresh(spark, mv)
    val got = IncrementalView.read(spark, mv)
      .select("p", "v_min", "v_max").as[(String, Double, Double)]
      .collect().toSet
    val want = IncrementalView.aggregate(
      MergeInto.readMerged(spark, src, schema), Seq("p"), Nil,
      Seq(("v_min", "v", "min"), ("v_max", "v", "max")))
      .select("p", "v_min", "v_max").as[(String, Double, Double)]
      .collect().toSet
    assert(got === want)
    assert(viewRows(mv) === recompute(src))
  }

  test("views cascade: a rollup view over a view refreshes hop by hop") {
    // src --(by p, q)--> mv1 --(rollup by p)--> mv2: an MV is itself an
    // AtomicTable with a changefeed, so the second hop needs nothing new
    val twoCol = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DoubleType),
      StructField("p", StringType),
      StructField("q", StringType)))
    def tdf(rows: (Long, Double, String, String)*) = {
      val rdd = spark.sparkContext.parallelize(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3, r._4)))
      spark.createDataFrame(rdd, twoCol)
    }
    val src = Files.createTempDirectory("mv-csrc").toString
    val mv1 = Files.createTempDirectory("mv-c1").toString + "/mv1"
    val mv2 = Files.createTempDirectory("mv-c2").toString + "/mv2"
    AtomicTable.replacePartitions(spark, src,
      tdf((1L, 1.0, "a", "x"), (2L, 2.0, "a", "y"), (3L, 3.0, "b", "x")),
      "p", retain = 100)
    IncrementalView.create(spark, src, twoCol, mv1,
      Seq("p", "q"), Seq("v_sum" -> "CAST(v AS DECIMAL(18,2))"), "p",
      keyCols = Seq("id"), retain = 100)
    val (d1, _) = IncrementalView.definitionOf(mv1)
    // the rollup sums mv1's materialized v_sum per p (decimal: exact)
    IncrementalView.create(spark, mv1, d1.mvSchema, mv2,
      Seq("p"), Seq("v_total" -> "v_sum",
        "n_rows" -> s"${IncrementalView.RowsCol}"), "p",
      keyCols = Seq("p", "q"), retain = 100)

    def rollup(): Map[String, (String, Long)] =
      IncrementalView.read(spark, mv2)
        .select(col("p"), col("v_total").cast("string"), col("n_rows"))
        .as[(String, String, Long)].collect()
        .map(r => r._1 -> (new java.math.BigDecimal(r._2)
          .stripTrailingZeros.toPlainString, r._3)).toMap
    assert(rollup() === Map("a" -> ("3", 2L), "b" -> ("3", 1L)))

    // mutate the base, refresh hop by hop
    AtomicTable.appendPartitions(spark, src,
      tdf((4L, 10.0, "a", "y"), (5L, 5.0, "c", "z")), "p", retain = 100)
    MergeInto.deleteKeys(spark, src, twoCol,
      Seq((3L, "b")).toDF("id", "p"), Seq("id"), "p", retain = 100)
    IncrementalView.refresh(spark, mv1)
    IncrementalView.refresh(spark, mv2)
    assert(rollup() === Map("a" -> ("13", 3L), "c" -> ("5", 1L)),
      "the rollup must track base mutations through both hops " +
        "(b's last row died, c was born, a grew)")
  }

  test("AVG renders from the maintained sum/count; HLL sketches merge on insert and recompute on delete") {
    val src = Files.createTempDirectory("mv-src-avg").toString
    val mv = Files.createTempDirectory("mv-view-avg").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 10.0, "a"), (2L, 30.0, "a"), (5L, 5.0, "b")), "p",
      retain = 100)                                                  // v1
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"),
      avgs = Seq("v_avg" -> "v_sum"),
      sketches = Seq("id_dist" -> "id"))

    def rows(): Map[String, (Option[Double], Long, Long)] =
      IncrementalView.read(spark, mv)
        .select(col("p"), col("v_avg"), col("id_dist"),
          col(IncrementalView.RowsCol))
        .collect().map(r => r.getString(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
            r.getLong(2), r.getLong(3))).toMap

    assert(rows() === Map(
      "a" -> (Some(20.0), 2L, 2L), "b" -> (Some(5.0), 1L, 1L)))

    // inserts: the avg tracks the new sum/count, the sketch MERGES
    AtomicTable.appendPartitions(spark, src,
      df((3L, 20.0, "a"), (7L, 7.0, "c")), "p", retain = 100)        // v2
    IncrementalView.refresh(spark, mv)
    assert(rows() === Map(
      "a" -> (Some(20.0), 3L, 3L), "b" -> (Some(5.0), 1L, 1L),
      "c" -> (Some(7.0), 1L, 1L)))

    // a delete (negative rows) forces the bounded per-group RECOMPUTE:
    // the dead id must leave the estimate — a merge-only sketch would
    // still count it
    MergeInto.deleteKeys(spark, src, schema,
      Seq((2L, "a")).toDF("id", "p"), Seq("id"), "p", retain = 100)  // v3
    IncrementalView.refresh(spark, mv)
    assert(rows() === Map(
      "a" -> (Some(15.0), 2L, 2L), "b" -> (Some(5.0), 1L, 1L),
      "c" -> (Some(7.0), 1L, 1L)),
      "after the delete, a's sketch must recompute to {1, 3}")
  }

  test("source partition-spec evolution (identity -> bucket) between refreshes stays exact") {
    // the adversarial case: repartitionTable changes the very layout
    // the changefeed diffs by — every row moves dirs in one commit. The
    // feed must express it as delete-all(old keys) + insert-all(new
    // keys), a NET-ZERO delta per group, and the refresh must land the
    // view exactly on the recompute — not double-count, not lose rows,
    // not refuse.
    val src = Files.createTempDirectory("mv-src-evo").toString
    val mv = Files.createTempDirectory("mv-view-evo").toString + "/mv"
    AtomicTable.replacePartitions(spark, src,
      df((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "b"), (8L, 8.0, "c")),
      "p", retain = 100)                                             // v1
    IncrementalView.create(spark, src, schema, mv,
      Seq("p"), sums, "p", keyCols = Seq("id"))
    val before = AtomicTable.manifest(Paths.get(mv)).get

    // v2: identity("p") -> hash-bucket("id_bucket4") full-table rewrite
    AtomicTable.repartitionTable(spark, src, schema, "id_bucket4",
      retain = 100)
    val (m1, f1, t1) = IncrementalView.refresh(spark, mv)
    assert(f1 === 2L && t1 === 2L)
    assert(viewRows(mv) === recompute(src),
      "a net-zero spec-evolution delta must leave the view exact")
    assert(m1.properties(IncrementalView.SourceVersionProperty) === "2")

    // v3: life continues under the NEW layout — appends, then a keyed
    // delete (vector keyed on id, located across bucket segments)
    AtomicTable.appendPartitions(spark, src,
      df((10L, 10.0, "b"), (11L, 11.0, "d")), "id_bucket4", retain = 100)
    MergeInto.deleteKeys(spark, src, schema,
      Seq(8L).toDF("id"), Seq("id"), "id_bucket4", retain = 100)     // v4
    IncrementalView.refresh(spark, mv)
    assert(viewRows(mv) === recompute(src),
      "post-evolution commits must keep refreshing exactly " +
        "(c's last row died, d was born, b grew)")
    assert(viewRows(mv).map(_._1) === Set("a", "b", "d"))
  }
}
