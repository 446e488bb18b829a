package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR. Each query is fully materialized through the noop
  * sink (forces every operator, unlike count() which can prune). A generic
  * warmup query runs first so JVM classloading + first-codegen cost is not
  * attributed to whichever query happens to run first.
  *
  * Default is TWO interleaved passes with per-query MIN as the headline:
  * this host occasionally stalls for minutes, inflating whichever queries
  * are in flight 10-100x (r4 and r5 each produced phantom 15-20 s
  * "regressions" that re-measurement erased), and interleaved passes
  * bound a stall's damage to one pass per query. Single-pass wall is now
  * ~190 s at sf0.1, so two passes fit the driver budget that DNF'd the
  * wider r2-r3 surfaces. Override with SPARK_GRAFT_BENCH_PASSES. Raw
  * per-pass numbers stay in the JSON for audit. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
    // Shuffle-partition sizing is DATA-SCALE CONFIGURATION, not an
    // engine constant: at the 500x corpus the 32-partition default
    // spills (text_bm25 122.7s -> 36.6s, dedup_minhash 80.7s ->
    // 22.8s once widened), while at sf0.1 starting 512-wide costs
    // +47% in map-side bucket overhead across 150 sub-second
    // shuffles. The scale protocol sizes it per decade via this
    // knob; deployments size it to their cluster, as Spark intends.
    // Set ONLY when the scale protocol asks: explicitly configuring
    // initialPartitionNum — even to the same value as
    // shuffle.partitions — measurably changes AQE's coalescing around
    // the streaming queries' auxiliary batch stages (r11 bisect:
    // ev_asof_stream_wm 2.28s unset vs 2.92s set-to-32, same build).
    val spark = sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS")
      .fold(builder)(n => builder.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-FAMILY width is per-INVOCATION configuration, deliberately
    // NOT a per-query runtime toggle: r12 measured that flipping
    // initialPartitionNum via spark.conf.set around single queries is
    // not equivalent to setting it at session build (text_bm25 at the
    // 1000x corpus: 72.1 s with the env set globally vs 91.6 s toggled
    // standalone vs 312 s toggled inside a mixed panel) — the same
    // non-local AQE behavior the r11 ev_asof bisect found. The scale
    // protocol therefore runs one invocation per width group
    // (SPARK_GRAFT_ONLY selects the group, SPARK_GRAFT_INITIAL_PARTITIONS
    // sets its width); see BASELINE.md round-12.

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop caches a query persisted (LSH candidate tables) so heap
      // pressure never accumulates across the suite
      spark.catalog.clearCache()
      // progress to stderr (stdout stays the single JSON line): long runs
      // on this stall-prone host are otherwise indistinguishable from hangs
      System.err.println(f"[bench] $name%-28s $sec%8.2fs")
      sec
    }

    // Warmup: exercise scan/join/agg/sort codegen paths once, untimed.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Local-iteration filter (same contract as Verify's SPARK_GRAFT_ONLY):
    // the driver never sets it, so headline runs cover the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // DRIFT CANARY (frozen at round 13, see tools/BenchControl.scala):
    // pure-Spark control queries over a deterministic spark.range-derived
    // table, one control pass interleaved BEFORE each main pass in this
    // same session. The headline is then reported raw AND normalized by
    // the control's ratio to its freeze-round value, so host-window
    // drift is measured by a standing in-run control instead of
    // adjudicated by one-off experiments after the fact. On for full
    // (headline) runs; SPARK_GRAFT_ONLY subsets skip it unless
    // SPARK_GRAFT_CONTROL=1 forces it.
    val controlOn = sys.env.get("SPARK_GRAFT_CONTROL") match {
      case Some(v) => v != "0"
      case None => only.isEmpty
    }
    val controlPath = if (controlOn) tools.BenchControl.setup(spark) else ""
    val controlQs =
      if (controlOn) tools.BenchControl.queries(spark, controlPath) else Nil
    val byControl = scala.collection.mutable.Map(
      controlQs.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    // I/O limb (frozen at round 14, tools/BenchControlIO.scala): the
    // compute control cannot see fs-stall windows (r13: drift 1.21 vs a
    // 15x commit-family inflation), so a small-file commit + cold point
    // probe + many-file scan run beside it and report their own drift.
    // The headline normalization stays COMPUTE-drift-based; the I/O
    // drift attributes a stalled window in-run.
    val ioCtx = if (controlOn) Some(tools.BenchControlIO.setup(spark)) else None
    val ioQs = ioCtx.map(c => tools.BenchControlIO.queries(spark, c))
      .getOrElse(Nil)
    val byIo = scala.collection.mutable.Map(
      ioQs.map { case (n, _) => n -> Vector.empty[Double] }: _*)

    val byQuery = scala.collection.mutable.Map(
      names.map(n => n -> Vector.empty[Double]): _*)
    for (_ <- 1 to passes) {
      for ((cn, q) <- controlQs) {
        val t0 = System.nanoTime()
        try q().write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $cn failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $cn%-28s $sec%8.2fs")
        byControl(cn) = byControl(cn) :+ sec
      }
      for ((cn, act) <- ioQs) {
        val t0 = System.nanoTime()
        try act()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $cn failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $cn%-28s $sec%8.2fs")
        byIo(cn) = byIo(cn) :+ sec
      }
      for (n <- names) byQuery(n) = byQuery(n) :+ materialize(n)
    }

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2.0
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    // Headline = per-query MINIMUM across interleaved passes: this host's
    // stall windows (measured 10-100x inflation) can land on the same
    // query in two of three passes, so the median still carries stall
    // time; the minimum of interleaved passes is the least-contended
    // observation of each query. Medians + raw passes stay in the JSON
    // for audit.
    val mins = names.map(n => n -> byQuery(n).min)
    val medians = names.map(n => n -> median(byQuery(n)))
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val raw = names.map { n =>
      "\"" + n + "\":[" + byQuery(n).map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    val totalMedian = medians.map(_._2).sum
    // control block: per-query mins, the summed control_total, its ratio
    // to the freeze-round reference, and the drift-normalized headline
    // (`value` stays the raw measurement; comparisons should read
    // `total_normalized` when control_drift strays from 1.0)
    val controlJson = if (controlQs.isEmpty) "" else {
      val cmins = controlQs.map { case (n, _) => n -> byControl(n).min }
      val ctotal = cmins.map(_._2).sum
      val cref = sys.env.get("SPARK_GRAFT_CONTROL_REF").map(_.toDouble)
        .getOrElse(tools.BenchControl.Ref)
      val drift = ctotal / cref
      val ioJson = if (ioQs.isEmpty) "" else {
        val iomins = ioQs.map { case (n, _) => n -> byIo(n).min }
        val iototal = iomins.map(_._2).sum
        val ioref = sys.env.get("SPARK_GRAFT_CONTROL_IO_REF").map(_.toDouble)
          .getOrElse(tools.BenchControlIO.Ref)
        s""","control_io":${obj(iomins)},"control_io_total":${fmt(iototal)},"control_io_ref":${fmt(ioref)},"control_io_drift":${fmt(iototal / ioref)}"""
      }
      s""","control":${obj(cmins)},"control_total":${fmt(ctotal)},"control_ref":${fmt(cref)},"control_drift":${fmt(drift)},"total_normalized":${fmt(total / drift)}$ioJson"""
    }
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${obj(mins)},"medians":${obj(medians)},"total_median":${fmt(totalMedian)},"passes":$raw,"n_passes":$passes$controlJson,"sf":"$sfDir"}"""
    println(json)
    // ALSO persist the full JSON as a repo artifact: the driver's capture
    // of stdout has truncated the tail before (r6 lost its headline), and
    // a /tmp copy does not survive a wipe. SPARK_GRAFT_BENCH_OUT overrides
    // the destination; failures to write never fail the bench.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full_latest.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
