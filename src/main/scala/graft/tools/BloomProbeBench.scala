package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.GraftBloom

/** Measures the DRIVER-side planning cost of the bloom probe at a
  * large zone-admitted file set (r11 watch item #7; r12 verdict weak
  * #3): a point lookup on a bloom column consults one filter per
  * admitted file during split planning (GraftSource.planFromManifest).
  * Since round 13 the probe reads ONE offset-indexed BUNDLE per
  * admitted dir (folded at commit) instead of one 8 KiB sidecar per
  * file, with per-file sidecars as the fallback — this tool measures
  * both, cold and warm, against a full-scan control.
  *
  * The optional third arg simulates object-store GET latency
  * (GraftBloom.simulatedReadDelayMs, applied once per remote read):
  * at 10 ms/GET a 10k-file probe is ~100 s under per-file sidecars and
  * one GET under the bundle — the number that proves planning is
  * bounded by the commit structure, not the file count.
  *
  * Usage: runMain graft.tools.BloomProbeBench [nFiles] [rowsPerFile]
  * [simReadMs] (defaults 10000 x 20 x 0). Prints one JSON line.
  */
object BloomProbeBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(10000)
    val rowsPer = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val simMs = args.drop(2).headOption.map(_.toLong).getOrElse(0L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bloom-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val dir = java.nio.file.Files.createTempDirectory("graft-bloomprobe")
      .resolve("t").toString
    val n = nFiles.toLong * rowsPer
    // id i lands in file (i % nFiles): every file's id range spans the
    // whole key space, so file zone maps admit everything — the probe
    // is the only skipping tier, and it must consult every admitted file
    spark.range(n).select(col("id"), lit("a").as("p"))
      .repartition(nFiles, pmod(col("id"), lit(nFiles.toLong)))
      .write.format("graft").option("partition", "p")
      .option("bloom_columns", "id").option("stats_columns", "id")
      .mode("append").save(dir)

    def timeMs[A](f: => A): (Long, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1000000L, a)
    }
    val key = 7L * nFiles + 3L // lives in exactly one file
    def point(): Long = spark.read.format("graft").load(dir)
      .filter(col("id") === key).count()
    val (fullMs, total) = timeMs(
      spark.read.format("graft").load(dir).count())

    // --- bundled probe (the committed layout): one read per dir
    GraftBloom.clearCaches()
    GraftBloom.simulatedReadDelayMs = simMs
    val (bundleColdMs, c1) = timeMs(point())
    val (bundleWarmMs, c2) = timeMs(point())

    // --- per-file fallback (pre-r13 posture): delete the bundles so
    // the probe pays one read per (file, col) — the object-store
    // worst case the bundle exists to bound
    GraftBloom.simulatedReadDelayMs = 0L
    val dataDir = java.nio.file.Paths.get(dir, "data")
    val walk = java.nio.file.Files.walk(dataDir)
    try walk.filter(_.getFileName.toString == GraftBloom.BundleName)
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
    GraftBloom.clearCaches()
    GraftBloom.simulatedReadDelayMs = simMs
    val (sidecarColdMs, c3) = timeMs(point())
    val (sidecarWarmMs, c4) = timeMs(point())
    GraftBloom.simulatedReadDelayMs = 0L

    require(c1 == 1L && c2 == 1L && c3 == 1L && c4 == 1L && total == n,
      s"probe must find exactly its row: $c1/$c2/$c3/$c4 of $total")
    println(s"""{"metric":"bloom_probe","n_files":$nFiles,""" +
      s""""sim_read_ms":$simMs,"full_scan_ms":$fullMs,""" +
      s""""bundle_cold_ms":$bundleColdMs,"bundle_warm_ms":$bundleWarmMs,""" +
      s""""sidecar_cold_ms":$sidecarColdMs,"sidecar_warm_ms":$sidecarWarmMs}""")
    spark.stop()
  }
}
