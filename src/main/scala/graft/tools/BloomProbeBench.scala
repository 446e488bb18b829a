package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the DRIVER-side planning cost of the bloom-sidecar probe
  * at a large zone-admitted file set (the r11 verdict's watch item #7):
  * a point lookup on a bloom column loads one 8 KiB sidecar per
  * admitted file on the driver during split planning
  * (GraftSource.planFromManifest), lazily and through a bounded
  * process cache (GraftBloom). This tool builds an N-file
  * single-partition bloom table (keys interleaved so zone maps admit
  * EVERY file — the worst case: only the blooms can skip), then times
  * the same point query cold (every sidecar read from disk) and warm
  * (served from the process cache), against a full-scan control.
  *
  * Usage: runMain graft.tools.BloomProbeBench [nFiles] [rowsPerFile]
  * (defaults 10000 x 20). Prints one JSON line.
  */
object BloomProbeBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(10000)
    val rowsPer = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bloom-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-bloomprobe")
      .resolve("t").toString
    val n = nFiles.toLong * rowsPer
    // id i lands in file (i % nFiles): every file's id range spans the
    // whole key space, so file zone maps admit everything — the probe
    // is the only skipping tier, and it must touch every admitted file
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
    val (coldMs, c1) = timeMs(point())
    val (warmMs, c2) = timeMs(point())
    require(c1 == 1L && c2 == 1L && total == n,
      s"probe must find exactly its row: $c1/$c2 of $total")
    println(s"""{"metric":"bloom_probe","n_files":$nFiles,""" +
      s""""full_scan_ms":$fullMs,"point_cold_ms":$coldMs,""" +
      s""""point_warm_ms":$warmMs}""")
    spark.stop()
  }
}
