package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Columnar-vs-row leaf decode throughput for the graft DSv2 format
  * (r13 verdict #1): every pruning tier was already metadata-bounded,
  * but the bytes that SURVIVED pruning decoded through parquet-mr's
  * row-at-a-time example API. This tool measures the same full-table
  * SQL scans under both leaf readers — the JVM property
  * `graft.scan.columnar=false` forces the row path — so the win is a
  * number in BASELINE.md, not a claim.
  *
  * Usage: runMain graft.tools.ScanThroughputBench [rows] [passes]
  * (defaults 10,000,000 x 3). Prints one JSON line (per-query min ms).
  */
object ScanThroughputBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scan-throughput")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-scanbench").toString
    spark.conf.set("spark.sql.catalog.gst",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gst.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.db")
    // 4 partitions x 8 files: enough splits to keep 32 cores busy, data
    // shaped like a fact table (ints, doubles, a string, a decimal)
    spark.sql("CREATE TABLE gst.db.fact (id BIGINT, v DOUBLE, w DOUBLE, " +
      "s STRING, dec DECIMAL(12,2), p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('write_salt'='id:8', 'retain'='2')")
    spark.range(rows).select(col("id"), (col("id") % 9973 * 0.5).as("v"),
      rand(42).as("w"), concat(lit("payload-"), col("id") % 100000).as("s"),
      (col("id") % 100000).cast("decimal(12,2)").as("dec"),
      (col("id") % 4).cast("string").as("p"))
      .createOrReplaceTempView("fact_src")
    // time the WRITE too (the task writers’ parquet encode is the
    // other half of the r13 leaf-decode finding)
    val writeT0 = System.nanoTime()
    spark.sql("INSERT INTO gst.db.fact SELECT * FROM fact_src")
    val writeMs = (System.nanoTime() - writeT0) / 1000000L

    val queries: Seq[(String, String)] = Seq(
      "wide_agg" -> ("SELECT sum(id) a, sum(v) b, avg(w) c, " +
        "sum(length(s)) d, sum(dec) e FROM gst.db.fact"),
      "narrow_agg" -> "SELECT sum(v) a FROM gst.db.fact",
      "filter_count" -> ("SELECT count(*) a FROM gst.db.fact " +
        "WHERE v < 1000.0 AND s LIKE 'payload-1%'"),
      "group_by" -> ("SELECT p, count(*) a, sum(v) b FROM gst.db.fact " +
        "GROUP BY p"))

    def timeMs(sql: String): Long = {
      val t0 = System.nanoTime()
      spark.sql(sql).collect()
      (System.nanoTime() - t0) / 1000000L
    }
    def run(label: String): Map[String, Long] = {
      queries.foreach { case (_, q) => spark.sql(q).collect() } // warmup
      queries.map { case (name, q) =>
        name -> (0 until passes).map(_ => timeMs(q)).min
      }.toMap
    }

    // sanity: both paths must agree on the answers
    def fingerprint(): Seq[String] =
      queries.map { case (_, q) => spark.sql(q).collect().mkString("|") }

    System.setProperty("graft.scan.columnar", "false")
    val rowFp = fingerprint()
    val rowMs = run("row")
    System.setProperty("graft.scan.columnar", "true")
    val colFp = fingerprint()
    require(rowFp == colFp, s"row/columnar answers diverge:\n$rowFp\n$colFp")
    val colMs = run("columnar")

    val qjson = queries.map { case (name, _) =>
      val r = rowMs(name); val c = colMs(name)
      f""""$name":{"row_ms":$r,"columnar_ms":$c,"speedup":${r.toDouble / c}%.2f}"""
    }.mkString(",")
    // ---- DV phase (r14): the same scans over OUTSTANDING delete
    // vectors. The scan must plan row-based either way (a batch cannot
    // subtract keys), but the vectorized row path keeps the columnar
    // DECODE and probes the key vectors per row; the kill switch is
    // again the before-lever (it routes the row path to the parquet-mr
    // Group reader).
    val factSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("dec",
        org.apache.spark.sql.types.DecimalType(12, 2)),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.StringType)))
    graft.etl.MergeInto.deleteKeysMor(spark,
      java.nio.file.Paths.get(warehouse, "db", "fact").toString, factSchema,
      spark.range(rows).filter(col("id") % 101 === 0)
        .select(col("id"), (col("id") % 4).cast("string").as("p")),
      Seq("id"), "p", retain = 2)

    System.setProperty("graft.scan.columnar", "false")
    val dvRowFp = fingerprint()
    val dvRowMs = run("dv_row")
    System.setProperty("graft.scan.columnar", "true")
    val dvVecFp = fingerprint()
    require(dvRowFp == dvVecFp,
      s"DV row/vectorized answers diverge:\n$dvRowFp\n$dvVecFp")
    require(dvRowFp != rowFp, "the MOR delete must change the answers")
    val dvVecMs = run("dv_vectorized")

    val dvjson = queries.map { case (name, _) =>
      val r = dvRowMs(name); val c = dvVecMs(name)
      f""""$name":{"group_ms":$r,"vectorized_ms":$c,"speedup":${r.toDouble / c}%.2f}"""
    }.mkString(",")
    println(s"""{"metric":"scan_throughput","rows":$rows,"passes":$passes,""" +
      s""""write_ms":$writeMs,"queries":{$qjson},"dv_queries":{$dvjson}}""")
    spark.stop()
  }
}
