package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FROZEN I/O drift-control for [[graft.Bench]] — the canary limb the
  * compute control cannot grow (r13 wrong #2).
  *
  * The r13 driver run demonstrated the blind spot: compute control
  * drift read 1.21 while the actual inflation (63.5 s) was concentrated
  * on the commit-lifecycle family — an fs-stall window that pure
  * compute under-normalizes, so a judge-side re-run was needed to
  * adjudicate. These queries are the missing limb: a frozen SMALL-FILE
  * graft table (the open-cost-dominated shape fs stalls hit hardest)
  * exercised through one append COMMIT, one bloom-bundle POINT read
  * (probe caches dropped each pass so the GETs are real), and one
  * many-file full SCAN. Bench interleaves them with the compute control
  * before each main pass and reports `control_io_total` /
  * `control_io_drift` beside the compute numbers — a stalled window is
  * then attributed compute-vs-I/O in-run. The HEADLINE stays normalized
  * by the COMPUTE control only (unchanged semantics); the I/O drift is
  * the adjudication signal.
  *
  * FREEZE CONTRACT (round 14): as with BenchControl, this file must not
  * change in later rounds; [[Ref]] is the freeze-host
  * `control_io_total` (min over the round-close passes, recorded in
  * BASELINE.md). Override via SPARK_GRAFT_CONTROL_IO_REF only after a
  * hardware change, recorded in BASELINE.md. */
object BenchControlIO {

  /** Freeze-round control_io_total in seconds (round-14 close,
    * min-of-passes, recorded in BASELINE.md). */
  val Ref = 2.706

  /** Table shape: 64 partitions x 4 salted files = 256 small data
    * files + bloom sidecars + per-dir bundles. Deterministic content
    * (pure functions of id); the temp dir is fresh per invocation. */
  final case class Ctx(warehouse: String, table: String, dir: String)

  private val Rows = 100000L

  def setup(spark: SparkSession): Ctx = {
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-bench-ctl-io").toString
    spark.conf.set("spark.sql.catalog.gcio",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcio.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcio.db")
    spark.sql("CREATE TABLE gcio.db.ctl (id BIGINT, v DOUBLE, s STRING, " +
      "p STRING) PARTITIONED BY (p) TBLPROPERTIES (" +
      "'write_salt'='id:4', 'bloom_columns'='id', 'stats_columns'='id', " +
      "'retain'='3')")
    spark.range(Rows)
      .select(col("id"),
        (pmod(xxhash64(col("id")), lit(1000L))).cast("double").as("v"),
        concat(lit("io-"), col("id")).as("s"),
        (col("id") % 64L).cast("string").as("p"))
      .createOrReplaceTempView("ctl_io_src")
    spark.sql("INSERT INTO gcio.db.ctl SELECT * FROM ctl_io_src")
    Ctx(warehouse, "gcio.db.ctl",
      java.nio.file.Paths.get(warehouse, "db", "ctl").toString)
  }

  /** The frozen I/O query set. Each is an ACTION (commits mutate the
    * control table; reads drop the probe caches first so the bundle and
    * manifest GETs are paid, not served from memory). The append grows
    * the table by 640 rows per pass — bounded by the pass count and
    * irrelevant to the timings (the commit cost is the lifecycle, not
    * the 640 rows). */
  def queries(spark: SparkSession, ctx: Ctx): Seq[(String, () => Unit)] = Seq(
    "ctl_io_commit" -> { () =>
      // one append COMMIT: stage parquet + sidecars into a txn dir,
      // fold bundles, read + claim + write the manifest root
      spark.range(640L)
        .select((col("id") + 10000000L).as("id"),
          lit(0.5).as("v"), lit("io-a").as("s"),
          (col("id") % 64L).cast("string").as("p"))
        .createOrReplaceTempView("ctl_io_append")
      spark.sql(s"INSERT INTO ${ctx.table} SELECT * FROM ctl_io_append")
      ()
    },
    "ctl_io_point" -> { () =>
      // bloom-bundle point probe with COLD probe caches: one bundle GET
      // per admitted dir + the admitted file's footer and pages
      graft.sources.GraftBloom.clearCaches()
      val n = spark.sql(
        s"SELECT count(*) FROM ${ctx.table} WHERE id = 4099").head().getLong(0)
      require(n == 1L, s"control point read found $n rows")
    },
    "ctl_io_scan" -> { () =>
      // 256+ small files opened end-to-end: the open-cost-dominated
      // shape a stalled fs inflates first
      val n = spark.sql(s"SELECT count(*), sum(v) FROM ${ctx.table}")
        .head().getLong(0)
      require(n >= Rows, s"control scan saw $n rows")
    })
}
