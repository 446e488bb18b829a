package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the FINAL (post-AQE) executed plan for the named queries: the
  * pre-execution `explain` shows `isFinalPlan=false` and hides runtime
  * exchange/stage reuse, so plan-shape claims (scan counts, join strategy
  * swaps, ReusedExchange) must be read from this output instead. The query
  * is materialized through the noop sink first (same action as Bench), then
  * the underlying QueryExecution's adaptive plan is printed. Scratch tool —
  * the driver never runs it. Usage: runMain graft.tools.ExplainFinal
  * <name...> [with SPARK_GRAFT_SF_DIR, default sf0.01] */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // Execute the df's own plan (collect finalizes every AQE stage of
      // THIS QueryExecution; a noop write would plan a separate one).
      df.collect()
      println(df.queryExecution.executedPlan.toString)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
