package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registry query — the
  * .explain("formatted") loop the build rules call for (scratch tool,
  * driver never runs it). Usage: runMain graft.tools.ExplainOne <name> [sfDir] */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
