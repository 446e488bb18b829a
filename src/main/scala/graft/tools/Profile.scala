// scratch profiler: sbt "runMain graft.tools.Profile <query>... [-sf <dir>]"
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(s"$name: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
