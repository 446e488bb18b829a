package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class SaltingSpec extends SparkSuite {

  test("salted two-phase aggregation equals the direct group-by exactly") {
    val li = Tables.lineitem(spark, sf0001)
    val salted = Salting.saltedSumCount(li, Seq("l_returnflag"),
        Seq(col("l_quantity").cast("decimal(18,2)") -> "sum_qty"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).sortBy(_._1)
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue())).sortBy(_._1)
    assert(salted === direct)
  }
}
