package graft.ops

import graft.{SparkSuite, Tables}

class SketchesSpec extends SparkSuite {

  test("HLL cardinality within 5% of exact; approx median within 2% of exact") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf0001)
    val approx = Sketches.orderSketches(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = orders.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("c"),
        expr("percentile(o_totalprice, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.nonEmpty && approx.keySet === exact.keySet)
    approx.foreach { case (k, (approxC, approxP)) =>
      val (exactC, exactP) = exact(k)
      assert(math.abs(approxC - exactC).toDouble / exactC <= 0.05,
        s"HLL error too high for $k: $approxC vs $exactC")
      assert(math.abs(approxP - exactP) / exactP <= 0.02,
        s"quantile sketch error too high for $k: $approxP vs $exactP")
    }
  }

  test("sketch_bounds driver query is all-true (its oracle is constant-true)") {
    val rows = graft.SparkEntry.queries("sketch_bounds")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(1) && r.getBoolean(2)),
      rows.map(_.toString).mkString(", "))
  }
}
