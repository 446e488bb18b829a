package graft.ops

import graft.{SparkSuite, Tables}

class SketchesSpec extends SparkSuite {

  test("HLL cardinality within 5% of exact; approx median within 2% of exact") {
    val rows = Sketches.orderSketches(Tables.orders(spark, sf0001)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approxC, exactC) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approxC - exactC).toDouble / exactC <= 0.05,
        s"HLL error too high: $approxC vs $exactC")
      val (approxP, exactP) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(approxP - exactP) / exactP <= 0.02,
        s"quantile sketch error too high: $approxP vs $exactP")
    }
  }
}
