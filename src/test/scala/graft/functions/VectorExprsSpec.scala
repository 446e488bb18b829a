package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSuite {
  import org.apache.spark.sql.{functions => F}

  private def floats(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("dot matches the sequential HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq((floats(1, 2, 3), floats(4, 5, 6)),
      (floats(0.1, -0.2, 0.3), floats(-0.4, 0.5, 0.6))).toDF("a", "b")
    val hof = F.aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorExprs.dot(col("a"), col("b")).as("fast"), hof.as("slow"))
      .collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("maxAbs is exact and NaN-propagating") {
    import spark.implicits._
    val df = Seq(
      (1L, floats(1, -7, 3)),
      (2L, Array(2.0f, Float.NaN, -1.0f))).toDF("id", "v")
    val out = df.select(col("id"), VectorExprs.maxAbs(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 7.0)
    assert(out(2L).isNaN) // a poisoned vector must surface, not be dropped
  }

  test("array<int> input is an analysis error, not garbage doubles") {
    import spark.implicits._
    val df = Seq((Array(1, 2, 3), Array(4, 5, 6))).toDF("a", "b")
    val e = intercept[AnalysisException] {
      df.select(VectorExprs.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>"))
    val e2 = intercept[AnalysisException] {
      df.select(VectorExprs.maxAbs(col("a"))).collect()
    }
    assert(e2.getMessage.contains("array<float>"))
  }

  test("registration is once-per-session (no replace on repeat)") {
    VectorExprs.register(spark)
    val reg = spark.sessionState.functionRegistry
    assert(reg.functionExists(FunctionIdentifier("graft_dot")))
    val before = reg.lookupFunctionBuilder(FunctionIdentifier("graft_dot")).get
    VectorExprs.register(spark) // must be a no-op, not a replace
    val after = reg.lookupFunctionBuilder(FunctionIdentifier("graft_dot")).get
    // same builder instance proves no re-registration (no WARN) happened
    assert(before eq after)
  }
}
