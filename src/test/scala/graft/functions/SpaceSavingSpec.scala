package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SpaceSavingSpec extends SparkSuite {
  import spark.implicits._

  test("exact when capacity covers the vocabulary, any partitioning") {
    val toks = (1 to 500).map(i => s"t${i % 7}")
    val df = toks.toDF("token").repartition(8)
    val hh = udaf(new SpaceSavingTopK(capacity = 16, k = 3))
    val out = df.agg(hh($"token").as("topk"))
      .select(explode($"topk").as("tc"))
      .select($"tc.token", $"tc.cnt").as[(String, Long)].collect().toMap
    // 500 over 7 values: t1..t3 get 72, t4..t6 71, t0 71; top-3 = t1,t2,t3
    assert(out === Map("t1" -> 72L, "t2" -> 72L, "t3" -> 72L))
  }

  test("state stays bounded and the dominant item survives eviction") {
    // vocabulary 1000 >> capacity 32; one token is 50% of the stream
    val toks = (1 to 4000).map(i => if (i % 2 == 0) "hot" else s"cold$i")
    val agg = new SpaceSavingTopK(capacity = 32, k = 1)
    val buf = toks.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size <= 32)
    val top = agg.finish(buf).head
    assert(top.token === "hot")
    // space-saving never undercounts: reported >= true count
    assert(top.cnt >= 2000L)
  }

  test("merge is associative with reduce (partial aggregation safe)") {
    val a = (1 to 100).map(_ => "x") ++ (1 to 40).map(i => s"a$i")
    val b = (1 to 60).map(_ => "x") ++ (1 to 40).map(i => s"b$i")
    val agg = new SpaceSavingTopK(capacity = 128, k = 1)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged).head === TokenCount("x", 160L))
  }
}
