package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = (1L to 1000L)
    .map(i => (i, if (i % 3 == 0) "en" else "de", i * 7 % 100))
    .toDF("doc_id", "lang", "n_chars")

  test("stratified sample is deterministic and respects per-stratum rates") {
    val once = Sampling.stratifiedSample(docs, "lang", Map("en" -> 30))
    val twice = Sampling.stratifiedSample(docs, "lang", Map("en" -> 30))
    assert(once.select("doc_id").collect().toSet ===
      twice.select("doc_id").collect().toSet)
    val kept = once.groupBy("lang").count().as[(String, Long)].collect().toMap
    // multiplicative-hash buckets are near-uniform: en keeps ~30%, de all
    assert(kept("de") === 667L)
    assert(kept("en") > 60L && kept("en") < 140L,
      s"en kept ${kept("en")} of 333 at rate 30%")
  }

  test("target mixture hits the requested proportions within bucket noise") {
    // input is 1/3 en, 2/3 de; ask for a 70/30 en-heavy OUTPUT mixture:
    // en is the binding stratum (T = 333/0.7 ≈ 476), de downsamples hard
    val out = Sampling.targetMixture(docs, "lang",
      Map("en" -> 0.7, "de" -> 0.3))
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = kept.values.sum.toDouble
    assert(kept("en").toDouble / total > 0.6 && kept("en") / total < 0.8,
      s"achieved mixture $kept is not ~70/30")
    // en binds: essentially all of it survives
    assert(kept("en") > 300L)
    // determinism
    assert(out.select("doc_id").collect().toSet ===
      Sampling.targetMixture(docs, "lang", Map("en" -> 0.7, "de" -> 0.3))
        .select("doc_id").collect().toSet)
    // whitelist semantics: a stratum missing from the spec is dropped
    val only = Sampling.targetMixture(docs, "lang", Map("en" -> 1.0))
    assert(only.filter($"lang" === "de").count() === 0L)
  }

  test("shard assignment is balanced to one row and covers every doc") {
    val sharded = Sampling.assignShards(docs, 7)
    assert(sharded.count() === 1000L)
    val sizes = sharded.groupBy("shard").count()
      .select("count").as[Long].collect()
    assert(sizes.length === 7)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: ${sizes.toList}")
  }

  test("pack sequences: offsets are an exact global prefix sum in id order") {
    val textDocs = (1L to 500L)
      .map(i => (i, ("tok " * ((i % 37).toInt + 1)).trim)) // 1..37 tokens per doc
      .toDF("doc_id", "text")
    val packed = Sampling.packSequences(textDocs, budget = 64L, buckets = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    // continuity: every doc starts exactly where the previous one ended,
    // regardless of the bucket boundaries of the two-phase prefix sum
    packed.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 === a._3 + a._2, s"gap between doc ${a._1} and ${b._1}")
    }
    assert(packed.head._3 === 0L)
    assert(packed.forall(r => r._4 === r._3 / 64L))
  }

  test("connected components merge chained pairs into one cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    // 1~2~3 chain collapses to min id 1 even though (1,3) was never a pair
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(10L) === 10L && comps(11L) === 10L)
  }

  test("driver union-find and distributed loop agree on the same graph") {
    // random-ish graph with chains, cycles, and singleton-pair islands
    val rng = new scala.util.Random(5)
    val pairs = ((0 until 200).map { _ =>
      val a = rng.nextInt(80).toLong
      (a, a + 1 + rng.nextInt(5)) // local edges -> long chains
    } ++ Seq((500L, 501L), (600L, 601L), (601L, 600L))) // islands + dup edge
      .toDF("id_a", "id_b")
    val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .union(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
      .localCheckpoint(true)
    val viaDriver = Dedup.driverCc(spark, edges)
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.distributedCc(spark, edges, maxIter = 50, nEdges = 400L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver === viaLoop)
    assert(viaDriver.nonEmpty)
  }

  test("canonicalize flags every non-keeper copy and only those") {
    val d = Seq(
      (1L, "same text"), (2L, "Same   TEXT"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.canonicalize(d)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out === Array((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  private lazy val budgetDocs = (1L to 400L)
    .map(i => (i, Seq.fill((i % 23 + 1).toInt)("w" + (i * 13 % 97)).mkString(" ")))
    .toDF("doc_id", "text")

  test("tokenBudget two-phase prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val out = Sampling.tokenBudget(budgetDocs, denom = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    val scored = TextStats.classifierScore(budgetDocs)
    val total = scored.agg(sum("n_tokens")).collect().head.getLong(0)
    val w = Window.orderBy(col("act_milli").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = scored
      .withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(4) < total / 5))).toMap
    assert(out === naive)
  }

  test("tokenBudget stays correct AND bucketed on a degenerate score " +
      "distribution (every document identical)") {
    import org.apache.spark.sql.expressions.Window
    // identical texts → one single act_milli value: the adaptive width
    // clamps to 1 and the doc_id sub-buckets must carry the parallelism
    val flat = (1L to 300L).map(i => (i, "same words every time here"))
      .toDF("doc_id", "text")
    val out = Sampling.tokenBudget(flat, denom = 5)
    val p = out.queryExecution.sparkPlan.toString
    val docWindow = p.linesIterator
      .find(l => l.contains("Window [") && l.contains("doc_id"))
      .getOrElse(fail(s"no per-document window in:\n$p"))
    assert(docWindow.contains("_b2#"),
      s"flat scores must fall back to doc_id sub-buckets:\n$docWindow")
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    val scored = TextStats.classifierScore(flat)
    val total = scored.agg(sum("n_tokens")).collect().head.getLong(0)
    val w = Window.orderBy(col("act_milli").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = scored
      .withColumn("cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(4) < total / 5))).toMap
    assert(got === naive)
  }

  test("budgetWidths adapts to the observed score range") {
    // wide range: score buckets alone, ~tb of them, no sub-bucketing
    assert(Sampling.budgetWidths(1000000L, 500L, 256L) ===
      ((1000000L + 255L) / 256L, Long.MaxValue))
    // narrow range: width clamps to 1, doc ids carry the bucket count
    val (ws, wd) = Sampling.budgetWidths(10L, 100000L, 256L)
    assert(ws === 1L)
    assert(wd === (100000L + 255L) / 256L)
    // single score value over few docs: both widths legal and minimal
    assert(Sampling.budgetWidths(1L, 1L, 256L) === ((1L, 1L)))
  }

  test("upsampleToMixture: each source's repeated tokens hit its " +
      "allocation to within one document; absent sources get zero") {
    val docs = (1L to 300L)
      .map(i => (i, Seq.fill((i % 17 + 3).toInt)("w" + (i % 13)).mkString(" "),
        s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val budget = 100000L
    val shares = Map("s0" -> 600000L, "s1" -> 100000L)
    val out = Sampling.upsampleToMixture(docs, shares, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.filter(_._2 == "s2").forall(_._4 === 0L), "s2 not in mixture")
    for ((src, sh) <- shares) {
      val rows = out.filter(_._2 == src)
      val alloc = budget * sh / 1000000L
      val got = rows.map(r => r._3 * r._4).sum
      val maxDoc = rows.map(_._3).max
      assert(got >= alloc, s"$src under-filled: $got < $alloc")
      assert(got < alloc + maxDoc, s"$src overshot by >= one doc")
      // s0's 60% of budget vastly exceeds its one-epoch tokens: multiple
      // full epochs, so every doc repeats at least twice
      if (src == "s0") assert(rows.forall(_._4 >= 2L))
    }
  }

  test("tokenBudget fills the budget: crosses it by at most one document") {
    val rows = Sampling.tokenBudget(budgetDocs, denom = 5)
      .collect()
    val total = rows.map(_.getLong(2)).sum
    val budget = total / 5
    val selTokens = rows.filter(_.getBoolean(4)).map(_.getLong(2)).sum
    val maxDoc = rows.map(_.getLong(2)).max
    assert(selTokens >= budget)          // never stops short
    assert(selTokens < budget + maxDoc)  // overshoot bounded by one doc
  }
}
