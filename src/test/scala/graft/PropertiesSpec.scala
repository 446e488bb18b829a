package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

import graft.ingest.State
import graft.ops.Multimodal

/** Property-based checks for the pure (non-Spark) kernels — the cases the
  * reference hand-enumerates (SURVEY.md §5): hash key-order invariance,
  * null-safe ε-equality, offset monotonicity, decoder determinism. */
class PropertiesSpec extends SparkSuite {

  private def check(prop: Prop): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  private val jsonScalar: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1000, 1000).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s + "\""),
    Gen.oneOf("true", "false", "null"))

  private val kvPairs: Gen[List[(String, String)]] =
    Gen.listOfN(5, Gen.zip(Gen.identifier.suchThat(_.nonEmpty), jsonScalar))
      .map(_.distinctBy(_._1))

  test("content hash is invariant under object key permutation") {
    check(forAll(kvPairs) { pairs =>
      val asJson = (ps: List[(String, String)]) =>
        ps.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      val shuffled = scala.util.Random.shuffle(pairs)
      State.contentHash(asJson(pairs)) == State.contentHash(asJson(shuffled))
    })
  }

  test("content hash distinguishes different values") {
    check(forAll(Gen.chooseNum(0, 1000000), Gen.chooseNum(0, 1000000)) { (a, b) =>
      (a == b) == (State.contentHash(s"""{"v": $a}""") == State.contentHash(s"""{"v": $b}"""))
    })
  }

  test("offset advance is monotone: result is newest when batch non-empty") {
    val dateGen = Gen.option(Gen.choose(0, 10000).map(d => f"2024-$d%05d"))
    check(forAll(dateGen, dateGen) { (prev, batch) =>
      val out = State.advanceOffset(prev, batch)
      batch match {
        case Some(_) => out == batch
        case None => out == prev
      }
    })
  }

  test("retry invokes at most `attempts` times and returns first success") {
    check(forAll(Gen.choose(1, 5), Gen.choose(0, 7)) { (attempts, failures) =>
      var calls = 0
      val result = try {
        Some(State.retry(attempts = attempts, sleep = _ => ()) {
          calls += 1
          if (calls <= failures) throw new java.io.IOException("boom")
          calls
        })
      } catch { case _: java.io.IOException => None }
      if (failures < attempts) result.contains(failures + 1) && calls == failures + 1
      else result.isEmpty && calls == attempts
    })
  }

  test("stub decoder is deterministic and shape-stable") {
    check(forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)), Gen.choose(1, 64)) {
      (bytes, dim) =>
        val arr = bytes.toArray
        val a = Multimodal.decodeStub(arr, dim)
        val b = Multimodal.decodeStub(arr, dim)
        a.toSeq == b.toSeq && a.length == dim
    })
  }

  test("mp4 parser never throws on arbitrary corruption of a valid file") {
    import graft.ops.Mp4
    val seedGen = Gen.choose(0L, 5000L)
    val flips = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue)))
    // 500 cases, not the default 100: the negative-stsz crash surfaced at
    // roughly 1-in-300 generated corruptions
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500),
      forAll(seedGen, flips) { (seed, muts) =>
        val bytes = Mp4.writeMinimalMp4(seed)
        muts.foreach { case (ix, b) => bytes(ix % bytes.length) = b }
        // contract under corruption: None or a value — never a throw (the
        // byte-range validity check lives in keyframeBytes, also exercised)
        Mp4.parseKeyframes(bytes)
        Mp4.keyframeBytes(bytes)
        true
      })
    assert(result.passed, result.status.toString)
  }

  test("image/audio decode never throws on arbitrary corruption") {
    // same contract (and crash class) as the mp4 fuzz: ImageIO and
    // javax.sound plugins throw RuntimeExceptions on malformed headers;
    // decode must fall back to the stub, not fail the batch
    val seedGen = Gen.choose(0L, 5000L)
    val flips = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 4095), Gen.choose(Byte.MinValue, Byte.MaxValue)))
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300),
      forAll(seedGen, flips) { (seed, muts) =>
        val png = Multimodal.renderPng(seed)
        val wav = Multimodal.renderWav(seed)
        muts.foreach { case (ix, b) =>
          png(ix % png.length) = b
          wav(ix % wav.length) = b
        }
        Multimodal.decode("image", png, 8).length == 8 &&
          Multimodal.decode("audio", wav, 8).length == 8
      })
    assert(result.passed, result.status.toString)
  }

  test("video decode never throws on arbitrary corruption") {
    // the r7 real-frame path: container walk + per-keyframe ImageIO
    // decode. Under corruption, decodeVideoHist must be None-or-value
    // (a frame that no longer decodes poisons the whole payload — all-
    // or-nothing) and decode("video", ...) must fall back to the stub
    // with the declared shape, never throw.
    import graft.ops.Mp4
    val seedGen = Gen.choose(0L, 5000L)
    val flips = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 8191), Gen.choose(Byte.MinValue, Byte.MaxValue)))
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500),
      forAll(seedGen, flips) { (seed, muts) =>
        val bytes = Mp4.writeMinimalMp4(seed)
        muts.foreach { case (ix, b) => bytes(ix % bytes.length) = b }
        Multimodal.decodeVideoHist(bytes, 8).forall(_.length == 8) &&
          Multimodal.decode("video", bytes, 8).length == 8
      })
    assert(result.passed, result.status.toString)
  }

  test("epsilon equality matches the reference truth table (Spark-side)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases = Seq(
      (Some(1.0), Some(1.0), true),
      (Some(1.0), Some(1.0 + 5e-10), true),
      (Some(1.0), Some(1.0 + 2e-9), false),
      (None, None, true),
      (None, Some(1.0), false),
      (Some(1.0), None, false))
    val df = cases.map { case (a, b, exp) => (a, b, exp) }.toDF("a", "b", "expected")
    val got = df.withColumn("got", graft.etl.Merge.valueUnchanged(col("a"), col("b")))
      .collect()
    got.foreach { r =>
      val expected = r.getBoolean(2)
      val actual = Option(r.get(3)).exists(_.asInstanceOf[Boolean])
      assert(actual === expected, s"case $r")
    }
  }
}
