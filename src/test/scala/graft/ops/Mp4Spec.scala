package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class Mp4Spec extends AnyFunSuite {

  test("writer emits a parseable box tree; parser recovers the generative layout") {
    for (seed <- Seq(0L, 2L, 5L, 11L, 1234L)) {
      val bytes = Mp4.writeMinimalMp4(seed)
      assert(new String(bytes, 4, 4, "US-ASCII") === "ftyp")
      val n = Mp4.sampleCount(seed)
      val kfs = Mp4.parseKeyframes(bytes)
        .getOrElse(fail(s"seed $seed did not parse"))
      // sync samples 1, 5, 9... up to n
      assert(kfs.map(_.sampleIx) === (1 to n by Mp4.SyncEvery))
      kfs.foreach { k =>
        assert(k.ptsMs === (k.sampleIx - 1).toLong * Mp4.FrameDeltaMs)
        assert(k.size === Mp4.sampleSize(seed, k.sampleIx - 1).toLong)
        val expectedOffset = Mp4.FirstSampleOffset +
          (0 until k.sampleIx - 1).map(Mp4.sampleSize(seed, _).toLong).sum
        assert(k.offset === expectedOffset)
        // the byte range is in bounds and starts with a real PNG frame
        assert(k.offset + k.size <= bytes.length)
        assert(bytes(k.offset.toInt) === 0x89.toByte)
        assert(new String(bytes, k.offset.toInt + 1, 3, "US-ASCII") === "PNG")
      }
    }
  }

  test("keyframeBytes concatenates exactly the sync-sample payload ranges") {
    val seed = 7L
    val bytes = Mp4.writeMinimalMp4(seed)
    val kf = Mp4.keyframeBytes(bytes).get
    assert(kf.length === Mp4.parseKeyframes(bytes).get.map(_.size).sum)
    // first keyframe starts at the first sample: its PNG signature
    assert(kf(0) === 0x89.toByte)
  }

  test("corrupt and truncated inputs return None, never throw") {
    val good = Mp4.writeMinimalMp4(3L)
    assert(Mp4.parseKeyframes(Array.empty[Byte]).isEmpty)
    assert(Mp4.parseKeyframes("not an mp4 at all".getBytes("UTF-8")).isEmpty)
    assert(Mp4.parseKeyframes(good.take(good.length / 2)).isEmpty) // moov gone
    // flip the moov type tag so the path walk fails cleanly
    val broken = good.clone()
    val moovAt = {
      var p = 0
      var at = -1
      while (at < 0 && p + 8 <= broken.length) {
        if (new String(broken, p + 4, 4, "US-ASCII") == "moov") at = p
        else p += java.nio.ByteBuffer.wrap(broken, p, 4).getInt
      }
      at
    }
    broken(moovAt + 4) = 'X'.toByte
    assert(Mp4.parseKeyframes(broken).isEmpty)
  }

  test("negative corrupted stsz size returns None (fuzz regression)") {
    // scalacheck-found: seed 3393 with byte 1593 -> -1 flips a stsz entry
    // negative; the inverted copyOfRange bounds threw IllegalArgumentException
    val bytes = Mp4.writeMinimalMp4(3393L)
    bytes(1593 % bytes.length) = -1
    assert(Mp4.parseKeyframes(bytes).forall(_ => true)) // must not throw
    assert(Mp4.keyframeBytes(bytes).forall(_ => true))
  }

  test("video decode routes through real frame decode (not the stub)") {
    val bytes = Mp4.writeMinimalMp4(5L)
    val viaDecode = Multimodal.decode("video", bytes, 8).toSeq
    // real path: normalized summed keyframe histograms — a distribution
    assert(math.abs(viaDecode.sum - 1.0f) < 1e-5)
    val counts = Multimodal.decodeVideoHist(bytes, 8).get
    val total = counts.sum.toFloat
    assert(viaDecode === counts.map(_ / total).toSeq)
    assert(viaDecode !== Multimodal.decodeStub(bytes, 8).toSeq)
    // corrupt bytes still fall back to the stub, never throw
    val junk = "not a container".getBytes("UTF-8")
    assert(Multimodal.decode("video", junk, 8).toSeq ===
      Multimodal.decodeStub(junk, 8).toSeq)
  }
}
