package graft.ops

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

import graft.{SparkSuite, Tables}

class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.syntheticMediaFrom(Tables.documents(spark, sf0001))

  test("media table carries the binary + typed-metadata contract") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(media.count() === 500)
  }

  test("feature extraction is deterministic with the declared dim") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(m => m.media_id -> m.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(m => m.media_id -> m.features.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length === 16))
    assert(f1.values.exists(_.exists(_ != 0f))) // non-trivial features
  }

  test("decode partitions are kind-contiguous AND kinds parallelize") {
    // AQE rightly coalesces this tiny corpus to one partition per kind;
    // disable coalescing to observe the underlying range spread (what a
    // real-size corpus would get)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    val perPartitionKinds =
      try Multimodal.extractFeatures(media, dim = 4)
        .mapPartitions(it => Iterator.single(it.map(_.kind).toSet))(
          org.apache.spark.sql.Encoders.kryo[Set[String]])
        .collect()
      finally spark.conf.set(key, prev)
    // codec locality: at most kinds-1 boundary partitions mix two codecs
    assert(perPartitionKinds.count(_.size > 1) <= 2,
      s"too many mixed partitions: ${perPartitionKinds.toSeq}")
    // parallelism: the work does NOT collapse to one partition per kind —
    // at least one kind spans several partitions (the 100 TB contract)
    val spans = Seq("image", "audio", "video")
      .map(k => perPartitionKinds.count(_.contains(k)))
    assert(spans.exists(_ > 1), s"kinds collapsed to single partitions: $spans")
    Seq("image", "audio", "video").foreach { kind =>
      assert(perPartitionKinds.exists(_.contains(kind)))
    }
  }

  test("real ImageIO decode: solid PNG gives a one-bin histogram") {
    // solid color -> every pixel lands in the same luminance bin
    val bytes = Multimodal.renderPng(seed = 7L)
    val img = Multimodal.decodeImage(bytes)
    assert(img.isDefined && img.get.getWidth === 16 && img.get.getHeight === 16)
    val f = Multimodal.imageFeatures(img.get, dim = 16)
    assert(f.sum === 1.0f +- 1e-6f)
    assert(f.count(_ > 0f) === 1)
    assert(f.max === 1.0f +- 1e-6f)
  }

  test("features are codec-independent: BMP and PNG of same pixels agree") {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, (x * 64) << 16 | (y * 64) << 8 | 0x20)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val viaPng = Multimodal.decode("image", enc("png"), dim = 8)
    val viaBmp = Multimodal.decode("image", enc("bmp"), dim = 8)
    assert(viaPng.toSeq === viaBmp.toSeq)
    assert(viaPng.sum === 1.0f +- 1e-6f)
  }

  test("real WAV decode: constant sine gives a flat RMS envelope") {
    val bytes = Multimodal.renderWav(seed = 3L)
    val samples = Multimodal.decodeAudio(bytes)
    assert(samples.isDefined && samples.get.length === 400)
    val f = Multimodal.audioFeatures(samples.get, dim = 8)
    // fixed-amplitude sine: every window has the same RMS (~12000/32768/sqrt2)
    val expected = 12000.0 / 32768.0 / math.sqrt(2)
    f.foreach(v => assert(math.abs(v - expected) < 0.02))
  }

  test("silence decodes to an all-zero envelope") {
    val pcm = new Array[Short](256)
    assert(Multimodal.audioFeatures(pcm, dim = 4).forall(_ === 0f))
  }

  test("undecodable image bytes fall back to the stub, not an error") {
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.decode("image", junk, 8).toSeq ===
      Multimodal.decodeStub(junk, 8).toSeq)
  }

  test("extractFeatures routes image rows through the real decoder") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    // synthetic image payloads are solid PNGs: normalized one-bin histograms
    images.foreach { m =>
      assert(math.abs(m.features.sum - 1.0f) < 1e-5)
      assert(m.features.count(_ > 0f) === 1)
    }
    // audio rows through the real WAV path: RMS envelope values in [0,1]
    val audio = feats.filter(_.kind == "audio")
    assert(audio.nonEmpty)
    audio.foreach(m => assert(m.features.forall(v => v >= 0f && v <= 1f)))
    // video rows through the real container+frame decode: summed
    // keyframe histograms normalized to a pixel distribution
    val video = feats.filter(_.kind == "video")
    assert(video.nonEmpty)
    video.foreach(m => assert(math.abs(m.features.sum - 1.0f) < 1e-5))
  }

  test("integer features: WAV roundtrip matches direct sine energies exactly") {
    // the oracle contract: decode(renderWav(seed)) must reproduce the
    // generator's samples bit-for-bit, so window energies equal those
    // computed straight from the sine — no container/codec slack at all
    for (seed <- Seq(1L, 4L, 16L)) {
      val decoded = Multimodal.decodeAudio(Multimodal.renderWav(seed)).get
      val direct = Array.tabulate(400) { i =>
        val freq = 200.0 + math.floorMod(seed, 17L) * 50.0
        (math.sin(2 * math.Pi * freq * i / 8000.0) * 12000).toInt.toShort
      }
      assert(decoded.toSeq === direct.toSeq)
      assert(Multimodal.audioWindowEnergies(decoded, 16).toSeq ===
        Multimodal.audioWindowEnergies(direct, 16).toSeq)
    }
  }

  test("integer features: solid PNG yields one 256-count histogram bin") {
    val img = Multimodal.decodeImage(Multimodal.renderPng(seed = 9L)).get
    val counts = Multimodal.imageHistCounts(img, dim = 16)
    assert(counts.sum === 256L)
    assert(counts.count(_ != 0L) === 1)
  }

  test("extractIntFeatures: every kind decodes to exact integer features") {
    val feats = Multimodal.extractIntFeatures(media, dim = 16).collect()
    assert(feats.filter(_.kind == "image").forall(_.features.sum == 256L))
    assert(feats.filter(_.kind == "audio").forall(_.features.exists(_ > 0L)))
    // video: 256 pixels per decoded keyframe, keyframes = ceil(n/4)
    val video = feats.filter(_.kind == "video")
    assert(video.nonEmpty)
    video.foreach { m =>
      val n = Mp4.sampleCount(m.media_id)
      val nkf = (n + Mp4.SyncEvery - 1) / Mp4.SyncEvery
      assert(m.features.sum === 256L * nkf)
    }
  }

  test("decodeVideoHist equals per-frame histograms of the generative colors") {
    val seed = 8L // 8 % 3 == 2 -> a video id in the synthetic table
    val hist = Multimodal.decodeVideoHist(Mp4.writeMinimalMp4(seed), 16).get
    val expected = new Array[Long](16)
    val n = Mp4.sampleCount(seed)
    for (j <- 0 until n if j % Mp4.SyncEvery == 0) {
      val img = Multimodal.decodeImage(
        Multimodal.renderPngRgb(Mp4.frameRgb(seed, j))).get
      val h = Multimodal.imageHistCounts(img, 16)
      for (i <- 0 until 16) expected(i) += h(i)
    }
    assert(hist.toSeq === expected.toSeq)
    // corrupt container -> None, never a partial histogram
    assert(Multimodal.decodeVideoHist("junk".getBytes("UTF-8"), 16).isEmpty)
  }

  test("average hash: striped PNG decodes to the closed-form hash; " +
      "exact-dup groups form per stripe pattern") {
    import spark.implicits._
    // same stripe seed -> identical image -> one group
    val media = Seq((1L, 5L), (2L, 9L), (3L, 5L))
      .map { case (id, seed) => (id, Multimodal.renderPngStripes(seed)) }
      .toDF("media_id", "payload")
    val hashed = Multimodal.imageHashes(media).collect()
      .map(h => h.media_id -> h.ahash).toMap
    assert(hashed(1L) === hashed(3L))
    assert(hashed(1L) !== hashed(2L))
    // closed form: bit-row r set iff 8*lum_r > sum(lum)
    val lums = (0 until 8).map { r =>
      val rgb = Multimodal.stripeRgb(5L, 2 * r)
      (2126 * ((rgb >> 16) & 0xff) + 7152 * ((rgb >> 8) & 0xff) +
        722 * (rgb & 0xff)) / 10000
    }
    val tot = lums.sum
    val expected = (0 until 8).foldLeft(0L) { (acc, r) =>
      if (8L * lums(r) > tot) acc | (0xFFL << (8 * (7 - r))) else acc
    }
    assert(hashed(1L) === expected)
    val groups = graft.ops.Dedup.perceptualCanonicalize(
      Multimodal.imageHashes(media).toDF()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(groups === Map(1L -> ((1L, false)), 2L -> ((2L, false)),
      3L -> ((1L, true))))
  }

  test("perceptual near-dup pairs: pigeonhole banding finds all pairs " +
      "within Hamming 7, drops beyond") {
    import spark.implicits._
    val h = 0x00FF00FF00FF00FFL
    val hashes = Seq(
      (1L, h),
      (2L, h ^ 0x3L),            // Hamming 2 of 1
      (3L, h ^ 0x01010101010101L

        | 0L),                   // 7 bits flipped, one per byte — Hamming 7
      (4L, h ^ 0xFF00L),         // a full byte flipped — Hamming 8, excluded
      (5L, h)).toDF("media_id", "ahash")
    val pairs = graft.ops.Dedup.perceptualPairs(hashes, maxHamming = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Number]("hamming").longValue).toMap
    assert(pairs.get((1L, 2L)) === Some(2L))
    assert(pairs.get((1L, 5L)) === Some(0L))
    assert(pairs.get((2L, 5L)) === Some(2L))
    assert(pairs.get((1L, 3L)) === Some(7L),
      "Hamming-7 pair must survive the 8x8 pigeonhole banding")
    assert(!pairs.contains((1L, 4L)), "Hamming 8 must be dropped")
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.perceptualPairs(hashes, maxHamming = 8)
    }
  }

  test("frame sampling emits ceil(duration/step) frames per video") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val counts = frames.groupBy("media_id", "duration_ms")
      .agg(count(lit(1)).as("n")).collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val expected = (r.getLong(1) + 999) / 1000
      assert(r.getLong(2) === expected)
    }
  }

  test("resize plan preserves aspect ratio within the max side") {
    val plans = Multimodal.resizePlan(media, maxSide = 256).collect()
    assert(plans.nonEmpty)
    plans.foreach { r =>
      val (sw, sh, dw, dh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(dw <= 256 && dh <= 256)
      assert(dw <= sw && dh <= sh)
    }
  }
}
