package graft.ops

import org.apache.spark.sql.functions._

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

  test("decode batches co-locate each kind in a single partition") {
    val perPartitionKinds = Multimodal.extractFeatures(media, dim = 4)
      .mapPartitions(it => Iterator.single(it.map(_.kind).toSet))(
        org.apache.spark.sql.Encoders.kryo[Set[String]])
      .collect()
    Seq("image", "audio", "video").foreach { kind =>
      assert(perPartitionKinds.count(_.contains(kind)) === 1)
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
