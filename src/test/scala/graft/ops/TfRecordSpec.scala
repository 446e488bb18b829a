package graft.ops

import java.nio.file.Files

import graft.{SparkSuite, Tables}
import graft.ops.TfRecord._

/** TFRecord framing + tf.train.Example wire format + corpus shard
  * export/read (ops/TfRecord.scala). */
class TfRecordSpec extends SparkSuite {

  test("Example wire bytes match the hand-computed proto encoding") {
    // Example{features{feature{"a": int64_list{value:[1]}}}} — computed
    // from the public proto wire spec byte by byte.
    val got = encodeExample(Seq("a" -> Int64V(Seq(1L))))
    val expected = Array[Int](
      0x0A, 0x0C, // Example.features, len 12
      0x0A, 0x0A, // Features.feature map entry, len 10
      0x0A, 0x01, 0x61, // key "a"
      0x12, 0x05, // value: Feature, len 5
      0x1A, 0x03, // Feature.int64_list, len 3
      0x0A, 0x01, 0x01 // Int64List.value packed [1]
    ).map(_.toByte)
    assert(got.toSeq === expected.toSeq)
  }

  test("Example encode/decode roundtrips all three list kinds") {
    val feats = Seq(
      "b" -> BytesV(Seq("grüße ünïcodé".getBytes("UTF-8"), Array[Byte](0, 1, 2))),
      "f" -> FloatV(Seq(1.5f, -0.25f, Float.MinPositiveValue)),
      "i" -> Int64V(Seq(0L, -1L, Long.MaxValue, Long.MinValue, 42L)))
    val back = decodeExample(encodeExample(feats))
    assert(back.keySet === Set("b", "f", "i"))
    val bs = back("b").asInstanceOf[BytesV].vs
    assert(new String(bs.head, "UTF-8") === "grüße ünïcodé")
    assert(bs(1).toSeq === Seq[Byte](0, 1, 2))
    assert(back("f").asInstanceOf[FloatV].vs === Seq(1.5f, -0.25f, Float.MinPositiveValue))
    assert(back("i").asInstanceOf[Int64V].vs ===
      Seq(0L, -1L, Long.MaxValue, Long.MinValue, 42L))
  }

  test("decoder also accepts UNPACKED int64/float lists (proto2-style writers)") {
    // hand-build: Feature{int64_list{value: 7 unpacked}} inside an
    // Example, int64 value as tag(field1,varint)=0x08
    val unpackedInt64List = Array[Int](0x08, 0x07).map(_.toByte)
    val feature = Array[Int](0x1A, unpackedInt64List.length).map(_.toByte) ++ unpackedInt64List
    val entry = Array[Int](0x0A, 0x01, 0x78).map(_.toByte) ++ // key "x"
      (Array[Int](0x12, feature.length).map(_.toByte) ++ feature)
    val features = Array[Int](0x0A, entry.length).map(_.toByte) ++ entry
    val example = Array[Int](0x0A, features.length).map(_.toByte) ++ features
    assert(decodeExample(example)("x").asInstanceOf[Int64V].vs === Seq(7L))
  }

  test("framing roundtrips and CRC detects a flipped payload bit") {
    val recs = Seq("first", "second-record", "").map(_.getBytes("UTF-8"))
    val buf = new java.io.ByteArrayOutputStream()
    recs.foreach(writeFramed(buf, _))
    val bytes = buf.toByteArray
    val back = readFramed(new java.io.ByteArrayInputStream(bytes)).toList
    assert(back.map(new String(_, "UTF-8")) === Seq("first", "second-record", ""))

    // flip one payload byte of record 1 (offset 12 = first payload byte)
    val corrupt = bytes.clone(); corrupt(12) = (corrupt(12) ^ 0x40).toByte
    val ex = intercept[java.io.IOException] {
      readFramed(new java.io.ByteArrayInputStream(corrupt), "t").toList
    }
    assert(ex.getMessage.contains("CRC mismatch"))
  }

  test("truncated file surfaces as EOFException") {
    val buf = new java.io.ByteArrayOutputStream()
    writeFramed(buf, "payload-bytes".getBytes("UTF-8"))
    val cut = buf.toByteArray.dropRight(6)
    intercept[java.io.EOFException] {
      readFramed(new java.io.ByteArrayInputStream(cut), "t").toList
    }
  }

  test("tfrecordShards exports the corpus losslessly and deterministically") {
    val docs = Tables.documents(spark, sf0001)
    val dir = Files.createTempDirectory("graft-tfrec").toString
    TfRecord.tfrecordShards(docs, dir, 4)

    val back = TfRecord.readShards(spark, dir)
    assert(back.count() === docs.count())
    val restored = back.select("doc_id", "text", "lang", "source", "n_chars")
    val orig = docs.select("doc_id", "text", "lang", "source", "n_chars")
    val diff = restored.exceptAll(orig).unionByName(orig.exceptAll(restored))
    assert(diff.isEmpty, "TFRecord export+read must be a lossless roundtrip")

    // balance: prefix-sum shard assignment is ±1
    val counts = back.groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length === 4 && counts.max - counts.min <= 1)

    // determinism: a second export produces byte-identical shard files
    val dir2 = Files.createTempDirectory("graft-tfrec2").toString
    TfRecord.tfrecordShards(docs, dir2, 4)
    for (s <- 0 until 4) {
      val f1 = Files.readAllBytes(java.nio.file.Paths.get(dir, s"shard=$s", s"part-$s.tfrecord"))
      val f2 = Files.readAllBytes(java.nio.file.Paths.get(dir2, s"shard=$s", s"part-$s.tfrecord"))
      assert(java.util.Arrays.equals(f1, f2), s"shard $s must be byte-identical")
    }
  }
}
