package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CurationSpec extends SparkSuite {
  import spark.implicits._

  // 1 small source (2 docs, under any cap) + 1 heavy source (6 docs)
  private lazy val docs = Seq(
    (1L, "one two three four five", "small"),
    (2L, "one two", "small"),
    (3L, "a b c d e f g h", "heavy"),
    (4L, "a b c d e f g", "heavy"),
    (5L, "a b c d e f", "heavy"),
    (6L, "a b c d e", "heavy"),
    (7L, "a b c d", "heavy"),
    (8L, "a b c", "heavy"))
    .toDF("doc_id", "text", "source")

  test("domainCap keeps everything in under-cap sources, top-N in over-cap") {
    val kept = Curation.domainCap(docs, cap = 3).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept(1L) && kept(2L)) // under-cap source: all kept
    // heavy source ranked by token count desc, doc_id asc: 3,4,5 survive
    assert(kept(3L) && kept(4L) && kept(5L))
    assert(!kept(6L) && !kept(7L) && !kept(8L))
  }

  test("domainCap tie-break is doc_id when token counts equal") {
    val tied = Seq(
      (10L, "x y", "s"), (11L, "x y", "s"), (12L, "x y", "s"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.domainCap(tied, cap = 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(kept(10L) && kept(11L) && !kept(12L))
  }

  test("salted two-phase cap equals the naive single-window form (skewed)") {
    import org.apache.spark.sql.expressions.Window
    // one hot domain with 400 docs (97% of the corpus), ties included
    val skewed = ((1 to 400).map(i =>
      (i.toLong, ("w " * (i % 37 + 1)).trim, "hot")) ++
      (1 to 12).map(i => (1000L + i, "x y z", s"cold$i")))
      .toDF("doc_id", "text", "source")
    val out = Curation.domainCap(skewed, cap = 10, salts = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val w = Window.partitionBy("source")
      .orderBy(size(split(trim(col("text")), "\\s+")).desc, col("doc_id").asc)
    val naive = skewed
      .withColumn("kept", row_number().over(w) <= 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out === naive)
  }

  test("domainCap emits exactly one row per document") {
    val out = Curation.domainCap(docs, cap = 3)
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
  }

  test("boilerplate strips exactly the planted footer and keeps the rest") {
    // 4 docs with doc_id % 7 == 0 (0, 7, 14) get the footer stamped; the
    // footer is one 10-token segment occurring in 3 docs >= minDf=3
    val df = Seq(
      (0L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (7L, "kilo lima mike november oscar papa quebec romeo sierra tango"),
      (14L, "uniform victor whiskey xray yankee zulu one two three four"),
      (21L, "five six seven eight nine ten eleven twelve thirteen fourteen"))
      .toDF("doc_id", "text")
    // doc 21 also stamped (21 % 7 == 0) -> footer appears in 4 docs
    val out = Curation.boilerplate(df, segLen = 10, minDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // every doc: 1 body segment + 1 footer segment
    assert(out.forall { case (_, nSeg, nBoil, _) => nSeg == 2 && nBoil == 1 })
    // retained text is exactly the original body
    val expected = df.select(col("doc_id"), sha2(col("text"), 256)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, _, _, sha) => assert(sha === expected(id)) }
  }

  test("boilerplate of an all-boiler doc yields sha256 of empty string") {
    val same = "dup dup dup dup dup dup dup dup dup dup"
    val df = Seq((1L, same), (2L, same), (3L, same)).toDF("doc_id", "text")
    val out = Curation.boilerplate(df, segLen = 10, minDf = 3, plantMod = 1000)
      .collect()
    val emptySha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    assert(out.forall(r => r.getLong(2) === 1L && r.getString(3) === emptySha))
  }

  test("substringDedup excises the shared passage as one merged span") {
    // two docs share a 14-token passage (5 overlapping shared 10-grams);
    // distinct prefixes/suffixes must survive untouched
    val passage = "one two three four five six seven eight nine ten eleven twelve thirteen fourteen"
    val df = Seq(
      (1L, s"alpha beta $passage gamma delta"),
      (2L, s"epsilon zeta $passage eta theta"),
      (3L, "totally unrelated words that repeat nothing from anywhere else at all"))
      .toDF("doc_id", "text")
    val out = Curation.substringDedup(df, w = 10, minDocs = 2, plantMod = 1000)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // docs 1/2: 18 tokens, the 14 passage tokens removed in one span
    assert(out(1L)._1 === 18L && out(1L)._2 === 14L)
    assert(out(2L)._2 === 14L)
    val sha = (s: String) => spark.sql(s"SELECT sha2('$s', 256)")
      .collect().head.getString(0)
    assert(out(1L)._3 === sha("alpha beta gamma delta"))
    assert(out(2L)._3 === sha("epsilon zeta eta theta"))
    // doc 3: nothing shared, reassembly is the identity
    assert(out(3L)._2 === 0L)
    assert(out(3L)._3 === sha("totally unrelated words that repeat nothing from anywhere else at all"))
  }

  test("substringDedup leaves short docs (< w tokens) untouched") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = Curation.substringDedup(df, w = 10, minDocs = 2, plantMod = 1000)
      .collect()
    assert(out.forall(r => r.getLong(2) === 0L))
  }

  test("boilerplate final short segment keeps remainder tokens") {
    val df = Seq((1L, "a b c d e f g h i j k l")).toDF("doc_id", "text") // 12 toks
    val out = Curation.boilerplate(df, segLen = 10, minDf = 99, plantMod = 1000)
      .collect().head
    assert(out.getLong(1) === 2L) // 10-token segment + 2-token remainder
    val sha = spark.sql("SELECT sha2('a b c d e f g h i j k l', 256)")
      .collect().head.getString(0)
    assert(out.getString(3) === sha) // nothing dropped, reassembly is exact
  }

  // two vocabularies: target-style docs reuse the target slice's words,
  // noise docs use words the target never contains
  private lazy val dsirDocs = Seq(
    (1L, "model data training scale corpus", "target"),
    (2L, "data model corpus tokens scale", "target"),
    (3L, "model corpus data quality", "target"),
    (4L, "data training model scale corpus tokens", "other"), // target-like
    (5L, "zebra yak walrus vole urchin", "other"),            // noise
    (6L, "quokka pangolin okapi numbat", "other"))            // noise
    .toDF("doc_id", "text", "source")

  test("dsirSelect ranks target-like documents above noise documents") {
    val out = Curation.dsirSelect(dsirDocs, targetSource = "target", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // doc 4 shares the target vocabulary; docs 5/6 share none of it
    assert(out(4L)._1 > out(5L)._1 && out(4L)._1 > out(6L)._1)
    assert(out.values.count(_._2) === 4)
    assert(out(4L)._2 && !out(5L)._2 && !out(6L)._2)
    // importance is RELATIVE: every target-vocabulary doc outranks every
    // noise doc (absolute signs depend on the smoothing mass, since the
    // target here is a subset of raw rather than a disjoint corpus)
    val targetLike = Seq(1L, 2L, 3L, 4L).map(out(_)._1)
    val noise = Seq(5L, 6L).map(out(_)._1)
    assert(targetLike.min > noise.max)
  }

  test("dsirSelect dense-array scoring equals a join-based recomputation") {
    val buckets = 64
    val toks = dsirDocs.select(col("doc_id"), col("source"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))
      .withColumn("bucket", Curation.tokenBucket(col("tok"), buckets))
    val counts = toks.groupBy("bucket").agg(
      count(lit(1)).as("r_cnt"),
      count(when(col("source") === "target", 1)).as("t_cnt"))
    val Array(rTot, tTot) = counts
      .agg(sum("r_cnt").cast("double"), sum("t_cnt").cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val lr = counts.collect().map { r =>
      val v = math.log(((r.getLong(2) + 1.0) / (tTot + buckets)) /
        ((r.getLong(1) + 1.0) / (rTot + buckets))) * 1000000.0
      r.getLong(0) -> BigDecimal.valueOf(v)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
    }.toMap
    val expected = toks.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(r => lr(r.getLong(3))).sum }
    val out = Curation.dsirSelect(dsirDocs, "target", buckets = buckets, k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === expected)
  }

  test("dsirSelect with k >= corpus selects everything") {
    val out = Curation.dsirSelect(dsirDocs, "target", k = 100).collect()
    assert(out.length === 6 && out.forall(_.getBoolean(3)))
  }
}
