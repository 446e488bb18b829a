package graft.ops

import graft.SparkSuite

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("bpe learns the classic merges on a hand-computed corpus") {
    // Sennrich's running example, word frequencies via repetition:
    // low x5, lower x2, newest x6, widest x3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Bpe.train(docs, merges = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>-less t end)... by hand:
    // es 9, st 9, lo 7, we 5(newest 6? w-e in newest and lower)...
    // deterministic tie-break (count desc, lhs, rhs): (e,s)=9 beats (s,t)=9
    assert(out(0) === ((1L, "e", "s", 9L)))
    // after merging "es": (es,t)=9 is now the top pair
    assert(out(1) === ((2L, "es", "t", 9L)))
    // then lo=7 (low 5 + lower 2)
    assert(out(2) === ((3L, "l", "o", 7L)))
    assert(out.length === 4)
  }

  test("greedy left-to-right: [a a a] merges to [aa a], not [a aa]") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val out = Bpe.train(docs, merges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) appears twice per word but greedy counting is
    // per-adjacent-slot: weight 2 words x 2 slots = 4
    assert(out(0) === (("a", "a", 4L)))
    // after merge each word is [aa, a]: top pair is (aa, a) weight 2
    assert(out(1) === (("aa", "a", 2L)))
  }

  test("encode applies frozen merges in priority order, greedy within word") {
    val docs = Seq((1L, "table tata scan")).toDF("doc_id", "text")
    val merges = Seq(("t", "a"), ("ta", "b"), ("s", "c"))
    val r = Bpe.encode(docs, merges).collect().head
    // table: t a b l e -> ta b l e -> tab l e           (3 subwords)
    // tata:  t a t a   -> ta ta    -> (ta,b misses)     (2 subwords)
    // scan:  s c a n   -> sc a n                        (3 subwords)
    assert(r.getLong(1) === 3L) // words
    assert(r.getLong(2) === 8L) // 3 + 2 + 3
    val sha = spark.sql("SELECT sha2('tab l e ta ta sc a n', 256)")
      .collect().head.getString(0)
    assert(r.getString(3) === sha)
  }

  test("encode with no merges is character-level; empty doc is stable") {
    val docs = Seq((1L, "ab"), (2L, "123 !!")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 2L)))
    assert(out(2L) === ((0L, 0L))) // no alphabetic words at all
  }

  test("codegen'd encode equals the composed-fold reference form") {
    val docs = graft.Tables.documents(spark, sf0001)
    val merges = Seq(("t", "a"), ("ta", "b"), ("s", "c"), ("q", "u"), ("l", "u"))
    val fast = Bpe.encode(docs, merges)
    val slow = Bpe.encodeViaFolds(docs, merges)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("training stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = Bpe.train(docs, merges = 10).collect()
    assert(out.length === 1) // (a,b) merges; single-symbol words have no pairs
    assert(out.head.getString(1) === "a" && out.head.getString(2) === "b")
  }
}
