package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Multimodal

/** Pins the two harness-scaling contracts the 100× bench decade exposed:
  * the ANN recall panel must stay a FIXED absolute size as the corpus
  * grows (else every queries×corpus evaluation — worst case the PQ ADC
  * join — turns quadratic in corpus size), and the synthetic-MP4 memo
  * must stop inserting at its cap rather than clearing wholesale (a
  * clear-all makes every bench pass at large scale re-encode the whole
  * payload set, billing fixture encode to the engine). */
class RecallPanelSpec extends SparkSuite {
  import spark.implicits._

  test("recall panel is the full %100 slice below the cap boundary") {
    val emb = (0L until 2000L).map(i => (i, Array(0.1f), "a"))
      .toDF("vec_id", "embedding", "label")
    val panel = SimQueries.recallPanel(emb).select("vec_id").as[Long].collect()
    assert(panel.toSet == (0L until 2000L by 100L).toSet)
  }

  test("recall panel stays 200 queries on a 100k-id corpus") {
    val emb = (0L until 100000L).map(i => (i, Array(0.1f), "a"))
      .toDF("vec_id", "embedding", "label")
    val panel = SimQueries.recallPanel(emb).select("vec_id").as[Long].collect()
    assert(panel.length == 200, s"panel grew to ${panel.length}")
    assert(panel.forall(id => id % 100 == 0 && id < 20000))
  }

  test("mp4 memo at cap computes without inserting; hits still serve") {
    Multimodal.mp4Memo.clear()
    val a = Multimodal.memoMp4(1L, cap = 2)
    val b = Multimodal.memoMp4(2L, cap = 2)
    assert(Multimodal.mp4Memo.size == 2)
    // at cap: a new seed still renders, but must NOT evict or insert
    val c = Multimodal.memoMp4(3L, cap = 2)
    assert(c.nonEmpty && Multimodal.mp4Memo.size == 2)
    assert(Multimodal.mp4Memo.containsKey(1L) && Multimodal.mp4Memo.containsKey(2L))
    // cached seeds are served from the memo (same array instance)
    assert(Multimodal.memoMp4(1L, cap = 2) eq a)
    assert(Multimodal.memoMp4(2L, cap = 2) eq b)
    Multimodal.mp4Memo.clear()
  }
}
