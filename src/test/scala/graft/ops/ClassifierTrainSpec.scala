package graft.ops

import graft.SparkSuite

/** Full training loop of the fastText-shaped classifier: the oracled
  * surface covers the exact first gradient (text_train_grad0); this spec
  * pins the iterative remainder — convergence on a separable planted
  * corpus, determinism, and the learned-weights scoring contract. */
class ClassifierTrainSpec extends SparkSuite {
  import spark.implicits._

  // separable by construction: positives carry `signal`-family tokens,
  // negatives `noise`-family tokens, over a shared common vocabulary
  private lazy val planted = (0L until 200L).map { i =>
    val y = i % 2 == 0
    val marker = if (y) s"signal${i % 7}" else s"noise${i % 7}"
    val text = s"the common words appear in every document here $marker " +
      s"$marker plus filler token${i % 11}"
    (i, text, if (y) "good" else "bad")
  }.toDF("doc_id", "text", "source")

  test("gradient descent separates the planted corpus") {
    val w = ClassifierTrain.train(planted, targetSource = "good",
      steps = 12, lrMicro = 2000000L)
    val scored = ClassifierTrain.scoreWith(planted, w)
      .join(planted.select($"doc_id", ($"source" === "good").as("truth")), "doc_id")
    val n = scored.count()
    val correct = scored
      .filter($"predicted_keep" === $"truth").count()
    assert(correct.toDouble / n >= 0.95,
      s"expected >=95% training accuracy, got $correct/$n")
  }

  test("training is deterministic: same data, same weights, twice") {
    val w1 = ClassifierTrain.train(planted, "good", steps = 4)
    val w2 = ClassifierTrain.train(planted, "good", steps = 4)
    assert(w1.toSeq === w2.toSeq)
    assert(w1.exists(_ != 0L), "training must move some weight")
  }

  test("step-1 weights follow the integer update rule from the gradient") {
    val feat = ClassifierTrain.features(planted, "good")
    val g = ClassifierTrain.gradient(feat, new Array[Long](1024))
    val w = ClassifierTrain.train(planted, "good", steps = 1,
      lrMicro = 500000L)
    val nDocs = planted.count()
    val expected = g.map(gb => -(500000L * (gb / nDocs) / 1000000L))
    assert(w.toSeq === expected.toSeq)
  }
}
