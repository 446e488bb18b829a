package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

 

/** Space-Saving heavy hitters (Metwally et al., "Efficient computation of
  * frequent and top-k elements in data streams") as a typed Spark
  * `Aggregator` — the UDAF face of the extension surface (the scalar face
  * is the custom `Expression`s in [[HashExprs]], the whole-operator face
  * the as-of join plan). State is AT MOST `capacity` counters per
  * partial-aggregation buffer no matter how large the input: when a new
  * item arrives at a full buffer it inherits the smallest counter
  * (bounding the overestimate by that minimum). Buffers merge
  * associatively, so Spark's partial aggregation applies — each partition
  * reduces locally and only `capacity`-sized maps cross the wire. With
  * `capacity` at or above the true vocabulary the counts are EXACT, which
  * is what lets the driver oracle this query; at 100 TB vocabulary the
  * same aggregator keeps running in constant space and degrades to the
  * classic ε-overestimate guarantee.
  */
case class TokenCount(token: String, cnt: Long)

class SpaceSavingTopK(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, Long], Seq[TokenCount]] {
  require(capacity >= k, "capacity must be at least k")

  override def zero: Map[String, Long] = Map.empty

  private def add(m: Map[String, Long], tok: String, c: Long): Map[String, Long] =
    m.get(tok) match {
      case Some(prev) => m.updated(tok, prev + c)
      case None if m.size < capacity => m.updated(tok, c)
      case None =>
        val (minTok, minC) = m.minBy { case (t, n) => (n, t) }
        (m - minTok).updated(tok, minC + c)
    }

  override def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
    add(m, tok, 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (t, c)) => add(m, t, c) }

  override def finish(m: Map[String, Long]): Seq[TokenCount] =
    m.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .map { case (t, c) => TokenCount(t, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[TokenCount]] =
    ExpressionEncoder[Seq[TokenCount]]()
}
