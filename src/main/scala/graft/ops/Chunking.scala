package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window document chunking for training-data assembly.
  *
  * Long documents are cut into fixed-size overlapping windows (size `size`,
  * step `stride` < size ⇒ `size - stride` characters of overlap) so every
  * token appears in at least one chunk and boundary context is preserved —
  * the standard preprocessing for embedding models and RAG indexes.
  *
  * Plan shape: a generator (posexplode over a per-row `transform(sequence)`)
  * — purely row-local, zero shuffle, whole-stage codegen. At 100 TB this is
  * a map-only pass whose output is `len/stride` times the input rows;
  * chunk ids are per-document, so downstream operators can repartition on
  * `(doc_id)` or `(doc_id, chunk_id)` without a global ordering step.
  */
object Chunking {

  /** Overlapping character windows: chunk i covers
    * `[i*stride, i*stride + size)`; the last window starts at the largest
    * `i*stride < length`, so short tails still emit (a document shorter
    * than `size` yields exactly one chunk). */
  def charChunks(docs: DataFrame, size: Int, stride: Int): DataFrame = {
    require(stride > 0 && size >= stride, s"need 0 < stride <= size")
    val offsets =
      s"sequence(0L, greatest(CAST(0 AS BIGINT), (length(text) - 1) div $stride))"
    docs
      .select(col("doc_id"),
        posexplode(expr(
          s"transform($offsets, i -> substring(text, CAST(i * $stride + 1 AS INT), $size))"))
          .as(Seq("chunk_id", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("bigint").as("chunk_id"),
        col("chunk"),
        length(col("chunk")).cast("bigint").as("chunk_chars"))
  }
}
