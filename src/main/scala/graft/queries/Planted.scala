package graft.queries

/** Id offsets for the planted-twin recall protocols (sim_* vectors,
  * dedup_*_planted documents). The offsets bound how far
  * [[graft.tools.GenScale]] can scale the corpora before scaled ids
  * would collide with planted ids and corrupt every recall
  * measurement — so they are shared constants, raised in ONE place
  * (Spark queries AND their DuckDB oracle SQL interpolate them).
  * 10M admits 2,000× the sf0.1 documents (5k) and 5,000× its
  * embeddings (2k). */
object Planted {
  /** Planted near-dup twins live at id + Offset. */
  val Offset: Long = 10000000L
  /** Decontamination eval twins live at id + DecontamOffset (must stay
    * above Offset + max corpus id so the two plantings never collide). */
  val DecontamOffset: Long = 20000000L
}
