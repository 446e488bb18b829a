package graft.queries

import graft.QueryDef

/** Extension surface (SURVEY.md §7.6): dedup, similarity search, text
  * analysis, event-time windows. Populated operator-by-operator. */
object ExtQueries {
  val defs: Seq[(String, QueryDef)] = Seq()
}
