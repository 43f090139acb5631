package graft.queries

import graft.QueryDef

/** Knowledge-base retrieval pipeline queries (SURVEY §3): tokenize → BM25 →
  * vector top-k → RRF hybrid → context expansion. Populated incrementally.
  */
object KbQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
