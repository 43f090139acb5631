package graft.queries

import graft.QueryDef

/** Training-data pipeline queries (builder-prompt extensions): dedup suite,
  * similarity search, text analysis, multimodal plumbing. Populated
  * incrementally.
  */
object PipelineQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
