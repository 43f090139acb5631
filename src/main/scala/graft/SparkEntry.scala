package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage surface: one entry per implemented
  * operator from SURVEY §2, each with a DuckDB oracle in `oracleSql` when the
  * semantics are ANSI-SQL-expressible (non-expressible ops get a rows-only
  * check). Definitions live in `graft.queries.*` registries.
  */
object SparkEntry {

  private def registries: Seq[QueryDef] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.KbQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.EngineQueries.defs ++
      graft.queries.CategorizeQueries.defs

  /** Flagship: the full §3.1 retrieval lifecycle (enhance → embed → hybrid
    * vector+BM25 → RRF → rerank → final hits) on sf=0.001; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("e2e_hybrid_query")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(d => d.name -> d.fn).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    registries.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
