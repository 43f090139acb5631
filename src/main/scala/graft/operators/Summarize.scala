package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Extractive summarization primitive — the most CENTRAL chunk of each
  * source document (LexRank's centrality idea, Erkan & Radev 2004,
  * reduced to one exact step: centrality(c) = Σ over sibling chunks of
  * cos(e_c, e_s); the top-centrality chunk is the document's extractive
  * summary seed). Builder-prompt extension: the reference has no
  * summarization; its context windows return neighbors by POSITION
  * (`/root/reference/query/search.py:37-58`) — this picks the chunk the
  * rest of the document agrees with.
  *
  * Only embedded chunks participate (the embeddings table is the
  * authority — an unembedded chunk has no similarity evidence either
  * way); a document whose only embedded chunk has no sibling scores
  * centrality 0.0 and still wins its group.
  *
  * 100 TB shape: the pairwise similarity is per-SOURCE-document
  * (quadratic only in a document's chunk count, never across documents)
  * — one hash-partitioned self-join on the source key, one
  * map-side-combined sum, one ranking window per source.
  */
object Summarize {

  /** Per-source most-central chunk: `(source, doc_id, n_chunks,
    * centrality)` ordered by source — centrality summed 4 dp, ties
    * broken by doc_id, n_chunks = embedded chunks in the group.
    */
  def centralChunks(docs: DataFrame, emb: DataFrame,
                    sourceCol: String, idCol: String,
                    vecIdCol: String, vecCol: String): DataFrame = {
    val ce = docs.select(col(sourceCol).as("source"), col(idCol).as("doc_id"))
      .join(emb.select(col(vecIdCol).as("doc_id"),
        col(vecCol).as("embedding")), "doc_id")
    val pairs = ce.alias("a")
      .join(ce.alias("b"),
        col("a.source") === col("b.source") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.source").as("source"), col("a.doc_id").as("doc_id"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding"))
          .as("c"))
      .groupBy("source", "doc_id")
      .agg(round(sum("c"), 4).as("centrality"),
        count(lit(1)).as("n_sib"))
    ce.select("source", "doc_id")
      .join(pairs, Seq("source", "doc_id"), "left")
      .select(col("source"), col("doc_id"),
        (coalesce(col("n_sib"), lit(0L)) + 1L).as("n_chunks"),
        coalesce(col("centrality"), lit(0.0)).as("centrality"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("centrality").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select("source", "doc_id", "n_chunks", "centrality")
      .orderBy("source")
  }
}
