package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact token-phrase search scored as BM25 with the PHRASE as the
  * indexed term (builder-prompt extension — the reference's BM25 is
  * bag-of-words only, `embedding/bm25_manager.py:284-287`; phrase
  * queries are the standard keyword-search capability it lacks).
  *
  * Phrase occurrence counting is ADJACENT-START positional semantics —
  * tf = the number of token positions where the phrase starts, overlaps
  * included (`a a a` counts the phrase `a a` TWICE) — the standard
  * positional-inverted-index convention and exactly what the stored tier
  * ([[PositionalIndex]]) computes, so a phrase query answers identically
  * whether it is computed on the fly or served from the at-rest index
  * (repeated-token phrases included; an earlier replace-counting
  * formulation diverged on those). The count is pure codegen column math:
  * filter the start positions `1 .. |toks|−m+1` on an m-way token
  * equality conjunction — no fan-out, no join.
  *
  * 100 TB: one corpus pass computes (doc_len, tf) per document as
  * codegen column math; corpus stats (N, avgdl, df) are one tiny
  * aggregate broadcast back; scoring + top-k is a
  * TakeOrderedAndProject. No shuffle carries more than the stats row.
  */
object PhraseSearch {

  /** Per-document phrase stats: `(id, dl, tf)` — BM25 token count and
    * adjacent-start (overlapping) occurrences of the phrase. One corpus
    * pass.
    */
  def phraseStats(docs: DataFrame, idCol: String, textCol: String,
                  phraseText: String): DataFrame = {
    val ptoks = LateInteraction.tokenizeValue(phraseText)
    require(ptoks.nonEmpty, "empty phrase")
    val m = ptoks.size
    docs.select(col(idCol), TextFunctions.tokenize(col(textCol)).as("toks"))
      .select(col(idCol), size(col("toks")).cast("long").as("dl"),
        when(size(col("toks")) >= m,
          size(filter(
            sequence(lit(1), size(col("toks")) - lit(m - 1)),
            i => ptoks.zipWithIndex.map { case (pt, j) =>
              element_at(col("toks"), (i + lit(j)).cast("int")) === lit(pt)
            }.reduce(_ && _))))
          .otherwise(lit(0)).cast("long").as("tf"))
  }

  /** Top-k BM25-scored phrase search: `(id, score)` with the phrase as
    * the single query term — Okapi idf from the phrase's document
    * frequency, standard (k1, b) saturation/length normalization over
    * the document's token count, score rounded to 4 dp, ordered
    * (score DESC, id).
    */
  def phraseTopK(docs: DataFrame, idCol: String, textCol: String,
                 phraseText: String, k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = phraseStats(docs, idCol, textCol, phraseText)
    val corpus = stats.filter(col("dl") > 0)
      .agg(count(lit(1)).as("n"), avg(col("dl").cast("double")).as("avgdl"),
        sum(when(col("tf") > 0, 1L).otherwise(0L)).as("df"))
    val idf = log(
      (col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    stats.filter(col("tf") > 0)
      .crossJoin(broadcast(corpus))
      .select(col(idCol),
        round(
          idf * (col("tf") * (k1 + 1.0)) /
            (col("tf") +
              lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl"))),
          4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
