package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact token-phrase search scored as BM25 with the PHRASE as the
  * indexed term (builder-prompt extension — the reference's BM25 is
  * bag-of-words only, `embedding/bm25_manager.py:284-287`; phrase
  * queries are the standard keyword-search capability it lacks).
  *
  * Phrase occurrence counting is a pure string computation, not a
  * positional-postings join: the token array is re-joined with DOUBLE
  * spaces and single sentinel spaces (` spark  join  spark  join `), the
  * phrase pattern carries single outer spaces (` spark  join `), and the
  * non-overlapping occurrence count falls out of one `replace`:
  * `tf = (len(s) − len(replace(s, p, ''))) / len(p)`. The double-space
  * convention makes ADJACENT occurrences each own their boundary spaces
  * (a single-space join would let `replace` consume the shared space and
  * undercount `a b a b`), while true overlaps (`a a a` for phrase
  * `a a`) still count once — the left-to-right non-overlapping
  * convention both Spark's and DuckDB's `replace` implement, which is
  * what makes the operator value-oracle-able.
  *
  * 100 TB: one corpus pass computes (doc_len, tf) per document as
  * codegen column math; corpus stats (N, avgdl, df) are one tiny
  * aggregate broadcast back; scoring + top-k is a
  * TakeOrderedAndProject. No shuffle carries more than the stats row.
  */
object PhraseSearch {

  /** Per-document phrase stats: `(id, dl, tf)` — BM25 token count and
    * non-overlapping occurrences of the phrase. One corpus pass.
    */
  def phraseStats(docs: DataFrame, idCol: String, textCol: String,
                  phraseText: String): DataFrame = {
    val ptoks = LateInteraction.tokenizeValue(phraseText)
    require(ptoks.nonEmpty, "empty phrase")
    val p = " " + ptoks.mkString("  ") + " "
    val toks = TextFunctions.tokenize(col(textCol))
    val s = concat(lit(" "), array_join(toks, "  "), lit(" "))
    docs.select(col(idCol), size(toks).cast("long").as("dl"),
      ((length(s) - length(replace(s, lit(p), lit("")))) / lit(p.length))
        .cast("long").as("tf"))
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
