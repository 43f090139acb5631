package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword-in-context snippet extraction: for each document, the best
  * window of `width` consecutive tokens — the one covering the most
  * DISTINCT query terms, earliest window winning ties. Builder-prompt
  * extension: the reference returns whole chunks
  * (`/root/reference/query/search.py:551`); per-hit highlight windows
  * are the standard search-result UX it lacks.
  *
  * Wholly integer/string math (positions, distinct-term counts, a token
  * slice), so results are value-exact across engines by construction.
  *
  * 100 TB shape: one corpus pass positions the tokens; everything after
  * runs on MATCH positions only (query-term hits — a tiny fraction of
  * the token stream), including the per-anchor coverage count (a
  * per-document range self-join of the match list, quadratic only in a
  * document's match count). The best-window cut is one ranking window
  * per doc; the snippet slice is a second corpus-pass join for the
  * surviving best rows only.
  */
object Snippets {

  /** Per-document best snippet for `queryText`:
    * `(id, start_pos, n_terms, snippet)` — 0-based anchor position,
    * DISTINCT query terms covered, the space-joined `width`-token window
    * — top `k` docs by (n_terms DESC, start_pos ASC, id).
    */
  def bestSnippets(docs: DataFrame, idCol: String, textCol: String,
                   queryText: String, k: Int, width: Int = 10): DataFrame = {
    val qTerms = LateInteraction.tokenizeValue(queryText).distinct
    require(qTerms.nonEmpty, "empty query")
    val toks = docs.select(col(idCol),
      TextFunctions.tokenize(col(textCol)).as("l"))
    val pos = toks.select(col(idCol), posexplode(col("l")).as(Seq("p", "t")))
    val m = pos.filter(col("t").isin(qTerms: _*))
    val win = m.alias("a")
      .join(m.alias("b"),
        col(s"a.$idCol") === col(s"b.$idCol") &&
          col("b.p") >= col("a.p") && col("b.p") < col("a.p") + width)
      .groupBy(col(s"a.$idCol").as(idCol), col("a.p").as("p"))
      .agg(countDistinct(col("b.t")).as("n"))
    val best = win.withColumn("rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("n").desc, col("p"))))
      .filter(col("rn") === 1)
    best.join(toks, Seq(idCol))
      .select(col(idCol), col("p").as("start_pos"), col("n").as("n_terms"),
        array_join(slice(col("l"), col("p") + 1, lit(width)), " ")
          .as("snippet"))
      .orderBy(col("n_terms").desc, col("start_pos"), col(idCol))
      .limit(k)
  }
}
