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
    // r18 restructure (guide §2.4 — remove shuffles outright): the
    // per-anchor coverage count used to be a per-document RANGE SELF-JOIN
    // of the match list plus a groupBy plus a ranking window — three
    // exchanges over the match stream. The match list is per-doc bounded
    // (query-term hits only), so ONE groupBy collects it sorted and a
    // single expression computes every anchor's distinct-term coverage
    // and the (n DESC, p ASC) argmax: max over structs (n, -p) IS that
    // ordering. Values are identical: same windows, same distinct counts
    // (positions are unique, terms non-null), same tie-break.
    val ms = m.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("p"), col("t")))).as("ms"))
    val cand = transform(col("ms"), a =>
      struct(
        size(array_distinct(transform(
          filter(col("ms"), e =>
            e.getField("p") >= a.getField("p") &&
              e.getField("p") < a.getField("p") + width),
          e => e.getField("t")))).as("n"),
        (-a.getField("p")).as("np")))
    val best = ms
      .select(col(idCol), array_max(cand).as("b"))
      .select(col(idCol), (-col("b.np")).as("p"),
        col("b.n").cast("long").as("n"))
    // the top-k cut depends only on (n, p, id) — all known BEFORE the
    // snippet text: cut first (TakeOrderedAndProject over per-doc rows),
    // then join the k survivors back to the token arrays for slicing
    // (1:1 on id, so the cut commutes with the join)
    val top = best
      .orderBy(col("n").desc, col("p"), col(idCol)).limit(k)
    broadcast(top).join(toks, Seq(idCol))
      .select(col(idCol), col("p").as("start_pos"), col("n").as("n_terms"),
        array_join(slice(col("l"), col("p") + 1, lit(width)), " ")
          .as("snippet"))
      .orderBy(col("n_terms").desc, col("start_pos"), col(idCol))
  }
}
