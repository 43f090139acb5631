package graft.queries

/** Shared DuckDB oracle SQL fragments. Each fragment must stay in lockstep
  * with the graft column function it mirrors — the driver's hash compare is
  * the enforcement (tools/check.py locally, CORRECTNESS_r{N} per round).
  */
private[queries] object OracleSql {

  /** [[graft.functions.TextFunctions.tokenizeBm25]] applied to a SQL expr. */
  def tokSql(expr: String): String =
    s"""list_filter(list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'),
       | t -> len(t) > 0),
       | t -> (len(t) > 1 OR regexp_matches(t, '^[0-9]$$'))
       |      AND NOT list_contains(['the','a','an','and','or','but','in','on','at','to','for','of','with','is'], t))"""
      .stripMargin.replaceAll("\n", "")

  /** [[graft.functions.TextFunctions.tokenize]]. */
  def plainTokSql(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** Sequential-double dot product (matches Spark's zip_with+aggregate /
    * [[graft.functions.HashAlgos.dotF32]] association order).
    */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       | list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE)),
       | (acc, x) -> acc + x)""".stripMargin.replaceAll("\n", "")

  def normSqSql(a: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       | list_transform($a, x -> x::DOUBLE * x::DOUBLE)),
       | (acc, x) -> acc + x)""".stripMargin.replaceAll("\n", "")

  def cosineSql(a: String, b: String): String =
    s"CASE WHEN sqrt(${normSqSql(a)}) * sqrt(${normSqSql(b)}) > 0 " +
      s"THEN ${dotSql(a, b)} / (sqrt(${normSqSql(a)}) * sqrt(${normSqSql(b)})) ELSE 0.0 END"

  /** [[graft.functions.TextFunctions.polyHash]] (mult 31, mod 1e9+7) of a
    * string expr — the integer rolling hash both engines share.
    */
  def polyHashSql(expr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       | list_transform(string_split($expr, ''), c -> ord(c)::BIGINT)),
       | (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin.replaceAll("\n", "")

  /** The fixed demo retrieval query (terms all in the synthetic vocab). */
  val QueryText = "spark join filter window"

  /** The fixed phrase-search query (a frequent corpus bigram — adjacent
    * token order matters, unlike [[QueryText]]'s bag of words).
    */
  val PhraseText = "window join"

  /** BM25 scores CTE for an arbitrary query text over `documents`
    * (defines `post`/`lens`/`stats`/`idf`/`q`/`bm25`) — the per-query
    * parameterization the batched serving oracles embed once per
    * query block.
    */
  def bm25CteFor(queryText: String): String =
    bm25Cte.replace(s"'$QueryText'", s"'$queryText'")

  /** BM25 scores CTE for [[QueryText]] over `documents` (defines `bm25`). */
  val bm25Cte: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${tokSql("text")}) AS term FROM documents),
       |post AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
       |lens AS (SELECT doc_id, sum(tf)::BIGINT AS doc_len FROM post GROUP BY doc_id),
       |stats AS (SELECT avg(doc_len::DOUBLE) AS avgdl FROM lens),
       |corpus AS (SELECT count(*)::BIGINT AS n FROM documents),
       |idf AS (
       |  SELECT term, count(*)::BIGINT AS df,
       |         ln(((SELECT n FROM corpus)::DOUBLE - count(*) + 0.5) / (count(*) + 0.5) + 1.0) AS idf
       |  FROM post GROUP BY term),
       |q AS (SELECT unnest(${tokSql(s"'$QueryText'")}) AS term),
       |bm25 AS (
       |  SELECT p.doc_id,
       |         sum((i.idf * (p.tf * (1.2 + 1.0))) /
       |             (p.tf + 1.2 * ((1.0 - 0.75) + (0.75 * l.doc_len) / s.avgdl))) AS score
       |  FROM post p
       |  JOIN q USING (term) JOIN idf i USING (term) JOIN lens l USING (doc_id)
       |  CROSS JOIN stats s
       |  GROUP BY p.doc_id HAVING sum((i.idf * (p.tf * (1.2 + 1.0))) /
       |             (p.tf + 1.2 * ((1.0 - 0.75) + (0.75 * l.doc_len) / s.avgdl))) > 0)""".stripMargin
}
