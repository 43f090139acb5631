package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Boolean keyword queries over the BM25 index — `AND` / `OR` / `NOT` /
  * parentheses, implicit AND by juxtaposition: a user-facing query
  * syntax neither the reference nor plain bag-of-words BM25 offers (the
  * reference's own synonym expansion EMITS `(word OR syn)` strings,
  * `/root/reference/query/enhancement.py:119-126`, then flattens them
  * into a bag — here the syntax actually evaluates).
  *
  * Semantics: a document matches the boolean expression over its BM25
  * token SET; `NOT x` means membership in the indexed corpus (documents
  * with ≥1 token — the lengths table) minus `x`'s matches. Matching
  * documents are scored by standard BM25 over the query's POSITIVE
  * terms (those under an even number of NOTs); pure-negative queries
  * are rejected. Deterministic: set algebra is exact, scores round to
  * 4 dp, order (score DESC, id).
  *
  * 100 TB shape: each leaf term is a pruned-postings lookup (bucketed
  * at rest); AND/OR/NOT compose as distinct-id set operations —
  * hash-partitioned on doc_id, exchange-reusable — and the final
  * scoring pass is the standard literal-term-list BM25 plan restricted
  * (semi-join) to the match set. Nothing scans more than the query
  * terms' postings.
  */
object BooleanSearch {

  sealed trait Node
  final case class Term(t: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node

  /** Recursive-descent parser. Grammar (keywords case-insensitive):
    * expr := and (OR and)* ; and := unary ((AND)? unary)* ;
    * unary := NOT unary | '(' expr ')' | term.
    * Terms are run through the BM25 analysis tokenizer; a term that
    * analyzes to nothing is a syntax error.
    */
  def parse(spark: SparkSession, q: String): Node = {
    val raw = q.replace("(", " ( ").replace(")", " ) ")
      .trim.split("\\s+").toList.filter(_.nonEmpty)
    var toks = raw
    def peek: Option[String] = toks.headOption
    def pop(): String = {
      require(toks.nonEmpty, s"unexpected end of query: $q")
      val h = toks.head; toks = toks.tail; h
    }
    def kw(s: String, k: String): Boolean = s.equalsIgnoreCase(k)
    def atom(): Node = pop() match {
      case "(" =>
        val e = expr()
        require(peek.contains(")"), s"expected ) in: $q"); pop(); e
      case t =>
        require(!kw(t, "AND") && !kw(t, "OR") && t != ")",
          s"unexpected '$t' in: $q")
        val analyzed = TextFunctions.tokenizeBm25Value(spark, t)
        require(analyzed.nonEmpty, s"term '$t' analyzes to nothing")
        analyzed.map(Term(_): Node).reduce(And(_, _))
    }
    def unary(): Node =
      if (peek.exists(kw(_, "NOT"))) { pop(); Not(unary()) } else atom()
    def and(): Node = {
      var n = unary()
      while (peek.exists(s => !kw(s, "OR") && s != ")")) {
        if (peek.exists(kw(_, "AND"))) pop()
        n = And(n, unary())
      }
      n
    }
    def expr(): Node = {
      var n = and()
      while (peek.exists(kw(_, "OR"))) { pop(); n = Or(n, and()) }
      n
    }
    val root = expr()
    require(toks.isEmpty, s"trailing input '${toks.mkString(" ")}' in: $q")
    require(positiveTerms(root).nonEmpty, s"pure-negative query: $q")
    root
  }

  /** Terms under an even number of NOTs — the scoring terms. */
  def positiveTerms(n: Node): Seq[String] = {
    def go(n: Node, neg: Boolean): Seq[String] = n match {
      case Term(t) => if (neg) Nil else Seq(t)
      case And(l, r) => go(l, neg) ++ go(r, neg)
      case Or(l, r) => go(l, neg) ++ go(r, neg)
      case Not(x) => go(x, !neg)
    }
    go(n, neg = false).distinct.sorted
  }

  private def allTerms(n: Node): Seq[String] = n match {
    case Term(t) => Seq(t)
    case And(l, r) => allTerms(l) ++ allTerms(r)
    case Or(l, r) => allTerms(l) ++ allTerms(r)
    case Not(x) => allTerms(x)
  }

  /** The distinct matching doc-id set for `node`. */
  def matchingDocs(ix: Bm25.Index, node: Node): DataFrame = {
    val terms = allTerms(node).distinct
    // one pruned scan feeds every leaf (the term filter re-applies per
    // leaf on the shared, bucket-pruned projection)
    val leaves = ix.postings
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("term"))
    val corpus = ix.lengths.select(col("doc_id")).distinct()
    def eval(n: Node): DataFrame = n match {
      case Term(t) => leaves.filter(col("term") === t)
        .select("doc_id").distinct()
      case And(l, r) => eval(l).intersect(eval(r))
      case Or(l, r) => eval(l).union(eval(r)).distinct()
      case Not(x) => corpus.except(eval(x))
    }
    eval(node)
  }

  /** Top-k boolean retrieval: `(doc_id, score)` — BM25 over the positive
    * terms, restricted to the boolean match set, rounded 4 dp, ordered
    * (score DESC, doc_id). A match carrying ZERO positive-term evidence
    * (possible only when OR-ing a NOT branch, e.g. `a OR NOT b`) has no
    * score and is omitted — ranked retrieval needs evidence, contract
    * shared with the SQL twin by construction.
    */
  def booleanTopK(ix: Bm25.Index, spark: SparkSession, query: String,
                  k: Int, k1: Double = Bm25.K1,
                  b: Double = Bm25.B): DataFrame = {
    val node = parse(spark, query)
    val pos = positiveTerms(node)
    val matches = matchingDocs(ix, node)
    val pl =
      if (ix.postings.columns.contains("doc_len")) ix.postings
      else ix.postings.join(ix.lengths, "doc_id")
    val stats = ix.idf.select("term", "idf").filter(col("term").isin(pos: _*))
    pl.filter(col("term").isin(pos: _*))
      .join(matches, Seq("doc_id"), "left_semi")
      .join(broadcast(stats), "term")
      .groupBy("doc_id")
      .agg(round(sum(Bm25.termScore(col("tf"), col("doc_len"),
        lit(ix.avgdl), col("idf"), k1, b)), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BATCHED boolean retrieval: N parsed queries evaluated in ONE
    * DataFrame DAG — each query's set algebra and scoring subplan is a
    * branch of a single union, so the whole batch is one Spark action and
    * the per-query cost is the pruned-postings work itself, not per-action
    * scheduling overhead. Value-identical to [[booleanTopK]] per query by
    * construction (the branches ARE that plan). Returns
    * `(query_id, doc_id, score)` — top-k per query, each branch already
    * (score DESC, doc_id)-cut.
    *
    * 100 TB shape: every branch's leaves are pruned (bucket-partitioned)
    * postings lookups; a shared scan feeds equal-term leaves via exchange
    * reuse, and branch results are k-bounded before the union.
    */
  def booleanTopKBatch(ix: Bm25.Index, spark: SparkSession,
                       queries: Seq[(Long, String)], k: Int,
                       k1: Double = Bm25.K1,
                       b: Double = Bm25.B): DataFrame = {
    require(queries.nonEmpty, "empty boolean batch")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query_id in batch")
    queries.map { case (qid, q) =>
      booleanTopK(ix, spark, q, k, k1, b)
        .select(lit(qid).as("query_id"), col("doc_id"), col("score"))
    }.reduce(_ unionByName _)
  }
}
