package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // leaf on the shared bucket-pruned, term-pushdown projection)
    val leaves = Bm25.prunedPostings(ix, terms)
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
    *
    * Delegates to the mask-based [[booleanTopKBatch]] plan (batch of 1):
    * one pruned postings pass + a codegen bitwise predicate replaces the
    * per-leaf INTERSECT/UNION/EXCEPT exchanges of the [[matchingDocs]]
    * set-algebra form (which remains the doc-SET api — it alone keeps the
    * zero-evidence NOT matches). The delegation is unconditional since
    * r17: the mask spreads over ⌈T/62⌉ Long words, so wide queries keep
    * the one-pass plan — the former >62-term set-algebra fallback
    * measured 4-9× slower on the zipf receipt's 70-term query
    * (tools/scale_r17), a cliff in the public single-query API's
    * unlimited-term contract (ADVICE r15) that no longer exists.
    */
  def booleanTopK(ix: Bm25.Index, spark: SparkSession, query: String,
                  k: Int, k1: Double = Bm25.K1,
                  b: Double = Bm25.B): DataFrame =
    booleanTopKBatch(ix, spark, Seq((0L, query)), k, k1, b)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))

  /** BATCHED boolean retrieval: N parsed queries evaluated in ONE
    * DataFrame DAG whose shuffle count does NOT grow with N. One pruned
    * postings pass builds a per-(query, doc) term-presence BITMASK
    * (each query's terms get private bit slots, `bit_or`-style sum);
    * every query's boolean tree then compiles to a pure bitwise
    * predicate over that mask — codegen, zero extra shuffles — instead
    * of per-query INTERSECT/UNION/EXCEPT chains. A second pruned pass
    * scores the positive terms and a per-query window takes the top-k.
    * Value-identical to [[booleanTopK]] per query: a doc's mask bit is
    * set iff the doc is in that term's posting set, so the compiled
    * predicate IS the set algebra. Docs carrying NONE of a query's
    * terms (absent from the mask table) need no recovery even when the
    * tree is true on the all-absent assignment (`a OR NOT b` shapes):
    * such a doc has no positive-term postings either, so the scoring
    * join omits it — the same "matches without positive evidence are
    * omitted" contract [[booleanTopK]] has (spec-pinned). Returns
    * `(query_id, doc_id, score)` — top-k per query by
    * (score DESC, doc_id).
    *
    * 100 TB shape: two bucket-pruned postings scans TOTAL for the whole
    * batch, one groupBy each, one window — the same plan at N=2 and
    * N=2000. Masks are ⌈maxTerms/62⌉ Long words per (query, doc) — one
    * agg column per word, so term width costs columns, never exchanges.
    */
  def booleanTopKBatch(ix: Bm25.Index, spark: SparkSession,
                       queries: Seq[(Long, String)], k: Int,
                       k1: Double = Bm25.K1,
                       b: Double = Bm25.B): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "empty boolean batch")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query_id in batch")
    val parsed = queries.map { case (qid, q) => (qid, parse(spark, q)) }
    val slots: Map[Long, Map[String, Int]] = parsed.map { case (qid, n) =>
      qid -> allTerms(n).distinct.sorted.zipWithIndex.toMap
    }.toMap
    // 62 slot bits per mask WORD; a query wider than one word spreads its
    // terms over ⌈T/62⌉ per-(query, doc) mask columns — same one-pass
    // sum-as-bit_or aggregation, one extra agg column per extra word, so
    // the >62-term shape keeps the batch plan instead of falling back to
    // per-leaf set-algebra exchanges (r17: the zipf receipt measured that
    // fallback 4-9× slower than the mask plan on a 70-term query — a
    // cliff this removes)
    val WordBits = 62
    val nWords = math.max(1,
      slots.valuesIterator.map(s => (s.size + WordBits - 1) / WordBits)
        .max)
    val qtermRows = parsed.flatMap { case (qid, _) =>
      slots(qid).toSeq.sortBy(_._2)
        .map { case (t, i) => (qid, t, i / WordBits, 1L << (i % WordBits)) }
    }
    val allT = qtermRows.map(_._2).distinct
    val masks = Bm25.prunedPostings(ix, allT) // bucket dirs + term IN pushdown
      .select("doc_id", "term")
      .join(broadcast(qtermRows.toDF("query_id", "term", "word", "bit")),
        "term")
      .groupBy("query_id", "doc_id")
      // postings are unique per (term, doc) and slots unique per
      // (query, term), so per-word sum == bit_or; a word with none of the
      // doc's terms aggregates to NULL → coalesced to 0 at the predicate
      .agg(
        sum(when(col("word") === 0, col("bit"))).as("mask_0"),
        (1 until nWords).map(w =>
          sum(when(col("word") === w, col("bit"))).as(s"mask_$w")): _*)
    def evalMask(n: Node, slot: Map[String, Int]): Column = n match {
      case Term(t) =>
        val i = slot(t)
        coalesce(col(s"mask_${i / WordBits}"), lit(0L))
          .bitwiseAND(lit(1L << (i % WordBits))) =!= lit(0L)
      case And(l, r) => evalMask(l, slot) && evalMask(r, slot)
      case Or(l, r) => evalMask(l, slot) || evalMask(r, slot)
      case Not(x) => !evalMask(x, slot)
    }
    val predicate = parsed.map { case (qid, n) =>
      (col("query_id") === lit(qid)) && evalMask(n, slots(qid))
    }.reduce(_ || _)
    val matches = masks.filter(predicate).select("query_id", "doc_id")
    val posPairs = parsed.flatMap { case (qid, n) =>
      positiveTerms(n).map(t => (qid, t))
    }
    val posT = posPairs.map(_._2).distinct
    val stats = ix.idf.select("term", "idf")
      .filter(col("term").isin(posT: _*))
    // bounded-agg per-query top-k — no full sort of the scored match set
    TopK.perGroupTopK(
      Bm25.prunedPostings(ix, posT) // bucket dirs + term IN pushdown
        .join(broadcast(posPairs.toDF("query_id", "term")), "term")
        .join(matches, Seq("query_id", "doc_id"), "left_semi")
        .join(broadcast(stats), "term")
        .groupBy("query_id", "doc_id")
        .agg(round(sum(Bm25.termScore(col("tf"), col("doc_len"),
          lit(ix.avgdl), col("idf"), k1, b)), 4).as("score")),
      "query_id", "doc_id", "score", k)
  }
}
