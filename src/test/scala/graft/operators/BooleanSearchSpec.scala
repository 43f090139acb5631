package graft.operators

import graft.SparkSpec

/** Boolean search ([[BooleanSearch]]): parser shape (including the
  * oracle fixture pin), set semantics on a hand corpus, scoring over
  * positive terms only, and the pure-negative rejection.
  */
class BooleanSearchSpec extends SparkSpec {
  import BooleanSearch._
  import spark.implicits._

  test("parse: precedence, implicit AND, NOT, parentheses — incl. the oracle fixture") {
    assert(parse(spark, "(window OR join) AND filter NOT slow") ==
      And(And(Or(Term("window"), Term("join")), Term("filter")),
        Not(Term("slow"))))
    assert(parse(spark, "alpha beta") == // implicit AND
      And(Term("alpha"), Term("beta")))
    assert(parse(spark, "alpha OR beta gamma") == // AND binds tighter
      Or(Term("alpha"), And(Term("beta"), Term("gamma"))))
    assert(parse(spark, "alpha NOT (beta OR gamma)") ==
      And(Term("alpha"), Not(Or(Term("beta"), Term("gamma")))))
    intercept[IllegalArgumentException](parse(spark, "NOT alpha")) // pure negative
    intercept[IllegalArgumentException](parse(spark, "alpha AND"))
  }

  test("t15 batch fixtures: parse(string) == the oracle's hand-built AST") {
    // the t15_boolean_batch20 oracle builds its SQL from batchFixtureAst —
    // the real parser must agree on every fixture string, or the Spark
    // side (which parses) and the oracle (which doesn't) silently diverge
    graft.queries.KbQueries.BooleanBatch.zipWithIndex.foreach {
      case ((_, q), i) =>
        assert(parse(spark, q) == graft.queries.KbQueries.batchFixtureAst(i),
          s"fixture $i: $q")
    }
  }

  test("booleanTopKBatch ≡ per-query booleanTopK") {
    val docs = Seq(
      (1L, "window join filter fast"),
      (2L, "window filter slow path"),
      (3L, "join filter quick"),
      (4L, "window only here"),
      (5L, "filter alone"),
      (6L, "spark window filter"),
      (7L, "hash merge join window filter"))
    val ix = Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text")
    val queries = Seq(1L -> "(window OR join) AND filter NOT slow",
      2L -> "spark OR hash", 3L -> "filter NOT (join OR spark)",
      // true on the all-absent assignment (`a OR NOT b`): zero-term docs
      // "match" but carry no positive evidence — both paths must omit them
      4L -> "spark OR NOT filter")
    val batch = BooleanSearch.booleanTopKBatch(ix, spark, queries, 10)
      .as[(Long, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3)).sortBy(r => (-r._2, r._1))).toMap
    queries.foreach { case (qid, q) =>
      val single = BooleanSearch.booleanTopK(ix, spark, q, 10)
        .as[(Long, Double)].collect().toSeq.sortBy(r => (-r._2, r._1))
      assert(batch.getOrElse(qid, Nil) == single, s"query $qid '$q'")
    }
  }

  test("booleanTopK beyond 62 distinct terms: multi-word mask, same semantics") {
    // ADVICE r15 capped the single-Long mask at 62 distinct terms; the
    // r15 set-algebra fallback honored the unlimited-term contract but
    // measured 4-9× slower (tools/scale_r17's 70-term zipf rows), so r17
    // spreads the mask over ⌈T/62⌉ words — wide queries stay on the
    // one-pass batch plan. 70-term corpus, a 70-way OR plus a NOT: the
    // wide query's scores/order must agree with the narrow contract.
    val wide = (1 to 70).map(i => s"term$i")
    val docs = Seq(
      (1L, wide.take(35).mkString(" ")),
      (2L, wide.drop(35).mkString(" ")),
      (3L, s"${wide.head} unrelated words here"),
      (4L, "nothing matching at all"))
    val ix = Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text")
    val q = s"(${wide.mkString(" OR ")}) NOT ${wide.last}"
    val got = BooleanSearch.booleanTopK(ix, spark, q, 10)
      .as[(Long, Double)].collect().toSeq
    // doc 2 contains the NOT'd term -> excluded; docs 1 and 3 match and
    // carry positive evidence; doc 4 matches nothing
    assert(got.map(_._1).sorted == Seq(1L, 3L), s"got $got")
    // 35 matched terms must outscore 1
    assert(got.toMap.apply(1L) > got.toMap.apply(3L))
    // and the narrow form of the same shape still goes through the mask
    val narrow = BooleanSearch.booleanTopK(ix, spark,
      s"(${wide.head} OR ${wide(1)}) NOT ${wide.last}", 10)
      .as[(Long, Double)].collect().toSeq
    assert(narrow.map(_._1).sorted == Seq(1L, 3L), s"got $narrow")
  }

  test("mask-plan match sets == brute-force driver set algebra over 60 random ASTs") {
    // the batch path compiles each AST to a bitwise predicate over a
    // per-doc term-presence mask — sweep random ASTs against a literal
    // driver evaluation of the same set semantics on a known corpus
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = (1L to 32L).map { i =>
      // doc i contains vocab(j) iff bit j of i is set → every subset
      // of the vocabulary appears as some document's token set
      (i, vocab.indices.filter(j => ((i >> j) & 1L) == 1L)
        .map(vocab).mkString(" ") + s" filler$i")
    }
    val corpus = docs.map(_._1).toSet
    val tokSets = docs.map { case (id, t) => id -> t.split(" ").toSet }.toMap
    val ix = Bm25.buildIndex(docs.toDF("doc_id", "text"), "doc_id", "text")
    def evalDriver(n: Node, id: Long): Boolean = n match {
      case Term(t) => tokSets(id).contains(t)
      case And(l, r) => evalDriver(l, id) && evalDriver(r, id)
      case Or(l, r) => evalDriver(l, id) || evalDriver(r, id)
      case Not(x) => !evalDriver(x, id)
    }
    val rnd = new scala.util.Random(7)
    def gen(depth: Int): Node =
      if (depth == 0 || rnd.nextInt(3) == 0) Term(vocab(rnd.nextInt(vocab.size)))
      else rnd.nextInt(3) match {
        case 0 => And(gen(depth - 1), gen(depth - 1))
        case 1 => Or(gen(depth - 1), gen(depth - 1))
        case _ => Not(gen(depth - 1))
      }
    def render(n: Node): String = n match {
      case Term(t) => t
      case And(l, r) => s"(${render(l)} AND ${render(r)})"
      case Or(l, r) => s"(${render(l)} OR ${render(r)})"
      case Not(x) => s"(NOT ${render(x)})"
    }
    var batch = Vector.empty[(Long, Node)]
    while (batch.size < 60) {
      val ast = gen(3)
      if (positiveTerms(ast).nonEmpty) batch :+= ((batch.size + 1).toLong, ast)
    }
    val got = BooleanSearch.booleanTopKBatch(ix, spark,
        batch.map { case (qid, ast) => qid -> render(ast) }, 40)
      .select("query_id", "doc_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    batch.foreach { case (qid, ast) =>
      // expected output ids: the driver match set MINUS docs with no
      // positive-term evidence (the documented scoring contract; k=40
      // exceeds the 32-doc corpus so no top-k cut interferes)
      val pos = positiveTerms(ast).toSet
      val expect = corpus.filter(evalDriver(ast, _))
        .filter(id => tokSets(id).intersect(pos).nonEmpty)
      assert(got.getOrElse(qid, Set.empty) == expect,
        s"query $qid: ${render(ast)}")
    }
  }

  test("render→parse round-trip over 200 seeded random ASTs") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val rnd = new scala.util.Random(42)
    def gen(depth: Int): Node =
      if (depth == 0 || rnd.nextInt(3) == 0) Term(vocab(rnd.nextInt(vocab.size)))
      else rnd.nextInt(3) match {
        case 0 => And(gen(depth - 1), gen(depth - 1))
        case 1 => Or(gen(depth - 1), gen(depth - 1))
        case _ => Not(gen(depth - 1))
      }
    def render(n: Node): String = n match {
      case Term(t) => t
      case And(l, r) => s"(${render(l)} AND ${render(r)})"
      case Or(l, r) => s"(${render(l)} OR ${render(r)})"
      case Not(x) => s"(NOT ${render(x)})"
    }
    var checked = 0
    while (checked < 200) {
      val ast = gen(4)
      if (positiveTerms(ast).nonEmpty) {
        val q = render(ast)
        assert(parse(spark, q) == ast, s"round-trip failed for: $q")
        checked += 1
      }
    }
  }

  test("set semantics: AND/OR/NOT over a hand-checkable corpus") {
    val docs = Seq(
      (1L, "window join filter fast"), // W∪J, F, no slow -> match
      (2L, "window filter slow path"), // has slow -> excluded
      (3L, "join filter quick"), // match
      (4L, "window only here"), // no filter -> out
      (5L, "filter alone"), // no window/join -> out
      (6L, "window join filter slow")) // slow -> out
      .toDF("doc_id", "text")
    val ix = Bm25.buildIndex(docs, "doc_id", "text")
    val got = BooleanSearch.booleanTopK(ix, spark,
        "(window OR join) AND filter NOT slow", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 3L), s"got $got")
    got.foreach { case (_, s) => assert(s > 0) }
  }

  test("scoring uses only positive terms; negated terms contribute nothing") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "alpha gamma")).toDF("doc_id", "text")
    val ix = Bm25.buildIndex(docs, "doc_id", "text")
    // both match "alpha NOT delta"; identical alpha evidence -> id order
    val got = BooleanSearch.booleanTopK(ix, spark, "alpha NOT delta", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(0)._2 == got(1)._2)
  }

  test("OR of a NOT branch: matches without positive evidence are omitted") {
    val docs = Seq(
      (1L, "alpha beta"),
      (2L, "gamma delta")).toDF("doc_id", "text")
    val ix = Bm25.buildIndex(docs, "doc_id", "text")
    // doc 2 matches via NOT beta but has no alpha evidence -> omitted
    val got = BooleanSearch.booleanTopK(ix, spark, "alpha OR NOT beta", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L))
    // the raw match set DOES contain doc 2 (the documented contract gap)
    val m = BooleanSearch.matchingDocs(ix,
        parse(spark, "alpha OR NOT beta"))
      .as[Long].collect().toSet
    assert(m == Set(1L, 2L))
  }
}
