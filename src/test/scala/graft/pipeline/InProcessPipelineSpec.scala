package graft.pipeline

import graft.SparkSpec
import graft.embed.Embedder
import graft.operators.Bm25
import org.apache.spark.sql.functions._

/** The fully in-process hit-serving path (`KbPipeline.hitsInProcess`) must
  * be value-identical, column for column and row for row, to the
  * distributed DAG it replaces — the same pinning contract
  * InMemoryServingSpec holds for the vector tier, extended through fusion,
  * the text-fetch join, and the head/tail lexical rerank. The fixture
  * deliberately exercises the contract's edges: a null-text chunk (Jaccard
  * null path → 0.0), an embedding id absent from the chunk table (the
  * inner-join drop), and a corpus larger than rerankingTopK (a non-empty
  * tail kept at its original ranks).
  */
class InProcessPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val texts: Seq[(Long, String)] =
    (1L to 30L).map { i =>
      i -> (s"document number $i about " +
        (if (i % 3 == 0) "spark joins and shuffles" else "window ranking functions") +
        s" with extra tokens t$i")
    } :+ (31L -> null.asInstanceOf[String])

  private def chunks = texts.zipWithIndex
    .map { case ((id, t), i) => (id, t, if (id % 2 == 0) "a" else "b", i) }
    .toDF("doc_id", "text", "sourcedoc", "sid")

  private def embeddings = {
    val p = Embedder.Deterministic(16)
    // id 100 exists only on the vector side: the distributed text fetch is
    // an inner join, so the warm path must drop it identically
    (texts.map { case (id, t) =>
      (id, p.embedBatch(Seq(Option(t).getOrElse(""))).head)
    } :+ (100L, p.embedBatch(Seq("spark joins")).head))
      .toDF("doc_id", "embedding")
  }

  test("warm in-process hits == distributed DAG hits, column for column") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val q = "spark joins ranking"
    val ix = Bm25.cachedIndex("inproc-spec", ch, "doc_id", "text")
    val warm = KbPipeline.query(spark, ch, emb, q,
      bm25Index = Some(ix), corpusKey = Some("inproc-spec")).hits
    val dist = KbPipeline.query(spark, ch, emb, q,
      bm25Index = Some(ix), corpusKey = None).hits
    assert(warm.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      s"warm path did not serve a LocalRelation:\n${warm.queryExecution.optimizedPlan}")
    assert(warm.columns.toSeq == dist.columns.toSeq,
      s"${warm.columns.toSeq} vs ${dist.columns.toSeq}")
    val w = warm.collect().map(_.toSeq).toSeq
    val d = dist.collect().map(_.toSeq).toSeq
    assert(w == d, s"warm:\n${w.mkString("\n")}\ndistributed:\n${d.mkString("\n")}")
    // the fixture genuinely exercised head AND tail
    assert(w.size > 20, s"expected a non-empty rerank tail, got ${w.size} rows")
    assert(w.exists(_.last.asInstanceOf[Int] > 20))
  }

  test("learned rerank scorer: warm in-process == distributed, and order differs from lexical") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val q = "spark joins ranking"
    val cfg = graft.config.KbConfig(rerankingModel = "learned")
    val ix = Bm25.cachedIndex("inproc-spec-l", ch, "doc_id", "text")
    val warm = KbPipeline.query(spark, ch, emb, q, cfg,
      bm25Index = Some(ix), corpusKey = Some("inproc-spec-l")).hits
    val dist = KbPipeline.query(spark, ch, emb, q, cfg,
      bm25Index = Some(ix), corpusKey = None).hits
    assert(warm.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val w = warm.collect().map(_.toSeq).toSeq
    val d = dist.collect().map(_.toSeq).toSeq
    assert(w == d, s"warm:\n${w.mkString("\n")}\ndistributed:\n${d.mkString("\n")}")
    // the learned sigmoid produces different rerank scores than the
    // lexical jaccard (same plumbing, different model — the seam works)
    val lex = KbPipeline.query(spark, ch, emb, q,
      bm25Index = Some(ix), corpusKey = None).hits.collect().map(_.toSeq).toSeq
    assert(lex != d, "learned scorer should change rerank scores vs lexical")
  }

  test("vector-side id missing from chunks is dropped on both paths") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val ix = Bm25.cachedIndex("inproc-spec2", ch, "doc_id", "text")
    val warm = KbPipeline.query(spark, ch, emb, "spark joins",
      bm25Index = Some(ix), corpusKey = Some("inproc-spec2")).hits
    assert(!warm.collect().exists(_.getLong(0) == 100L))
  }

  test("warm in-process BATCH hits == distributed batch DAG, per query") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val qs = Seq(1L -> "spark joins ranking", 2L -> "window functions")
    val ix = Bm25.cachedIndex("inproc-spec-b", ch, "doc_id", "text")
    val warm = KbPipeline.queryBatch(spark, ch, emb, qs,
      bm25Index = Some(ix), corpusKey = Some("inproc-spec-b"))
    val dist = KbPipeline.queryBatch(spark, ch, emb, qs,
      bm25Index = Some(ix), corpusKey = None)
    assert(warm.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(warm.columns.toSeq == dist.columns.toSeq)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(7))
    val w = warm.collect().sortBy(key).map(_.toSeq).toSeq
    val d = dist.collect().sortBy(key).map(_.toSeq).toSeq
    assert(w == d, s"warm:\n${w.mkString("\n")}\ndistributed:\n${d.mkString("\n")}")
  }

  test("non-flat tier: warm stitch (collected vtop + driver fusion/rerank) == distributed") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val ix = Bm25.cachedIndex("inproc-spec-ivf", ch, "doc_id", "text")
    val srv = graft.operators.VectorSearch.buildServing(emb, "doc_id",
      "embedding", graft.operators.VectorSearch.IndexStrategy.Ivf(4))
    val cfgIvf = graft.config.KbConfig(indexType = "ivf", ivfNprobe = 2)
    val warm = KbPipeline.query(spark, ch, emb, "spark joins ranking",
      cfg = cfgIvf, bm25Index = Some(ix), serving = srv,
      corpusKey = Some("inproc-spec-ivf")).hits
    val dist = KbPipeline.query(spark, ch, emb, "spark joins ranking",
      cfg = cfgIvf, bm25Index = Some(ix), serving = srv,
      corpusKey = None).hits
    assert(warm.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val w = warm.collect().map(_.toSeq).toSeq
    val d = dist.collect().map(_.toSeq).toSeq
    assert(w == d, s"warm:\n${w.mkString("\n")}\ndistributed:\n${d.mkString("\n")}")
  }

  test("IVFPQ tier: resident ADC+refine == distributed probe/ADC/re-rank") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val ix = Bm25.cachedIndex("inproc-spec-pq", ch, "doc_id", "text")
    val srv = graft.operators.VectorSearch.buildServing(emb, "doc_id",
      "embedding", graft.operators.VectorSearch.IndexStrategy.IvfPq(4, 4))
    val cfgPq = graft.config.KbConfig(indexType = "ivfpq", ivfNprobe = 2)
    val warm = KbPipeline.query(spark, ch, emb, "spark joins ranking",
      cfg = cfgPq, bm25Index = Some(ix), serving = srv,
      corpusKey = Some("inproc-spec-pq")).hits
    val dist = KbPipeline.query(spark, ch, emb, "spark joins ranking",
      cfg = cfgPq, bm25Index = Some(ix), serving = srv,
      corpusKey = None).hits
    assert(warm.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val w = warm.collect().map(_.toSeq).toSeq
    val d = dist.collect().map(_.toSeq).toSeq
    assert(w == d, s"warm:\n${w.mkString("\n")}\ndistributed:\n${d.mkString("\n")}")
  }

  test("duplicate query ids decline warm batch serving (distributed merges them)") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val ix = Bm25.cachedIndex("inproc-spec-dup", ch, "doc_id", "text")
    val qs = Seq(1L -> "spark joins", 1L -> "window functions")
    val out = KbPipeline.queryBatch(spark, ch, emb, qs,
      bm25Index = Some(ix), corpusKey = Some("inproc-spec-dup"))
    assert(!out.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "duplicated query_id must fall back to the distributed batch")
  }

  test("category filter and weighted fusion keep the distributed plan") {
    val ch = chunks.localCheckpoint(true)
    val emb = embeddings.localCheckpoint(true)
    val ix = Bm25.cachedIndex("inproc-spec3", ch, "doc_id", "text")
    val weighted = KbPipeline.query(spark, ch, emb, "spark joins",
      cfg = graft.config.KbConfig(fusionMethod = "weighted"),
      bm25Index = Some(ix), corpusKey = Some("inproc-spec3")).hits
    assert(!weighted.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
  }
}
