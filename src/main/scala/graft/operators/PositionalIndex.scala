package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional inverted index — the stored serving path for phrase
  * queries ([[PhraseSearch]] recomputes from the corpus text per query;
  * at 100 TB phrase queries must serve from an index, the same
  * build-once/serve-many trade as the BM25 store,
  * `/root/reference/embedding/bm25_manager.py:71-102` analogue with a
  * positions column the reference never had).
  *
  * At rest: `(term, term_bucket, doc_id, positions ARRAY<INT>, tf,
  * doc_len)` parquet partitioned by `term_bucket` (the [[Bm25]] crc32
  * bucketing — a phrase's handful of terms touches a handful of bucket
  * directories) + a one-row stats sidecar `(n, avgdl)`.
  *
  * Phrase semantics from positions: an occurrence is an ADJACENT-START
  * match — position p such that `p + i ∈ positions(termᵢ)` for every
  * phrase term. Repeated-token phrases count overlapping starts
  * (`a a a` for `a a` → 2) — the standard positional-index convention,
  * which the computed [[PhraseSearch]] tier shares, so both tiers agree
  * on every phrase (spec-pinned).
  */
object PositionalIndex {

  final case class Index(postings: DataFrame, stats: DataFrame) {
    lazy val snapshot: (Long, Double) = {
      val r = stats.select(col("n"), col("avgdl")).head()
      (r.getLong(0), r.getDouble(1))
    }
    def corpusSize: Long = snapshot._1
    def avgdl: Double = snapshot._2

    /** The recorded at-rest layout ("sorted"/"unsorted"); None for
      * pre-r18 stores and freshly-built in-memory indexes — the signal
      * the search verb warns on and [[PositionalIndex.relayout]]
      * migrates.
      */
    def layout: Option[String] =
      if (stats.columns.contains("layout"))
        Option(stats.select(col("layout")).head().getString(0))
      else None
  }

  /** One corpus pass: per-(term, doc) sorted position lists with tf and
    * the denormalized doc_len, plus the corpus stats row.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            termBuckets: Int = Bm25.DefaultTermBuckets): Index = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokenize(col(textCol)).as("l"))
    val post = toks
      .select(col("doc_id"), size(col("l")).as("doc_len"),
        posexplode(col("l")).as(Seq("p", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("p"))).as("positions"),
        count(lit(1)).as("tf"), first(col("doc_len")).as("doc_len"))
      .withColumn("term_bucket", Bm25.termBucket(col("term"), termBuckets))
    val stats = toks.filter(size(col("l")) > 0)
      .agg(count(lit(1)).as("n"),
        avg(size(col("l")).cast("double")).as("avgdl"))
      .withColumn("term_buckets", lit(termBuckets))
    Index(post, stats)
  }

  /** A bucket pays for term-sorting once it holds at least this many
    * distinct terms: below it a bucket resolves to 1-2 terms and the
    * directory pruning already did the work, while the consolidating
    * repartition only costs parallelism (the r16 word-soup A/B, 31 terms
    * / 64 buckets: sorted 17.2 s vs unsorted 15.0 s at 100×); above it
    * the term IN (…) pushdown skips to page runs via parquet min/max
    * stats (the r17 Zipf A/B, ~50k terms: sorted 3.13 s vs unsorted
    * 4.14 s at 100× — tools/scale_r17).
    */
  val SortedLayoutMinTermsPerBucket = 4.0

  /** Persist the index partitioned by term bucket (file-level pruning at
    * serve time), stats as a one-row sidecar. The within-bucket layout is
    * VOCABULARY-AWARE by default (None): term-sorted in the
    * [[Bm25.writeIndex]] style when the corpus carries at least
    * [[SortedLayoutMinTermsPerBucket]] distinct terms per bucket (page
    * pruning then has something to skip — realistic text), the plain
    * parallel write otherwise (degenerate small vocabularies, where the
    * r16 A/B measured sorting as a pure loss). One vocab-sized
    * countDistinct at write time decides; pass Some(_) to force a layout
    * (the Scale A/B rows do).
    */
  def write(ix: Index, dir: String,
            termSorted: Option[Boolean] = None): Unit = {
    val sorted = termSorted.getOrElse(autoSorted(ix))
    writePostings(ix.postings, sorted, s"$dir/postings")
    // the layout RECORDED in stats (verdict r18 #6): serve paths and the
    // relayout migration can tell how the postings lie at rest; pre-r18
    // stores lack the column and read as layout-unknown
    ix.stats.withColumn("layout", lit(if (sorted) "sorted" else "unsorted"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** The vocabulary-aware layout rule ([[SortedLayoutMinTermsPerBucket]]);
    * one vocab-sized countDistinct decides.
    */
  private def autoSorted(ix: Index): Boolean = {
    val nTerms = ix.postings.agg(
      org.apache.spark.sql.functions.countDistinct(col("term")))
      .head().getLong(0)
    val nBuckets = math.max(ix.stats.select(col("term_buckets"))
      .head().getInt(0), 1)
    nTerms.toDouble / nBuckets >= SortedLayoutMinTermsPerBucket
  }

  private def writePostings(postings: DataFrame, sorted: Boolean,
                            path: String): Unit = {
    val post =
      if (sorted)
        postings.repartition(col("term_bucket"))
          .sortWithinPartitions("term_bucket", "term", "doc_id")
      else postings
    post.write.mode("overwrite").partitionBy("term_bucket").parquet(path)
  }

  def read(spark: SparkSession, dir: String): Index =
    Index(spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/stats"))

  /** Migrate an existing at-rest store's within-bucket layout (verdict
    * r18 #6): stores written before the layout rule — or under the OLD
    * unsorted default — otherwise serve forever unsorted even on corpora
    * where page pruning pays. Rewrites ONLY the postings directory (in
    * the target layout, auto-decided by the vocabulary rule unless
    * forced) plus the layout field of the stats sidecar; every stats
    * value and the postings ROW SET are preserved, so serving is
    * value-identical before and after (spec-pinned). The rewrite
    * snapshots the tables into checkpoint blocks first — the source
    * files are never read by the write that truncates them. Returns true
    * when a rewrite happened, false when the store already records the
    * target layout.
    */
  def relayout(spark: SparkSession, dir: String,
               termSorted: Option[Boolean] = None): Boolean = {
    val ix = read(spark, dir)
    val sorted = termSorted.getOrElse(autoSorted(ix))
    val target = if (sorted) "sorted" else "unsorted"
    if (ix.layout.contains(target)) return false
    // SNAPSHOT both tables out of the directory before overwriting it:
    // a lazy plan must never read the files its own write is truncating.
    // The DataFrame writer's overwrite is preferred over a staged
    // filesystem rename — it participates in the session's listing/cache
    // invalidation, and object stores implement rename as copy anyway.
    // The checkpoint spills beyond memory; a relayout is a full rewrite
    // either way. Callers holding pre-migration Index handles must
    // re-read: their plans pin the replaced part files (the spec
    // demonstrates both contracts).
    val snap = ix.postings.localCheckpoint(true)
    val statsRow = ix.stats.drop("layout").localCheckpoint(true)
      .withColumn("layout", lit(target))
    writePostings(snap, sorted, s"$dir/postings")
    statsRow.coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    snap.unpersist()
    true
  }

  /** Per-document adjacent-start phrase count served FROM the index:
    * `(doc_id, tf, doc_len)`, tf > 0 rows only. The scan touches only
    * the phrase terms' bucket partitions; each term's postings join on
    * doc_id and the shifted position lists intersect.
    */
  def phraseStats(ix: Index, phraseTokens: Seq[String]): DataFrame = {
    require(phraseTokens.nonEmpty, "empty phrase")
    val buckets = {
      val n = ix.stats.select(col("term_buckets")).head().getInt(0)
      phraseTokens.map(Bm25.termBucketValue(_, n)).distinct
    }
    val pruned = ix.postings
      .filter(col("term_bucket").isin(buckets: _*))
    val sides = phraseTokens.zipWithIndex.map { case (t, i) =>
      val side = pruned.filter(col("term") === t)
      if (i == 0)
        side.select(col("doc_id"), col("doc_len"),
          col("positions").as(s"pos_$i"))
      else side.select(col("doc_id"), col("positions").as(s"pos_$i"))
    }
    val joined = sides.reduce((a, b) => a.join(b, "doc_id"))
    val matched = phraseTokens.indices.tail.foldLeft(col("pos_0")) {
      (acc, i) => array_intersect(acc, transform(col(s"pos_$i"), x => x - i))
    }
    joined
      .select(col("doc_id"), size(matched).cast("long").as("tf"),
        col("doc_len").cast("long").as("doc_len"))
      .filter(col("tf") > 0)
  }

  /** Top-k BM25-scored phrase search from the stored index — the
    * [[PhraseSearch.phraseTopK]] contract (idf from the phrase's df,
    * standard saturation/length normalization, 4 dp, (score DESC, id))
    * with index-served stats and the adjacent-start tf.
    */
  def phraseTopK(ix: Index, phraseText: String, k: Int,
                 k1: Double = Bm25.K1, b: Double = Bm25.B): DataFrame = {
    val ptoks = LateInteraction.tokenizeValue(phraseText)
    val st = phraseStats(ix, ptoks)
    val withDf = st.crossJoin(broadcast(st.agg(count(lit(1)).as("df"))))
    val idf = log((lit(ix.corpusSize.toDouble) - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    withDf.select(col("doc_id"),
        round(
          idf * (col("tf") * (k1 + 1.0)) /
            (col("tf") +
              lit(k1) * (lit(1.0 - b) +
                (lit(b) * col("doc_len")) / lit(ix.avgdl))),
          4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BATCHED phrase search from the stored index: N phrases in ONE
    * DataFrame DAG whose shuffle count does not grow with N. The
    * per-query position-list join chain of [[phraseTopK]] is replaced by
    * a requirement join: every query token becomes a `(query_id, term,
    * offset)` requirement, ONE pruned postings pass explodes the matched
    * terms' position lists, and each position satisfies the requirement
    * at `start = p − offset`. A start is a phrase occurrence iff ALL the
    * query's offsets are satisfied — and since a fixed (query, doc,
    * start, offset) pins one position carrying one token, the plain row
    * COUNT per (query, doc, start) is exactly the satisfied-offset count
    * (no bitmask needed): `count == |tokens|` ⇔ match. Repeated-token
    * phrases fall out naturally (each offset is its own requirement), so
    * the adjacent-start overlapping count the tiers share is preserved.
    * Value-identical to [[phraseTopK]] per query: same stored stats, idf,
    * saturation, 4 dp rounding, and (score DESC, doc_id) top-k — here as
    * a per-query window. Returns `(query_id, doc_id, score)`.
    *
    * 100 TB shape: one bucket-pruned postings scan for the union of all
    * phrases' terms, two count aggregations keyed by (query, doc[, start])
    * and one window — the same plan at N=2 and N=2000.
    */
  def phraseTopKBatch(ix: Index, queries: Seq[(Long, String)], k: Int,
                      k1: Double = Bm25.K1, b: Double = Bm25.B): DataFrame = {
    val spark = ix.postings.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "empty phrase batch")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query_id in batch")
    val qtoks = queries.map { case (qid, t) =>
      val p = LateInteraction.tokenizeValue(t)
      require(p.nonEmpty, s"phrase $qid analyzes to nothing")
      (qid, p)
    }
    val reqRows = qtoks.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, off) => (qid, t, off) }
    }
    val ntokDf = broadcast(qtoks.map { case (qid, ts) => (qid, ts.size.toLong) }
      .toDF("query_id", "ntok"))
    val allT = reqRows.map(_._2).distinct
    val buckets = {
      val n = ix.stats.select(col("term_buckets")).head().getInt(0)
      allT.map(Bm25.termBucketValue(_, n)).distinct
    }
    val tf = ix.postings
      .filter(col("term_bucket").isin(buckets: _*))
      .filter(col("term").isin(allT: _*))
      .select(col("doc_id"), col("doc_len"), col("term"),
        explode(col("positions")).as("p"))
      .join(broadcast(reqRows.toDF("query_id", "term", "off")), "term")
      .groupBy(col("query_id"), col("doc_id"), col("doc_len"),
        (col("p") - col("off")).as("start"))
      .agg(count(lit(1)).as("hits"))
      .join(ntokDf, "query_id")
      .filter(col("hits") === col("ntok"))
      .groupBy("query_id", "doc_id", "doc_len")
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("query_id").agg(count(lit(1)).as("df"))
    val idf = log((lit(ix.corpusSize.toDouble) - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    // bounded-agg per-query top-k — no full sort of the scored match set
    TopK.perGroupTopK(
      tf.join(broadcast(dfs), "query_id")
        .select(col("query_id"), col("doc_id"),
          round(
            idf * (col("tf") * (k1 + 1.0)) /
              (col("tf") +
                lit(k1) * (lit(1.0 - b) +
                  (lit(b) * col("doc_len")) / lit(ix.avgdl))),
            4).as("score")),
      "query_id", "doc_id", "score", k)
  }
}
