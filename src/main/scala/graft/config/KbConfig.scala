package graft.config

/** Knowledgebase configuration (SURVEY §1.1 "Config").
  *
  * The reference loads an INI `.cfg` with five sections and applies
  * env-var > file > default precedence, validated by Pydantic
  * (`/root/reference/config/models.py:45-211`,
  * `config/config_manager.py:207-296`). Here: one immutable case class per
  * concern with the same defaults, a minimal INI parser (no external deps),
  * and the same precedence chain. Everything is plain Scala — config is
  * driver-side and tiny.
  */
final case class KbConfig(
    // [DEFAULT] — config/models.py:45-75
    vectorModel: String = "deterministic-64", // reference: text-embedding-3-small
    vectorDimensions: Int = 64,
    dbMinTokens: Int = 100,
    dbMaxTokens: Int = 200,
    queryModel: String = "none",
    queryTopK: Int = 50,             // config/models.py:61
    queryContextScope: Int = 4,      // config/models.py:62
    queryContextFiles: Seq[String] = Nil,
    // [ALGORITHMS] — config/models.py:130-190
    similarityThreshold: Double = 0.6,        // models.py:139
    lowSimilarityScopeFactor: Double = 0.5,   // models.py:140
    enableHybridSearch: Boolean = true,
    fusionMethod: String = "rrf",             // search.py:414-439 (or "weighted")
    vectorWeight: Double = 0.7,               // search.py:350-411
    bm25Weight: Double = 0.3,                 // models.py:161
    bm25K1: Double = 1.2,                     // models.py:162
    bm25B: Double = 0.75,                     // models.py:163
    bm25MaxResults: Int = 1000,               // bm25_manager.py:289-320
    enableReranking: Boolean = true,
    rerankingTopK: Int = 20,                  // rerank_manager.py:216-220
    // rerank scoring model (reference `reranking_model`, models.py:179 —
    // there a cross-encoder name): "lexical" (deterministic set-jaccard,
    // the oracle default) or "learned" (Rerank.LogisticScorer.pretrained,
    // the in-repo logistic model at the cross-encoder's seam); unknown
    // names fall back to lexical
    rerankingModel: String = "lexical",
    ivfNprobe: Int = 32,                      // models.py:189
    // IVFPQ ADC shortlist fed to the exact re-rank; tuned per corpus by
    // the `tune` verb (VectorSearch.tuneServing) — our extension, the
    // reference's analogue knob is the static faiss_nprobe
    pqShortlist: Int = 100,
    // recall@k target for serving-knob calibration (0 = tuning off)
    recallTarget: Double = 0.0,
    // vector-stage strategy (reference `faiss_index_type`, index.py:51):
    // "exact" scans the full corpus; "ivf"/"auto" probe a supplied IVF
    // index. Default "exact" is a DELIBERATE divergence from the
    // reference's 'auto' — it keeps the whole pipeline value-oracle-exact;
    // ANN is an explicit opt-in (COVERAGE.md).
    indexType: String = "exact",
    // [PERFORMANCE] — replaced by Spark conf at scale; kept for parity
    embeddingBatchSize: Int = 100,
    apiMaxRetries: Int = 20,                  // models.py:77-82
    // formatting
    referenceFormat: String = "xml")

object KbConfig {

  /** Known keys grouped into the reference's section layout
    * (`config/models.py:45-211` — DEFAULT / ALGORITHMS / PERFORMANCE plus
    * formatting), used by [[renderIni]] and the CLI `edit` verb.
    */
  val Sections: Seq[(String, Seq[String])] = Seq(
    "DEFAULT" -> Seq("vector_model", "vector_dimensions", "db_min_tokens",
      "db_max_tokens", "query_model", "query_top_k", "query_context_scope"),
    "ALGORITHMS" -> Seq("similarity_threshold", "low_similarity_scope_factor",
      "enable_hybrid_search", "fusion_method", "vector_weight", "bm25_weight",
      "bm25_k1", "bm25_b", "bm25_max_results", "enable_reranking",
      "reranking_top_k", "reranking_model", "ivf_nprobe", "pq_shortlist", "recall_target",
      "index_type"),
    "PERFORMANCE" -> Seq("embedding_batch_size", "api_max_retries"),
    "FORMATTING" -> Seq("reference_format"))

  /** All known keys, in section order. */
  val KnownKeys: Seq[String] = Sections.flatMap(_._2)

  /** Key → current value, for rendering. */
  def toMap(c: KbConfig): Map[String, String] = Map(
    "vector_model" -> c.vectorModel,
    "vector_dimensions" -> c.vectorDimensions.toString,
    "db_min_tokens" -> c.dbMinTokens.toString,
    "db_max_tokens" -> c.dbMaxTokens.toString,
    "query_model" -> c.queryModel,
    "query_top_k" -> c.queryTopK.toString,
    "query_context_scope" -> c.queryContextScope.toString,
    "similarity_threshold" -> c.similarityThreshold.toString,
    "low_similarity_scope_factor" -> c.lowSimilarityScopeFactor.toString,
    "enable_hybrid_search" -> c.enableHybridSearch.toString,
    "fusion_method" -> c.fusionMethod,
    "vector_weight" -> c.vectorWeight.toString,
    "bm25_weight" -> c.bm25Weight.toString,
    "bm25_k1" -> c.bm25K1.toString,
    "bm25_b" -> c.bm25B.toString,
    "bm25_max_results" -> c.bm25MaxResults.toString,
    "enable_reranking" -> c.enableReranking.toString,
    "reranking_top_k" -> c.rerankingTopK.toString,
    "reranking_model" -> c.rerankingModel,
    "ivf_nprobe" -> c.ivfNprobe.toString,
    "pq_shortlist" -> c.pqShortlist.toString,
    "recall_target" -> c.recallTarget.toString,
    "index_type" -> c.indexType,
    "embedding_batch_size" -> c.embeddingBatchSize.toString,
    "api_max_retries" -> c.apiMaxRetries.toString,
    "reference_format" -> c.referenceFormat)

  /** Render as the canonical INI — the inverse of [[load]]
    * (`load(renderIni(c), env = Map.empty) == c`, spec-asserted), so the
    * CLI `edit` verb round-trips config files losslessly.
    */
  def renderIni(c: KbConfig): String = {
    val m = toMap(c)
    Sections.map { case (sec, keys) =>
      s"[$sec]\n" + keys.map(k => s"$k = ${m(k)}").mkString("\n")
    }.mkString("\n\n") + "\n"
  }

  /** Parse a minimal INI: `[section]` headers, `key = value` lines, `#`/`;`
    * comments. Section names are flattened — the reference's five sections
    * share one key namespace in practice (config_manager.py:254-266).
    */
  def parseIni(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#") || l.startsWith(";") || l.startsWith("["))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
          case _           => None
        }
      }.toMap

  /** Env-var > file > default precedence
    * (`/root/reference/config/config_manager.py:17-23`): env keys are the
    * upper-cased ini keys with a `GRAFT_` prefix.
    */
  def load(iniText: String = "", env: Map[String, String] = sys.env): KbConfig = {
    val ini = parseIni(iniText)
    def get(key: String): Option[String] =
      env.get("GRAFT_" + key.toUpperCase).orElse(ini.get(key))
    def i(key: String, d: Int): Int = get(key).map(_.toInt).getOrElse(d)
    def f(key: String, d: Double): Double = get(key).map(_.toDouble).getOrElse(d)
    def b(key: String, d: Boolean): Boolean = get(key).map(_.toBoolean).getOrElse(d)
    def s(key: String, d: String): String = get(key).getOrElse(d)
    val c = KbConfig()
    KbConfig(
      vectorModel = s("vector_model", c.vectorModel),
      vectorDimensions = i("vector_dimensions", c.vectorDimensions),
      dbMinTokens = i("db_min_tokens", c.dbMinTokens),
      dbMaxTokens = i("db_max_tokens", c.dbMaxTokens),
      queryModel = s("query_model", c.queryModel),
      queryTopK = i("query_top_k", c.queryTopK),
      queryContextScope = i("query_context_scope", c.queryContextScope),
      similarityThreshold = f("similarity_threshold", c.similarityThreshold),
      lowSimilarityScopeFactor = f("low_similarity_scope_factor", c.lowSimilarityScopeFactor),
      enableHybridSearch = b("enable_hybrid_search", c.enableHybridSearch),
      fusionMethod = s("fusion_method", c.fusionMethod),
      vectorWeight = f("vector_weight", c.vectorWeight),
      bm25Weight = f("bm25_weight", c.bm25Weight),
      bm25K1 = f("bm25_k1", c.bm25K1),
      bm25B = f("bm25_b", c.bm25B),
      bm25MaxResults = i("bm25_max_results", c.bm25MaxResults),
      enableReranking = b("enable_reranking", c.enableReranking),
      rerankingTopK = i("reranking_top_k", c.rerankingTopK),
      rerankingModel = s("reranking_model", c.rerankingModel),
      ivfNprobe = i("ivf_nprobe", c.ivfNprobe),
      pqShortlist = i("pq_shortlist", c.pqShortlist),
      recallTarget = f("recall_target", c.recallTarget),
      indexType = s("index_type", c.indexType),
      embeddingBatchSize = i("embedding_batch_size", c.embeddingBatchSize),
      apiMaxRetries = i("api_max_retries", c.apiMaxRetries),
      referenceFormat = s("reference_format", c.referenceFormat))
  }
}
