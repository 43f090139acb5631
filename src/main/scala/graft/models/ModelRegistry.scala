package graft.models

import graft.embed.Embedder

/** Static model registry: canonical-name → alias → partial-match resolution
  * feeding provider routing — the reference resolves every configured model
  * name this way (`/root/reference/models/model_manager.py:24-85`:
  * exact id, then alias, then substring-of-id-or-alias, else error) and
  * derives the provider + routing string from the resolved entry
  * (`/root/reference/query/llm.py:31-58,60-89`).
  *
  * The table is a small static map (SURVEY §4: the reference's Models.json
  * is an external file; a library constant is the Spark-side analogue).
  * Entries mirror the reference's own defaults (`config/models.py:53,58`)
  * plus this engine's deterministic/local models. Real HTTP providers are a
  * documented exclusion (COVERAGE.md) — resolution and routing are real;
  * execution lands on the deterministic/extractive providers.
  */
object ModelRegistry {

  /** One Models.json-shaped entry: canonical id, optional alias, explicit
    * provider (or derivable from parent/family), kind (embedding|chat),
    * native dims for embedding models (0 = caller-supplied).
    */
  final case class ModelInfo(model: String, alias: Option[String] = None,
                             provider: Option[String] = None,
                             parent: String = "", family: String = "",
                             kind: String = "chat", dims: Int = 0)

  val Models: Seq[ModelInfo] = Seq(
    // embedding models (reference default: text-embedding-3-small,
    // config/models.py:53)
    ModelInfo("text-embedding-3-small", Some("embed-small"), Some("openai"),
      kind = "embedding", dims = 1536),
    ModelInfo("text-embedding-3-large", Some("embed-large"), Some("openai"),
      kind = "embedding", dims = 3072),
    ModelInfo("text-embedding-ada-002", None, Some("openai"),
      kind = "embedding", dims = 1536),
    // chat models (reference default: claude-sonnet-4-6, config/models.py:58)
    ModelInfo("claude-sonnet-4-6", Some("sonnet"),
      parent = "Anthropic", family = "claude"),
    ModelInfo("claude-3-5-haiku", Some("haiku"),
      parent = "Anthropic", family = "claude"),
    ModelInfo("gpt-4o", Some("chatgpt"), Some("openai")),
    ModelInfo("gpt-4o-mini", None, Some("openai")),
    ModelInfo("gemini-2.0-flash", Some("flash"),
      parent = "Google", family = "gemini"),
    ModelInfo("grok-2", Some("grok"), parent = "xAI", family = "grok"),
    ModelInfo("llama3.1", None, parent = "local", family = "ollama"),
    // this engine's deterministic/local providers, registered like any
    // other model so config resolution is uniform
    ModelInfo("deterministic-64", Some("deterministic"), Some("local"),
      kind = "embedding", dims = 64),
    ModelInfo("extractive-v1", Some("extractive"), Some("local")))

  /** Resolve a name or alias to its canonical entry — exact id, then alias,
    * then partial match (substring of id or alias), in that order of
    * preference (`model_manager.py:62-79`); unknown → clear error
    * (`model_manager.py:81-84` raises KeyError).
    */
  def resolve(name: String): ModelInfo = {
    require(name != null && name.trim.nonEmpty,
      "model name must be a non-empty string")
    val n = name.trim
    Models.find(_.model == n)
      .orElse(Models.find(_.alias.contains(n)))
      .orElse(Models.find(m => m.model.contains(n) || m.alias.exists(_.contains(n))))
      .getOrElse(throw new NoSuchElementException(
        s"Model '$n' not found in registry (known: ${Models.map(_.model).mkString(", ")})"))
  }

  /** Provider for an entry: explicit field wins, else derived from
    * parent/family exactly like `llm.py:_get_provider_from_model_info`
    * (ollama family → local parent → anthropic → google → xai → openai).
    */
  def provider(m: ModelInfo): String = m.provider.getOrElse {
    val parent = m.parent.toLowerCase
    val family = m.family.toLowerCase
    if (family.contains("ollama")) "ollama"
    else if (parent.contains("local")) "local"
    else if (parent.contains("anthropic") || family.contains("claude")) "anthropic"
    else if (parent.contains("google") || family.contains("gemini")) "google"
    else if (parent.contains("xai") || family.contains("grok")) "xai"
    else "openai"
  }

  /** Routing string for a resolved name — `llm.py:_to_litellm_model`:
    * names already carrying a `provider/` prefix pass through; google/xai/
    * ollama get explicit prefixes; openai/anthropic are auto-detected by
    * name and stay bare.
    */
  def routed(name: String): String = {
    val m = resolve(name)
    if (m.model.contains("/")) m.model
    else provider(m) match {
      case "google"           => s"gemini/${m.model}"
      case "xai"              => s"xai/${m.model}"
      case "ollama" | "local" => s"ollama/${m.model}"
      case _                  => m.model
    }
  }

  /** A provider that reports the CANONICAL registry id while delegating
    * execution — what lets batch planning and cache keys see the resolved
    * model name regardless of which alias the config used.
    */
  final case class Routed(inner: Embedder.Provider, name: String)
      extends Embedder.Provider {
    def model: String = name
    def dims: Int = inner.dims
    def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
      inner.embedBatch(texts)
  }

  /** Embedding provider for a configured `vector_model` value: names of the
    * engine's own deterministic family construct directly (any dims);
    * everything else resolves through the registry — alias/partial accepted,
    * unknown names error out at config time, exactly when the reference's
    * get_canonical_model would. Registry dims win over the caller's when
    * the entry declares them.
    */
  def embedderFor(name: String, dims: Int): Embedder.Provider =
    if (name.trim.startsWith("deterministic")) Embedder.Deterministic(dims)
    else {
      val m = resolve(name)
      require(m.kind == "embedding",
        s"model '${m.model}' is kind=${m.kind}, not an embedding model")
      Routed(Embedder.Deterministic(if (m.dims > 0) m.dims else dims), m.model)
    }
}
