package graft.query

/** LLM answer generation (SURVEY §2.9 M8; `/root/reference/query/llm.py:
  * 31-227`, templates `query/prompt_templates.py:8-148`).
  *
  * The reference routes one `{context}/{query}` prompt through LiteLLM with
  * a style template and optional system-role override. Driver-side by
  * nature (one call per query); batch QA jobs reuse the same provider via
  * mapPartitions. Zero-egress here, so the deterministic [[Extractive]]
  * provider stands in: it answers with the highest-lexical-overlap context
  * block — a real completion client implements [[ChatProvider]] with
  * executor-local HTTP + retry (same shape as `graft.embed.Embedder`'s
  * provider notes).
  */
object AnswerGen {

  /** Prompt style templates (the reference ships 7;
    * `prompt_templates.py:8-148`). `{context}` / `{query}` substitution.
    */
  val Templates: Map[String, String] = Map(
    "default" ->
      "Use the references to answer.\n<context>\n{context}\n</context>\n\nQuestion: {query}\nAnswer:",
    "instructive" ->
      "You are a precise assistant. Cite only the provided references.\n{context}\n\nQ: {query}\nA:",
    "scholarly" ->
      "Context documents:\n{context}\n\nProvide a sourced, scholarly answer to: {query}",
    "concise" -> "{context}\n\nAnswer briefly: {query}",
    "conversational" -> "Here's what I found:\n{context}\n\nSo, about \"{query}\":",
    "analytical" -> "Evidence:\n{context}\n\nAnalyze and answer: {query}",
    "creative" -> "Inspiration:\n{context}\n\nRespond imaginatively to: {query}")

  def buildPrompt(style: String, context: String, query: String,
                  role: Option[String] = None): String = {
    val t = Templates.getOrElse(style, Templates("default"))
    val body = t.replace("{context}", context).replace("{query}", query)
    role.map(r => s"[system: $r]\n$body").getOrElse(body)
  }

  trait ChatProvider extends Serializable {
    def complete(prompt: String): String
  }

  /** Deterministic extractive "answerer": returns the context block with
    * the highest token overlap with the query — reproducible, offline, and
    * a reasonable extractive-QA baseline.
    */
  final case class Extractive() extends ChatProvider {
    def complete(prompt: String): String = {
      val q = "Question: (.*)".r.findFirstMatchIn(prompt).map(_.group(1))
        .getOrElse(prompt.linesIterator.toSeq.lastOption.getOrElse(""))
      val qToks = q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      // candidate blocks = context paragraphs; the paragraph holding the
      // question itself is not an answer
      val blocks = prompt.split("\n\n")
        .filterNot(_.contains("{"))
        .filterNot(b => q.nonEmpty && b.contains(q))
      if (blocks.isEmpty) ""
      else blocks.maxBy { b =>
        val bt = b.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
        if (bt.isEmpty) 0.0 else (bt & qToks).size.toDouble / bt.size
      }
    }
  }

  def answer(style: String, context: String, query: String,
             provider: ChatProvider = Extractive()): String =
    provider.complete(buildPrompt(style, context, query))
}
