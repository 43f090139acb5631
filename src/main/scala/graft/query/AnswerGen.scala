package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

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
      // recover the question from ANY of the 7 templates' framing (each
      // anchors the {query} substitution differently) — falling through to
      // the last line only for unknown prompt shapes. Every template puts
      // the query framing AFTER the context block, so the LAST match in
      // the prompt wins: context prose that itself contains "Question:" or
      // "Q:" must not shadow the real query framing. Patterns are
      // LINE-ANCHORED (every template's framing starts a line) so a marker
      // INSIDE the query or context text — e.g. a query quoting "Q: 1.e4"
      // — can't hijack the match either: mid-line markers never match,
      // and a line-start marker in the context loses to the later framing.
      // TERMINATED templates first: default/instructive/conversational end
      // with a known suffix after the query, so the question is everything
      // between the LAST line-start marker and that terminator — this
      // recovers multi-line queries intact (a query containing its own
      // "\nQ: …" line would otherwise win the generic last-match below
      // and truncate the question to the embedded fragment)
      def terminated(marker: String, term: String): Option[String] =
        if (!prompt.endsWith(term)) None
        else {
          val body = prompt.dropRight(term.length)
          ("(?m)^" + java.util.regex.Pattern.quote(marker)).r
            .findAllMatchIn(body).toSeq.lastOption
            .map(m => body.substring(m.end))
        }
      val qPatterns = Seq(
        "(?m)^Question: (.*)".r, "(?m)^Q: (.*)".r,
        "(?m)^Answer briefly: (.*)".r,
        "(?m)^Provide a sourced, scholarly answer to: (.*)".r,
        "(?m)^So, about \"(.*)\":".r,
        "(?m)^Analyze and answer: (.*)".r,
        "(?m)^Respond imaginatively to: (.*)".r)
      val q = terminated("Question: ", "\nAnswer:")
        .orElse(terminated("Q: ", "\nA:"))
        .orElse(terminated("So, about \"", "\":"))
        .orElse(qPatterns.zipWithIndex
          .flatMap { case (p, i) =>
            p.findAllMatchIn(prompt).map(m => (m.start, -i, m.group(1))) }
          .sortBy(t => (t._1, t._2))
          .lastOption.map(_._3))
        .getOrElse(prompt.linesIterator.toSeq.lastOption.getOrElse(""))
      val qToks = q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet
      // candidate blocks = context paragraphs; the paragraph holding the
      // question itself is not an answer. Only UNSUBSTITUTED template
      // placeholders disqualify a block — context routinely contains code
      // and JSON (Ingest.fileType admits .py/.json/...), and a brace alone
      // must not exclude the best-overlap block
      val blocks = prompt.split("\n\n")
        .filterNot(b => "\\{(context|query)\\}".r.findFirstIn(b).isDefined)
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

  /** ChatProvider for a configured `query_model` value: `"none"` keeps
    * answer generation off (the reference's same sentinel); anything else
    * resolves through [[graft.models.ModelRegistry]] — alias/partial
    * accepted, unknown names error at config time (`model_manager.py:
    * 24-85` → routing `llm.py:60-89`). Execution lands on the
    * deterministic [[Extractive]] provider (real HTTP providers are a
    * documented exclusion); the resolved routing string is reported so
    * callers log the model the reference would have called.
    */
  def providerFor(model: String): (String, ChatProvider) =
    if (model == "none") ("none", Extractive())
    else (graft.models.ModelRegistry.routed(model), Extractive())

  /** [[Extractive]]'s block score as a pure column expression:
    * |tokens(block) ∩ qToks| / |tokens(block)| over distinct plain tokens —
    * the same ratio `Extractive.complete` computes per paragraph.
    */
  def extractiveScore(qToks: Column, block: Column): Column = {
    val d = array_distinct(TextFunctions.tokenize(block))
    when(size(d) > 0,
      size(array_intersect(d, qToks)).cast("double") / size(d).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Batched extractive QA: for N queries whose retrieved context blocks sit
    * in one DataFrame, pick each query's best-overlap block in ONE DAG — the
    * batch-QA twin of the driver-side [[answer]] (a real LLM drops in as a
    * mapPartitions completion over the per-query winner rows, same shape as
    * the reference's batch jobs).
    *
    * Scale shape: context sets are top-k-truncated upstream, so every window
    * here ranks ≤ k rows per query — one shuffle on `qidCol`, nothing
    * global. Ties break on ascending `docIdCol` (the DataFrame rendition of
    * [[Extractive]]'s first-max-wins over doc-ordered blocks).
    *
    * @param ctx      (query_id, query-token array, doc_id, block text) rows
    * @return one row per query: input columns + `a_score` (the winning
    *         block's overlap ratio)
    */
  def answerBatch(ctx: DataFrame, qidCol: String, qToksCol: String,
                  docIdCol: String, textCol: String): DataFrame = {
    val byQ = Window.partitionBy(col(qidCol))
    ctx.withColumn("a_score", extractiveScore(col(qToksCol), col(textCol)))
      .withColumn("_rn", row_number().over(
        byQ.orderBy(col("a_score").desc, col(docIdCol))))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
