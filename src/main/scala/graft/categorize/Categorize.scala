package graft.categorize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** LLM-driven document categorization, Spark-shaped (SURVEY §2.9 M9-M11;
  * `/root/reference/categorize/categorize_manager.py`).
  *
  * The reference samples chunks per article (top/mid/bottom), prompts an LLM
  * for 3-7 JSON categories, fuzzy-dedups the label set (rapidfuzz ≥85) and
  * writes `primary_category`/`categories` back into the docs table. Here:
  *
  *  - chunk sampling is a rank window per sourcedoc (no per-article SQL);
  *  - the LLM call is a pluggable scorer; the default [[keywordCategorize]]
  *    is a deterministic keyword-affinity classifier (a broadcast taxonomy,
  *    same output contract), so the whole flow is testable and
  *    oracle-checkable — a real model drops in as mapPartitions exactly
  *    like [[graft.embed.Embedder.embedPartitions]];
  *  - fuzzy dedup is a levenshtein self-join on the (tiny) label set;
  *  - import-back is a plain join (M11), not row UPDATEs.
  */
object Categorize {

  /** M9 chunk sampling (`categorize_manager.py:251-611`: default 3-3-3
    * top/mid/bottom): per sourcedoc take `n` from the start, `n` around the
    * middle, `n` from the end — one rank window, no per-doc queries.
    */
  def sampleChunks(chunks: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("sourcedoc").orderBy("sid")
    val ranked = chunks
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("sourcedoc")))
    ranked.filter(
      col("rn") <= n ||                                   // top
      col("rn") > col("cnt") - n ||                       // bottom
      (col("rn") > (col("cnt") - n) / 2 && col("rn") <= (col("cnt") - n) / 2 + n)) // middle
      .drop("rn", "cnt")
  }

  /** The default taxonomy: category → marker keywords. */
  val Taxonomy: Map[String, Seq[String]] = Map(
    "data-processing" -> Seq("table", "row", "scan", "batch", "merge", "sort"),
    "query-engine" -> Seq("query", "join", "filter", "window", "spark", "sql"),
    "storage" -> Seq("parquet", "columnar", "disk", "file", "format", "cache"),
    "performance" -> Seq("fast", "slow", "latency", "throughput", "optimize", "hash"))

  /** M9 deterministic categorization: per doc, score each category by
    * marker-keyword hits over the sampled text; keep categories with ≥
    * `minHits` hits (the confidence threshold analogue, ≥0.5 at
    * `categorize_manager.py:464-483`), primary = argmax (ties: name).
    * Output: `(sourcedoc, primary_category, categories ARRAY<STRING>)`.
    */
  def keywordCategorize(samples: DataFrame, textCol: String,
                        minHits: Int = 1): DataFrame = {
    val toks = samples.groupBy("sourcedoc")
      .agg(flatten(collect_list(TextFunctions.tokenize(col(textCol)))).as("toks"))
    val scored = Taxonomy.toSeq.sortBy(_._1).map { case (cat, kws) =>
      struct(
        size(array_intersect(col("toks"), lit(kws.toArray))).as("hits"),
        lit(cat).as("cat"))
    }
    toks.select(col("sourcedoc"), array(scored: _*).as("scores"))
      .select(col("sourcedoc"),
        filter(col("scores"), s => s.getField("hits") >= minHits).as("kept"))
      .filter(size(col("kept")) > 0)
      .select(col("sourcedoc"),
        array_max(col("kept")).getField("cat").as("primary_category"),
        sort_array(transform(col("kept"), s => s.getField("cat"))).as("categories"))
  }

  /** M10 fuzzy label dedup (`category_deduplicator.py:34-255`, rapidfuzz
    * ≥85 ≈ normalized edit similarity ≥0.85): map each label to the
    * lexicographically-least label within the similarity threshold.
    * Label sets are tiny — the self-join is a driver-scale cross of
    * hundreds, not a data-scale operation.
    */
  def dedupLabels(labels: DataFrame, threshold: Double = 0.85): DataFrame = {
    val norm = labels.select(col("label"),
      lower(regexp_replace(col("label"), "[^a-zA-Z0-9]+", " ")).as("n"))
    val a = norm.select(col("label"), col("n"))
    val b = norm.select(col("label").as("label2"), col("n").as("n2"))
    a.crossJoin(b)
      .withColumn("sim",
        lit(1.0) - levenshtein(col("n"), col("n2")).cast("double") /
          greatest(length(col("n")), length(col("n2"))).cast("double"))
      .filter(col("sim") >= threshold)
      .groupBy("label").agg(min("label2").as("canonical"))
  }

  /** M11 import-back: attach the categorization to every chunk row of the
    * sourcedoc (join replaces the reference's row UPDATE loop,
    * `categorize/import_to_db.py`).
    */
  def importCategories(chunks: DataFrame, cats: DataFrame): DataFrame =
    chunks.join(broadcast(cats), Seq("sourcedoc"), "left")

  /** F15 `_extract_json` (`categorize_manager.py:38-63,464-483`): strip
    * LLM code fences / prose around a JSON object and repair trailing
    * commas. Regex-only — the shape the reference implements.
    */
  def extractJson(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "(?s)^.*?(\\{.*\\}).*$", "$1"), // innermost-outer braces
      ",\\s*([}\\]])", "$1")                            // trailing commas
}
