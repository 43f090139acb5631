package graft.format

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.ContextWindow

/** Reference formatting (SURVEY §3.1 step 7;
  * `/root/reference/query/formatters.py:379-523`).
  *
  * The reference walks hit rows in Python, grouping consecutive sids from
  * the same sourcedoc into one block (W3) and emitting XML / JSON / Markdown
  * / plain text. Spark-native: the grouping is a window (lag + cumulative
  * sum), block assembly is `array_join(collect_list)` per group, and the
  * final document is a driver-side concatenation of per-block strings —
  * only the formatted blocks (bounded by top-k) ever reach the driver.
  */
object Formatters {

  /** F17 XML escaping (`/root/reference/query/formatters.py:63-95`);
    * includes quote entities — sourcedoc is emitted inside a double-quoted
    * attribute, and quotes are legal in file paths.
    */
  def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;"), "'", "&apos;")

  /** Group context rows `(sourcedoc, sid, text, ...)` into consecutive-run
    * blocks: one row per block with the texts joined in sid order.
    */
  def blocks(rows: DataFrame, textCol: String): DataFrame =
    ContextWindow.consecutiveGroups(rows)
      .groupBy("sourcedoc", "group_id")
      .agg(
        min("sid").as("start_sid"),
        max("sid").as("end_sid"),
        array_join(array_sort(collect_list(struct(col("sid"), col(textCol).as("t"))))
          .getField("t"), "\n").as("block_text"))

  /** One formatted string per block, by style. */
  def formatBlocks(blocks: DataFrame, style: String): DataFrame = {
    val body = style match {
      case "xml" =>
        concat(lit("<reference source=\""), xmlEscape(col("sourcedoc")),
          lit("\" start=\""), col("start_sid"), lit("\" end=\""), col("end_sid"),
          lit("\">\n"), xmlEscape(col("block_text")), lit("\n</reference>"))
      case "json" =>
        to_json(struct(col("sourcedoc"), col("start_sid"), col("end_sid"),
          col("block_text").as("text")))
      case "markdown" =>
        concat(lit("### "), col("sourcedoc"),
          lit(" ["), col("start_sid"), lit("-"), col("end_sid"), lit("]\n\n"),
          col("block_text"))
      case _ => // plain
        concat(lit("From "), col("sourcedoc"),
          lit(" (chunks "), col("start_sid"), lit("-"), col("end_sid"), lit("):\n"),
          col("block_text"))
    }
    blocks.select(col("sourcedoc"), col("start_sid"), body.as("formatted"))
  }

  /** Assemble the final reference string (driver-side; block count is
    * bounded by top-k · context window).
    */
  def assemble(formatted: DataFrame, style: String): String = {
    val parts = formatted.orderBy("sourcedoc", "start_sid")
      .select("formatted").collect().map(_.getString(0))
    style match {
      case "xml"  => parts.mkString("<references>\n", "\n", "\n</references>")
      case "json" => parts.mkString("[", ",\n", "]")
      case _      => parts.mkString("\n\n")
    }
  }
}
