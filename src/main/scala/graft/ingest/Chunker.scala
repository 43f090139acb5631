package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Token-aware document chunking (SURVEY §2.10: the one UDTF-shaped operator;
  * reference `/root/reference/database/chunking.py:140-205`).
  *
  * The reference chunks with tiktoken lengths and per-file-type splitters.
  * Spark-native: chunking is a pure column expression — `sequence` over chunk
  * starts + `slice`/`array_join` + `explode` — so it stays inside whole-stage
  * codegen and needs no UDF, no flatMap, no Python. One document row becomes
  * ceil((n-overlap)/step) chunk rows with a 0-based `sid` preserving order
  * (the reference's chunk ordinal, `database/connection.py:100-122`).
  *
  * At 100 TB: explode multiplies rows ~(doclen/step)×; it runs map-side with
  * no shuffle, and downstream writes partition by a key of the PARENT doc so
  * context-window joins stay co-located (SURVEY §4 covering-index analogue).
  */
object Chunker {
  val DefaultSize = 30     // tokens per chunk
  val DefaultOverlap = 10  // tokens shared with the previous chunk

  /** Chunk-start offsets for an n-token document: 0, step, 2·step, … while
    * start + overlap < n (so every chunk has > overlap fresh tokens). Always
    * at least one chunk (possibly shorter than `size`).
    */
  def chunkStarts(nTokens: Column, size: Int, overlap: Int): Column = {
    val step = size - overlap
    sequence(
      lit(0),
      greatest(((nTokens - overlap - 1).cast("int") / step).cast("int") * step, lit(0)),
      lit(step))
  }

  /** Explode a text column into (sid, chunk_text) structs. */
  def chunks(text: Column, chunkSize: Int = DefaultSize, overlap: Int = DefaultOverlap): Column = {
    require(overlap >= 0 && chunkSize > overlap,
      s"chunkSize ($chunkSize) must exceed overlap ($overlap) >= 0")
    val step = chunkSize - overlap
    // whitespace split, NOT the analysis tokenizer: chunk text must preserve
    // the document's words verbatim (case/accents/CJK), reference parity
    // with `originaltext` (/root/reference/database/connection.py:100-122)
    val toks = TextFunctions.wsTokens(text)
    transform(
      chunkStarts(size(toks), chunkSize, overlap),
      s => struct(
        (s / step).cast("int").as("sid"),
        array_join(slice(toks, s + 1, lit(chunkSize)), " ").as("chunk_text")))
  }

  /** Full chunking pass: one row per chunk with (parent id, sid, text,
    * token_count) — the Spark shape of the reference's `docs` insert loop
    * (`/root/reference/database/db_manager.py:620-676`), minus the batching
    * knobs that a distributed write makes obsolete.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int = DefaultSize, overlap: Int = DefaultOverlap): DataFrame =
    docs
      .select(col(idCol).as("sourcedoc_id"),
        explode(chunks(col(textCol), chunkSize, overlap)).as("c"))
      .select(col("sourcedoc_id"), col("c.sid").as("sid"),
        col("c.chunk_text").as("chunk_text"),
        graft.functions.TextFunctions.wordCount(col("c.chunk_text")).as("token_count"))
}
