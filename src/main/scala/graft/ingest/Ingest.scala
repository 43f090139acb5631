package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** File ingestion (SURVEY §2.1 S1-S6, §2.8 F5, §3.2).
  *
  * The reference loops files in Python — glob, charset-sniff, per-type
  * splitter, metadata regexes, batched SQLite inserts
  * (`/root/reference/database/db_manager.py:240-410,413-676`). Spark-native
  * the whole verb is ONE job: `binaryFile` scan → decode → file-type
  * dispatch → chunk explode → column derivations → anti-join vs the file
  * registry → parquet write. The per-file loop, batch commits, and the
  * 100 MB size cap's streaming concerns all disappear into the scan.
  */
object Ingest {

  /** S1 file scan: glob → one row per file with path, length, bytes.
    * `binaryFile` handles recursive globs and never decodes — decoding is a
    * column op so a bad file corrupts one row, not the job.
    */
  def scanFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("length"), col("content"))

  /** S2 encoding-detecting decode (`/root/reference/utils/text_utils.py:
    * 339-422`): UTF-8 strict → windows-1252 → latin-1, final fallback
    * UTF-8 with replacement. charset-normalizer's statistical detection is
    * replaced by the same fallback CHAIN the reference uses when detection
    * fails — deterministic and dependency-free. A UDF (not an Expression):
    * decoding happens once per file at ingest, never in a query hot path.
    */
  val decodeText = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null
    else {
      def tryCharset(name: String): Option[String] = {
        val dec = java.nio.charset.Charset.forName(name).newDecoder()
        dec.onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        dec.onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
        catch { case _: java.nio.charset.CharacterCodingException => None }
      }
      tryCharset("UTF-8")
        .orElse(tryCharset("windows-1252"))
        .orElse(tryCharset("ISO-8859-1"))
        .getOrElse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** S3 file-type detection by extension
    * (`/root/reference/database/chunking.py:64-137`).
    */
  def fileType(path: Column): Column = {
    val ext = lower(regexp_extract(path, "\\.([a-zA-Z0-9]+)$", 1))
    when(ext.isin("md", "markdown"), "markdown")
      .when(ext.isin("html", "htm"), "html")
      .when(ext.isin("py", "scala", "java", "js", "c", "cpp", "go", "rs", "sh"), "code")
      .when(ext === "json", "json")
      .when(ext.isin("yaml", "yml"), "yaml")
      .when(ext === "xml", "xml")
      .when(ext.isin("cfg", "ini", "conf", "toml"), "config")
      .otherwise("text")
  }

  /** S4 filename sanitization (`/root/reference/database/db_manager.py:
    * 97-162`): strip shell-dangerous characters from the basename. Inputs
    * are immutable here so no on-disk rename happens — the sanitized name is
    * just the canonical `sourcedoc` key.
    */
  def sanitizeName(path: Column): Column =
    regexp_replace(path, "[<>|&;`$]", "_")

  /** F5 metadata extraction (`/root/reference/database/db_manager.py:
    * 168-237`): heading from the first line, section-type classifier,
    * char/word counts, and `entities {label: [spans]}` over the first 500
    * chars via the deterministic regex/gazetteer NER
    * ([[TextFunctions.extractEntities]] — the spaCy re-expression; only
    * labels with matches appear, mirroring the reference's "add only if
    * entities were found").
    */
  def extractMetadata(text: Column): Column =
    struct(
      trim(regexp_extract(substring(text, 1, 200), "^#*\\s*([^\n]{0,120})", 1)).as("heading"),
      when(text.rlike("```"), "code_block")
        .when(text.rlike("(?m)^\\s*[\\|\\+][-\\|\\+ ]+"), "table")
        .when(text.rlike("(?m)^\\s*[-\\*]\\s"), "list")
        .when(text.rlike("(?m)^\\s*\\d+[\\.\\)]\\s"), "numbered_list")
        .otherwise("prose").as("section_type"),
      length(text).as("char_length"),
      TextFunctions.wordCount(text).as("word_count"),
      TextFunctions.extractEntities(text).as("entities"))

  /** S5 incremental-ingest skip: files already in the registry are dropped
    * (left-anti join on the content hash — stronger than the reference's
    * path check, `db_manager.py:349-374`: a changed file re-ingests).
    */
  def newFiles(files: DataFrame, registry: DataFrame): DataFrame =
    files.withColumn("file_hash", sha2(col("content"), 256))
      .join(registry.select("file_hash"), Seq("file_hash"), "left_anti")

  /** The full §3.2 `database` verb: scan → decode → chunk → derive → the
    * canonical chunk-table schema (SURVEY §1.2). `registry` is the
    * `file_metadata` analogue; pass an empty DataFrame for a fresh KB.
    */
  def ingestFiles(spark: SparkSession, glob: String, registry: Option[DataFrame] = None,
                  chunkSize: Int = 200, overlap: Int = 50): DataFrame = {
    val scanned = scanFiles(spark, glob)
    val fresh = registry.map(newFiles(scanned, _)).getOrElse(
      scanned.withColumn("file_hash", sha2(col("content"), 256)))
    val decoded = fresh
      .withColumn("sourcedoc", sanitizeName(col("path")))
      .withColumn("file_type", fileType(col("path")))
      .withColumn("text", decodeText(col("content")))
      .drop("content")
    decoded
      // metadata reads the FULL decoded text: chunking collapses line
      // structure, which the heading/section-type regexes depend on
      .withColumn("metadata", extractMetadata(col("text")))
      .select(col("sourcedoc"), col("file_hash"), col("file_type"), col("metadata"),
        explode(Chunker.chunks(col("text"), chunkSize, overlap)).as("c"))
      .select(col("sourcedoc"), col("file_hash"), col("file_type"), col("metadata"),
        col("c.sid").as("sid"), col("c.chunk_text").as("chunk_text"),
        TextFunctions.wordCount(col("c.chunk_text")).as("token_count"))
      .withColumn("embedtext", TextFunctions.cleanText(col("chunk_text")))
      .withColumn("bm25_tokens", TextFunctions.tokenizeBm25(col("chunk_text")))
      .withColumn("doc_length", size(array_distinct(col("bm25_tokens"))))
      .withColumn("created_at", current_timestamp())
  }
}
