package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_ingest").toString
    Files.write(Paths.get(d, "plain.txt"),
      ((1 to 80).map(i => s"word$i").mkString(" ")).getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(d, "notes.md"),
      "# Heading\n\n- item one\n- item two\n".getBytes(StandardCharsets.UTF_8))
    // latin-1 bytes that are INVALID utf-8 (0xE9 = é) — exercises the
    // fallback chain (S2)
    Files.write(Paths.get(d, "legacy.txt"),
      "café crème legacy text here".getBytes(StandardCharsets.ISO_8859_1))
    d
  }

  test("ingestFiles: scans, decodes (with fallback), chunks, derives columns") {
    val out = Ingest.ingestFiles(spark, s"$dir/*", chunkSize = 30, overlap = 5)
    val bySource = out.select(col("sourcedoc"), col("chunk_text")).collect()
      .groupBy(r => r.getString(0).split("/").last)
    assert(bySource.keySet == Set("plain.txt", "notes.md", "legacy.txt"))
    // fallback decode turned 0xE9 into é, not a replacement char
    val legacy = bySource("legacy.txt").map(_.getString(1)).mkString(" ")
    assert(legacy.contains("café"), s"latin-1 fallback failed: $legacy")
    assert(!legacy.contains("�"))
    // file types detected from extension
    val types = out.select("sourcedoc", "file_type").distinct().collect()
      .map(r => r.getString(0).split("/").last -> r.getString(1)).toMap
    assert(types("notes.md") == "markdown")
    assert(types("plain.txt") == "text")
  }

  test("metadata extraction finds heading and section type") {
    val out = Ingest.ingestFiles(spark, s"$dir/notes.md")
    val md = out.select(col("metadata.heading"), col("metadata.section_type"))
      .collect().head
    assert(md.getString(0).startsWith("Heading"))
    assert(md.getString(1) == "list")
  }

  test("incremental ingest skips files already in the registry (S5 anti-join)") {
    val all = Ingest.ingestFiles(spark, s"$dir/*")
    val registry = all.select("file_hash").distinct()
      .filter(col("file_hash").isNotNull)
    // re-ingest with a registry containing everything -> nothing new
    val none = Ingest.ingestFiles(spark, s"$dir/*", Some(registry))
    assert(none.count() == 0)
    // registry missing one file -> only that file re-ingests
    val hashOfPlain = all.filter(col("sourcedoc").endsWith("plain.txt"))
      .select("file_hash").first().getString(0)
    val partial = registry.filter(col("file_hash") =!= hashOfPlain)
    val re = Ingest.ingestFiles(spark, s"$dir/*", Some(partial))
    val redone = re.select("sourcedoc").distinct().collect().map(_.getString(0))
    assert(redone.length == 1 && redone.head.endsWith("plain.txt"))
  }

  test("extractMetadata extracts entities via the deterministic NER (F5)") {
    import graft.functions.TextFunctions
    val text = "Dr. Alice Johnson of Acme Corp flew to New York and Tokyo " +
      "on 2024-03-15 with 42 crates."
    val m = Seq(text).toDF("text")
      .select(Ingest.extractMetadata(col("text")).as("m"))
      .select(TextFunctions.entitiesCanonical(col("m.entities")))
      .as[String].first()
    assert(m == "CARDINAL:03|15|2024|42;DATE:2024-03-15;GPE:New York|Tokyo;" +
      "ORG:Acme Corp;PERSON:Dr. Alice Johnson", m)
    // lowercase text (the corpus shape): no label fires -> empty map, the
    // reference's "add only if entities were found"
    val none = Seq("plain lowercase words with no entities").toDF("text")
      .select(Ingest.extractMetadata(col("text")).as("m"))
      .select(size(map_keys(col("m.entities")))).as[Int].first()
    assert(none == 0)
    // the 500-char limit: an entity past it is not extracted
    val far = ("x " * 260) + "Acme Corp"
    val clipped = Seq(far).toDF("text")
      .select(Ingest.extractMetadata(col("text")).as("m"))
      .select(size(map_keys(col("m.entities")))).as[Int].first()
    assert(clipped == 0, "entity beyond entity_extraction_limit must not appear")
  }

  test("sanitizeName strips shell metacharacters") {
    val got = Seq("dir/bad<file>|name&x;y`z$.txt").toDF("p")
      .select(Ingest.sanitizeName(col("p"))).as[String].first()
    assert(got == "dir/bad_file__name_x_y_z_.txt")
  }
}
