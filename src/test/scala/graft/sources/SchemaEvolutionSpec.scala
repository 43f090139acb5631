package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mixed-vintage chunk table reads with merged schema and typed defaults") {
    val dir = Files.createTempDirectory("graft_schema").toString + "/chunks"
    // v1 files: no categories, no created_at
    Seq(("a", 0, "old chunk")).toDF("sourcedoc", "sid", "chunk_text")
      .write.parquet(dir)
    // v2 files: categories present
    Seq(("b", 0, "new chunk", Seq("tech"), "tech"))
      .toDF("sourcedoc", "sid", "chunk_text", "categories", "primary_category")
      .write.mode("append").parquet(dir)

    val merged = SchemaEvolution.readChunks(spark, dir)
    val cols = merged.columns.toSet
    assert(Set("categories", "primary_category", "bm25_tokens", "doc_length")
      .subsetOf(cols), cols.mkString(","))
    val byDoc = merged.collect().map(r => r.getString(r.fieldIndex("sourcedoc")) -> r).toMap
    // old file: null category array coalesced to empty, not null
    assert(byDoc("a").getSeq[String](byDoc("a").fieldIndex("categories")) == Seq())
    assert(byDoc("a").getInt(byDoc("a").fieldIndex("doc_length")) == 0)
    // new file keeps its values
    assert(byDoc("b").getSeq[String](byDoc("b").fieldIndex("categories")) == Seq("tech"))
    // downstream operator works on the resolved schema regardless of vintage
    val filtered = merged.filter(array_contains(col("categories"), "tech"))
    assert(filtered.count() == 1)
  }
}
