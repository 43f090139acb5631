package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FormattersSpec extends SparkSpec {
  import spark.implicits._

  private val ctx = Seq(
    ("docs/a.md", 0, "first chunk"), ("docs/a.md", 1, "second chunk"),
    ("docs/a.md", 5, "later chunk"), ("docs/b\"q\".md", 0, "<tag> & text"))
    .toDF("sourcedoc", "sid", "text")

  test("blocks group consecutive sids and join texts in order") {
    val b = Formatters.blocks(ctx, "text").collect()
      .map(r => (r.getString(0), r.getInt(r.fieldIndex("start_sid")),
        r.getInt(r.fieldIndex("end_sid")), r.getString(r.fieldIndex("block_text"))))
    assert(b.exists(x => x._1 == "docs/a.md" && x._2 == 0 && x._3 == 1 &&
      x._4 == "first chunk\nsecond chunk"))
    assert(b.exists(x => x._1 == "docs/a.md" && x._2 == 5 && x._3 == 5))
    assert(b.length == 3)
  }

  test("xml style escapes entities AND attribute quotes; assemble wraps") {
    val out = Formatters.assemble(
      Formatters.formatBlocks(Formatters.blocks(ctx, "text"), "xml"), "xml")
    assert(out.startsWith("<references>"))
    assert(out.contains("source=\"docs/b&quot;q&quot;.md\""), out)
    assert(out.contains("&lt;tag&gt; &amp; text"))
    assert(!out.replace("<references>", "").replace("</references>", "")
      .split("\n").exists(l => l.contains("\"q\"")), "raw quote leaked into attribute")
  }

  test("json and markdown and plain styles render") {
    Seq("json", "markdown", "plain").foreach { style =>
      val s = Formatters.assemble(
        Formatters.formatBlocks(Formatters.blocks(ctx, "text"), style), style)
      assert(s.nonEmpty, style)
      if (style == "json") assert(s.startsWith("[") && s.endsWith("]"))
    }
  }
}
