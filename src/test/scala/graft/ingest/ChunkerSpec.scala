package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunker invariants (SURVEY §5: "coverage/order/size-bounds" properties,
  * replacing the reference's example-based chunking tests). The property
  * sweep is a seeded manual grid (the scalatest↔scalacheck bridge artifact
  * is not in the offline cache).
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunkRows(text: String, size: Int, overlap: Int): Seq[(Int, String)] = {
    Seq(Tuple1(text)).toDF("text")
      .select(explode(Chunker.chunks(col("text"), size, overlap)).as("c"))
      .select("c.sid", "c.chunk_text").as[(Int, String)].collect().toSeq
  }

  test("coverage: concatenating de-overlapped chunks reproduces the token stream") {
    val tokens = (1 to 47).map(i => s"t$i")
    val rows = chunkRows(tokens.mkString(" "), size = 10, overlap = 3)
    val step = 7
    val reassembled = rows.sortBy(_._1).zipWithIndex.flatMap { case ((_, txt), i) =>
      val ts = txt.split(" ").toSeq
      if (i == 0) ts else ts.drop(3) // drop the overlap tokens
    }
    assert(reassembled == tokens)
    // sids are consecutive 0..n-1
    assert(rows.map(_._1).sorted == rows.indices.toList)
    // every chunk except possibly the last is exactly `size` tokens
    val sizes = rows.sortBy(_._1).map(_._2.split(" ").length)
    assert(sizes.init.forall(_ == 10))
    assert(sizes.last <= 10 && sizes.last > 3) // tail longer than overlap
  }

  test("property: coverage and size bounds hold for random (n, size, overlap)") {
    val rnd = new scala.util.Random(42)
    // batch all cases into ONE DataFrame pass — a per-case collect would be slow
    val cases = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(200)
      val size = 5 + rnd.nextInt(36)
      val overlap = math.min(rnd.nextInt(5), size - 1)
      (i, n, size, overlap, (1 to n).map(j => s"w$j").mkString(" "))
    }
    cases.groupBy(c => (c._3, c._4)).foreach { case ((size, overlap), group) =>
      val df = group.map(c => (c._1, c._5)).toDF("case_id", "text")
      val rows = df.select(col("case_id"),
          explode(Chunker.chunks(col("text"), size, overlap)).as("c"))
        .select(col("case_id"), col("c.sid"), col("c.chunk_text"))
        .as[(Int, Int, String)].collect()
      group.foreach { case (id, n, _, _, text) =>
        val tokens = text.split(" ").toSeq
        val mine = rows.filter(_._1 == id).sortBy(_._2)
        val reassembled = mine.zipWithIndex.flatMap { case ((_, _, txt), i) =>
          val ts = txt.split(" ").toSeq
          if (i == 0) ts else ts.drop(overlap)
        }
        assert(reassembled.toSeq == tokens, s"case $id (n=$n size=$size overlap=$overlap)")
        assert(mine.forall(_._3.split(" ").length <= size))
      }
    }
  }

  test("single short document yields one chunk with sid 0") {
    val rows = chunkRows("only three tokens", size = 30, overlap = 10)
    assert(rows == Seq((0, "only three tokens")))
  }

  test("chunkDocuments emits (sourcedoc_id, sid, chunk_text, token_count)") {
    val docs = Seq((7L, (1 to 50).map(i => s"x$i").mkString(" "))).toDF("id", "text")
    val out = Chunker.chunkDocuments(docs, "id", "text", 20, 5).collect()
    assert(out.forall(_.getLong(0) == 7L))
    assert(out.map(_.getInt(1)).sorted.toSeq == out.indices.toSeq)
    assert(out.forall(r => r.getInt(3) == r.getString(2).split(" ").length))
  }
}
