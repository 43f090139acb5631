package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    Multimodal.asMediaTable(rows.toSeq.toDF("id", "text"), "id", "text")

  test("windowFeatures: windows tile the payload exactly") {
    val text = "a" * 300 // 3 windows of 128: 128 + 128 + 44
    val rows = Multimodal.windowFeatures(media(1L -> text), windowSize = 128)
      .orderBy("win_no")
      .select("win_no", "n_samples", "energy", "peak")
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.map(_._2).toSeq == Seq(128, 128, 44))
    assert(rows.map(_._2.toLong).sum == text.length)
    // 'a' = 97: energy is exactly 97·n, peak 97 everywhere
    rows.foreach { case (_, n, e, p) => assert(e == 97L * n && p == 97L) }
  }

  test("windowFeatures: per-window energy/peak match a direct computation") {
    val text = "The quick brown fox jumps over the lazy dog" * 4 // 172 chars
    val rows = Multimodal.windowFeatures(media(7L -> text), windowSize = 64)
      .orderBy("win_no")
      .select("n_samples", "energy", "peak").as[(Int, Long, Long)].collect()
    val expected = text.grouped(64).toSeq.map(w =>
      (w.length, w.map(_.toLong).sum, w.map(_.toLong).max))
    assert(rows.toSeq == expected)
  }

  test("windowFeatures: empty payload yields one zero window") {
    val rows = Multimodal.windowFeatures(media(9L -> ""), windowSize = 128)
      .select("win_no", "n_samples", "energy", "peak")
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.toSeq == Seq((0L, 0, 0L, 0L)))
  }
}
