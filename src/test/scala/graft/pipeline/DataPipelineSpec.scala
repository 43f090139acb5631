package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataPipelineSpec extends SparkSpec {
  import spark.implicits._

  // two domains over small shared vocabularies (keeps LM perplexity under
  // the curation gate); per-doc rotation makes every text distinct so the
  // exact-dedup stage drops nothing
  private val phys = Seq("the", "and", "quantum", "energy", "field", "theory",
    "vacuum", "state", "wave", "particle", "photon", "mass", "force",
    "charge", "spin", "flux", "orbit", "atom", "nucleus", "bond")
  private val sport = Seq("the", "and", "football", "goal", "match",
    "striker", "keeper", "pitch", "league", "score", "corner", "penalty",
    "referee", "crowd", "season", "trophy", "tackle", "pass", "shot", "club")

  private def rot(v: Seq[String], i: Int): String =
    (v.drop(i % v.size) ++ v.take(i % v.size)).mkString(" ")

  private def docs = (
    (0 until 20).map(i => (i.toLong, rot(phys, i), "en", "phys")) ++
    (0 until 20).map(i => (100L + i, rot(sport, i), "en", "sport")))
    .toDF("doc_id", "text", "lang", "source")

  test("optional DSIR stage keeps only target-like survivors in the manifest") {
    val base = DataPipeline.run(docs, vocabSize = 100)
      .select("source").as[String].collect().toSet
    assert(base == Set("phys", "sport"),
      s"without selection both domains reach packing: $base")

    val target = Seq((1000L, "quantum energy field theory vacuum state"))
      .toDF("doc_id", "text")
    val selected = DataPipeline.run(docs, vocabSize = 100,
        dsirTarget = Some((target, 20)))
      .select("source").as[String].collect().toSet
    assert(selected == Set("phys"),
      s"the top-20 most target-like docs are exactly the physics side: $selected")
  }
}
