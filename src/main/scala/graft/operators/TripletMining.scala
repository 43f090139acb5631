package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive (anchor, positive, hard-negative) triple mining for
  * embedding-model training data (builder-prompt extension — the standard
  * recipe for building contrastive finetuning sets from an unlabeled
  * corpus, e.g. SimCSE-style hard negatives):
  *
  *  - '''positive''': the anchor's highest-cosine near-duplicate from the
  *    sign-LSH bucketed pass ([[Dedup.embeddingDups]] — candidates only
  *    within a bucket, exact cosine verify, never all-pairs);
  *  - '''hard negative''': among the anchor's exact top-`negK` neighbors,
  *    the best one that (a) is not the anchor itself, (b) is not ANY
  *    bucketed near-dup partner of the anchor (a near-dup as negative
  *    would be a false negative), and (c) sits at least `margin` below
  *    the positive's cosine — the triplet-loss margin convention: similar
  *    enough to be hard, separated enough to be a true negative.
  *
  * Anchors without a qualifying negative in their top-`negK` drop (inner
  * join) — the deterministic form of "skip anchors with no hard negative".
  *
  * 100 TB shape: positives ride the bucketed dedup pass (one shuffle by
  * bucket); the negative search is a batched top-k where ONLY anchors are
  * queries (anchors ≪ corpus — they need a near-dup to qualify), served by
  * [[VectorSearch.bruteTopKBatchAgg]] (map-side-combined bounded heaps; at
  * larger scale swap in the IVF/IVFPQ batch the serving tiers provide —
  * approximate hard negatives are standard practice).
  */
object TripletMining {

  def mine(embeddings: DataFrame, idCol: String, vecCol: String,
           posThreshold: Double = 0.2, margin: Double = 0.1,
           numPlanes: Int = 4, negK: Int = 20,
           seed: Long = 42L,
           cacheKey: Option[String] = None): DataFrame = {
    val pairs = Dedup.embeddingDups(embeddings, idCol, vecCol,
        posThreshold, numPlanes, seed)
      .localCheckpoint(true) // reused: positive argmax + negative exclusion
    // positive per anchor: max raw cosine, ties to the lowest partner id
    val wp = Window.partitionBy("doc_a").orderBy(col("cos").desc, col("doc_b"))
    val pos = pairs.withColumn("_rn", row_number().over(wp))
      .filter(col("_rn") === 1)
      .select(col("doc_a").as("anchor"), col("doc_b").as("positive"),
        col("cos").as("_pos_raw"))
    val anchorQ = pos.select(col("anchor").as("query_id"))
      .join(embeddings.select(col(idCol).as("query_id"), col(vecCol).as("qvec")),
        "query_id")
    // exact top-negK (self rides along at rank 1 and is filtered below —
    // the same "rank including self" convention the SQL twin uses)
    val top = VectorSearch.bruteTopKBatchAgg(embeddings, idCol, vecCol,
      anchorQ, "query_id", "qvec", k = negK, cacheKey = cacheKey)
    // near-dup partners of each anchor, either orientation — never negatives
    val excl = pairs.select(col("doc_a").as("query_id"), col("doc_b").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("query_id"), col("doc_a").as("doc_id")))
    val wn = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    val neg = top
      .filter(col("doc_id") =!= col("query_id"))
      .join(excl, Seq("query_id", "doc_id"), "left_anti")
      .join(pos.select(col("anchor").as("query_id"), col("_pos_raw")), "query_id")
      .filter(col("score") <= col("_pos_raw") - lit(margin))
      .withColumn("_rn", row_number().over(wn))
      .filter(col("_rn") === 1)
      .select(col("query_id").as("anchor"), col("doc_id").as("negative"),
        round(col("score"), 6).as("neg_cos"))
    pos.select(col("anchor"), col("positive"), round(col("_pos_raw"), 6).as("pos_cos"))
      .join(neg, "anchor")
  }
}
