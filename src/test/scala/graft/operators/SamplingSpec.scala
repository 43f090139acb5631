package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // 90 rows of group A, 10 of B, 2 of C — ids disjoint and stable
  private def mix = (
    (0L until 90L).map(i => (i, "A")) ++
    (100L until 110L).map(i => (i, "B")) ++
    Seq((200L, "C"), (201L, "C"))).toDF("id", "g")

  /** The operator's threshold formula, reimplemented independently. */
  private def thresholds(counts: Map[String, Long], t: Double,
                         alpha: Double): Map[String, Long] = {
    val w = counts.view.mapValues(n => math.floor(math.pow(n.toDouble, alpha) * 1e6).toLong).toMap
    val tw = w.values.sum.toDouble
    counts.map { case (g, n) =>
      g -> math.floor(math.min(1.0, ((t * w(g)) / tw) / n.toDouble) * Sampling.P.toDouble).toLong
    }
  }

  test("temperatureSample: kept set equals the hash-threshold formula exactly") {
    val df = mix
    val counts = Map("A" -> 90L, "B" -> 10L, "C" -> 2L)
    val thr = thresholds(counts, t = 20.0, alpha = 0.5)
    val expected = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, g) =>
        Math.floorMod(id * Sampling.Knuth, Sampling.P) < thr(g) }
      .map(_._1).toSet
    val got = Sampling.temperatureSample(df, "g", "id", targetRows = 20, alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(got == expected, s"got $got expected $expected")
    assert(got.nonEmpty)
  }

  test("temperatureSample: alpha < 1 upweights rare groups; quota caps at the group size") {
    val df = mix
    // alpha = 0.5 gives B a higher keep FRACTION than A
    val counts = Map("A" -> 90L, "B" -> 10L, "C" -> 2L)
    val thr = thresholds(counts, t = 20.0, alpha = 0.5)
    assert(thr("B") > thr("A"), s"rare group must draw a higher threshold: $thr")
    // large target: tiny group C's quota exceeds its size → fraction caps at 1
    val thrBig = thresholds(counts, t = 90.0, alpha = 0.5)
    assert(thrBig("C") == Sampling.P, s"capped fraction must keep all of C: $thrBig")
    val keptC = Sampling.temperatureSample(df, "g", "id", targetRows = 90, alpha = 0.5)
      .filter(col("g") === "C").count()
    assert(keptC == 2, "both C rows survive a capped fraction")
    // alpha = 1 is proportional sampling: equal thresholds for every group
    val thrProp = thresholds(counts, t = 20.0, alpha = 1.0)
    assert(thrProp.values.toSet.size == 1, s"alpha=1 must be mix-preserving: $thrProp")
  }

  test("temperatureSample: deterministic across invocations") {
    val a = Sampling.temperatureSample(mix, "g", "id", targetRows = 20)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(mix, "g", "id", targetRows = 20)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureMix: repetition equals the floor+fractional-draw formula; rare groups repeat more") {
    val df = mix
    val counts = Map("A" -> 90L, "B" -> 10L, "C" -> 2L)
    // independent reimplementation of the ratio → (base, frac threshold) path
    val t = 150.0; val alpha = 0.5
    val w = counts.view.mapValues(n => math.floor(math.pow(n.toDouble, alpha) * 1e6).toLong).toMap
    val tw = w.values.sum.toDouble
    val ratio = counts.map { case (g, n) => g -> ((t * w(g)) / tw) / n.toDouble }
    val expected = df.collect().map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, g) =>
        val base = math.floor(ratio(g)).toLong
        val fracThr = math.floor((ratio(g) - math.floor(ratio(g))) * Sampling.P.toDouble).toLong
        val rep = base + (if (Math.floorMod(id * Sampling.Knuth, Sampling.P) < fracThr) 1L else 0L)
        (id, rep)
      }.filter(_._2 > 0).toMap
    val got = Sampling.temperatureMix(df, "g", "id", targetRows = 150, alpha = 0.5)
      .select("id", "n_repeats").as[(Long, Long)].collect().toMap
    assert(got == expected, s"got $got expected $expected")
    // at alpha=0.5 the tiny group's per-row repetition exceeds the big group's
    assert(ratio("C") > ratio("A") && got.nonEmpty)
    // every surviving row repeats at least once; group totals track quotas
    assert(got.values.forall(_ > 0))
  }

  test("shardOrder: shards partition the corpus, positions are dense, and the formula matches") {
    val df = (0L until 97L).map(i => (i * 7L + 3L, s"d$i")).toDF("id", "x")
    val got = Sampling.shardOrder(df, "id", 8)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(got.length == 97, "no rows gained or lost")
    // shard formula: second Knuth hash orders within the shard
    got.foreach { case (id, sh, _) =>
      assert(sh == (Math.floorMod(id * Sampling.Knuth, Sampling.P) % 8).toInt) }
    got.groupBy(_._2).foreach { case (sh, rows) =>
      val byPos = rows.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (0L until rows.length.toLong), s"dense positions in shard $sh")
      val expectedOrder = rows.map(_._1)
        .sortBy(id => (Math.floorMod(id * Sampling.Knuth2, Sampling.P), id)).toSeq
      assert(byPos.map(_._1).toSeq == expectedOrder, s"within-shard order in shard $sh")
    }
  }

  test("shardOrder: re-runs are identical; appends never move a row to another shard") {
    val df = (0L until 50L).map(i => (i, s"d$i")).toDF("id", "x")
    val a = Sampling.shardOrder(df, "id", 4).select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val b = Sampling.shardOrder(df, "id", 4).select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(a == b, "deterministic across runs")
    val grown = (0L until 80L).map(i => (i, s"d$i")).toDF("id", "x")
    val g = Sampling.shardOrder(grown, "id", 4).select("id", "shard", "pos")
      .as[(Long, Int, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    a.foreach { case (id, sh, _) =>
      assert(g(id)._1 == sh, s"append moved row $id across shards") }
    // old rows keep their relative within-shard order after the append
    a.groupBy(_._2).foreach { case (sh, rows) =>
      val oldOrder = rows.sortBy(_._3).map(_._1).toSeq
      val newOrder = oldOrder.sortBy(id => g(id)._2)
      assert(newOrder == oldOrder, s"relative order changed in shard $sh")
    }
  }
}
