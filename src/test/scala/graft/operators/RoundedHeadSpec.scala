package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[TopK.roundedHead]]'s band-prune claim — "a row more than one
  * 10^-scale below the current k-th ROUNDED score cannot round into the
  * heap" — checked against the naive round-everything-and-sort reference
  * over a seeded adversarial sweep (the scalatest↔scalacheck bridge isn't
  * on the classpath, so this is a deterministic grid like ChunkerSpec's):
  * scores dense around rounding boundaries, negatives, duplicate ids, and
  * k larger than the input. Pure driver math, no Spark session.
  */
class RoundedHeadSpec extends AnyFunSuite {

  private def naive(rows: Seq[(Long, Double)], k: Int,
                    scale: Int): Seq[(Long, Double)] =
    rows.map { case (id, s) =>
      (id, graft.functions.HashAlgos.roundHalfUp(s, scale)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k)

  test("roundedHead == naive round-all-then-sort across a seeded adversarial sweep") {
    val rnd = new scala.util.Random(12)
    val jitters = Array(0.0, 0.25e-4, 0.5e-4, 0.49999e-4, 0.75e-4, 1e-4,
      1.5e-4, 0.5e-6, 1e-6)
    for (trial <- 0 until 300) {
      val n = rnd.nextInt(300)
      val scale = if (trial % 2 == 0) 4 else 6
      val k = 1 + rnd.nextInt(40)
      // scores on and around the 1e-4 grid so rounding ties genuinely occur
      val rows = Seq.fill(n) {
        val base = (rnd.nextInt(61) - 30) / 10000.0
        val sign = if (rnd.nextBoolean()) 1.0 else -1.0
        (rnd.nextInt(81).toLong, base + sign * jitters(rnd.nextInt(jitters.length)))
      }
      val got = TopK.roundedHead(rows, k, scale)
      val want = naive(rows, k, scale)
      assert(got == want,
        s"trial=$trial n=$n k=$k scale=$scale\n got=$got\nwant=$want")
    }
  }

  test("exact boundary: a row half a band below the head still competes") {
    // k=1; the second row rounds UP to tie the first and wins on id
    val rows = Seq((5L, 0.12345), (2L, 0.123449999))
    assert(TopK.roundedHead(rows, 1, 4) == naive(rows, 1, 4))
  }
}
