package graft

/** Data-independent CPU canary for receipt host-normalization (verdict
  * r17 #2): the host this suite runs on drifts ±40% day to day, which
  * made two r17 targets ungradable on their face and forced a full
  * control-worktree rebuild to rescue comparisons. Every Bench/Scale
  * receipt now leads with this fixed workload's wall-clock, so any two
  * receipts can be compared at `t_a / canary_a` vs `t_b / canary_b`
  * without re-running old code.
  *
  * The workload is a fixed-seed xorshift fill + sort + fold over 2M
  * longs × 5 rounds — single-threaded ON PURPOSE: Spark local[32] rows
  * are dominated by per-core speed (32 task threads on the same silicon
  * slow down together), and a parallel canary would also measure
  * scheduler noise. Purely in-heap, no Spark, no IO, no timestamps in
  * the result — deterministic to the last bit (the checksum is printed
  * so a miscompiled/DCE'd run is visible).
  */
object HostCanary {

  /** (seconds, checksum). ~1.3 s on the host that recorded the r18
    * receipts (tools/scale_r18.txt carries the same-run value).
    */
  def run(): (Double, Long) = {
    val t0 = System.nanoTime()
    var h = 0L
    var round = 0
    while (round < 5) {
      val a = new Array[Long](2000000)
      var x = 0x9E3779B97F4A7C15L + round
      var i = 0
      while (i < a.length) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        a(i) = x
        i += 1
      }
      java.util.Arrays.sort(a)
      i = 0
      while (i < a.length) { h = h * 31 + a(i); i += 1 }
      round += 1
    }
    ((System.nanoTime() - t0) / 1e9, h)
  }

  /** Run + print the receipt line; returns the seconds for callers that
    * embed it (Bench's JSON line).
    */
  def receiptLine(tag: String): Double = {
    val (sec, h) = run()
    println(f"[$tag] cpu-canary ${sec}%.3f s (checksum $h%016x)")
    sec
  }
}
