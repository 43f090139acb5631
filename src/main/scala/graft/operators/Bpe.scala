package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE tokenizer TRAINING (builder-prompt extension — the
  * tokenizer-side twin of the a19_tokenizer_fertility KPI: pipelines that
  * measure fertility also train the merges that drive it; Sennrich et al.
  * 2016, arXiv:1508.07909).
  *
  * Simplified word-level BPE: each distinct corpus word becomes a
  * character-symbol sequence; each round counts ADJACENT symbol pairs
  * weighted by word frequency, picks the most frequent pair (ties broken
  * lexicographically — deterministic, engine-independent), and merges
  * every non-overlapping left-to-right occurrence. No end-of-word marker
  * (documented divergence from the paper's `</w>`).
  *
  * 100 TB shape: ONE corpus pass builds the word-frequency table (map-side
  * combined groupBy — the standard trainer input, ~vocab-sized, millions of
  * rows not billions); every merge round then runs on that small table —
  * an explode of adjacent pairs + one aggregation, with the argmax a
  * 1-row collect. Cost is O(rounds · vocab · wordLen), independent of
  * corpus size after the first pass.
  *
  * Symbol sequences are stored as a DOUBLE-SPACE-joined string with single
  * sentinel spaces (` h  e  l  l  o `), and a merge is a plain non-regex
  * `replace(s, " l  r ", " lr ")`: each symbol owns a flanking space on
  * each side, so consuming a match leaves the neighbours' spaces intact
  * and immediately adjacent occurrences (`abab` under merge (a,b) →
  * `[ab, ab]`) all merge in one pass — left-to-right non-overlapping
  * replacement IS the BPE merge convention, and both Spark's `replace`
  * and DuckDB's `replace` implement exactly that scan — which is what
  * lets the whole trainer carry a value-exact oracle. (A single-space
  * join would share the boundary space between occurrences and skip
  * every second adjacent match — the PhraseSearch.scala:20 idiom.)
  */
object Bpe {

  /** The (word, freq) table a BPE trainer consumes — one corpus pass. */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Driver guard for the in-process merge loop — rows of the word-freq
    * table the trainer is willing to hold in process (the
    * [[Bm25]].indexInProcess pattern: a small-vocabulary corpus runs the
    * vocab-sized iteration in one collect + a driver loop instead of
    * `rounds × (1-row collect + vocab checkpoint)` sequential Spark jobs;
    * an over-limit vocabulary takes the distributed loop unchanged).
    */
  val InProcessVocabLimit = 65536

  /** Learn `numMerges` BPE merges. Returns one row per merge:
    * `(rank, lhs, rhs, merged, pair_count)` in learned order (lhs/rhs —
    * LEFT/RIGHT are SQL keywords). Stops early (fewer rows) if the corpus
    * runs out of adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int = 8,
                  inProcessLimit: Int = InProcessVocabLimit): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // checkpointed BEFORE the in-process probe (advice r18): the probe's
    // limit(n+1) collect runs the full word-frequency aggregation, and an
    // over-limit vocabulary would otherwise re-run that corpus pass from
    // scratch for the distributed loop — which reuses wf every round
    // anyway, so the checkpoint pays for itself on either branch
    val wf = wordFrequencies(docs, textCol).localCheckpoint(false)
    if (inProcessLimit > 0) {
      val head = wf.select(col("w"), col("freq"))
        .limit(inProcessLimit + 1)
        .as[(String, Long)].collect()
      if (head.length <= inProcessLimit)
        return learnMergesInProcess(head, numMerges)
          .toDF("rank", "lhs", "rhs", "merged", "pair_count")
    }
    var w = wf
      .select(col("freq"),
        concat(lit(" "),
          array_join(filter(split(col("w"), ""), c => length(c) > 0), "  "),
          lit(" ")).as("s"))
      .localCheckpoint(true) // vocab-sized; reused every round
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var exhausted = false
    var lastReapplied: Option[(String, String)] = None
    while (rank <= numMerges && !exhausted) {
      // adjacent symbol pairs of each word, weighted by word freq
      val a = filter(split(trim(col("s")), " "), x => length(x) > 0)
      val best = w
        .select(col("freq"),
          explode(zip_with(
            slice(a, lit(1), greatest(size(a) - 1, lit(0))),
            slice(a, lit(2), greatest(size(a) - 1, lit(0))),
            (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = best.head
        if (merges.exists(m => m._2 == l && m._3 == r)) {
          // an already-learned pair re-emerged. For this char-level
          // greedy-replace variant tokens only fuse, so the common cause
          // is an adjacency RECREATED by later merges of overlapping runs
          // — reference BPE trainers simply merge it again. Re-apply the
          // replace without learning a duplicate rule; if the SAME pair
          // comes straight back the replace is a no-op (a degenerate
          // corpus) and training stops with what it has, instead of the
          // pre-r15 require-crash or an infinite loop.
          if (lastReapplied.contains((l, r))) {
            println(s"[bpe] WARNING: pair ($l, $r) re-selected twice with " +
              s"no effect; stopping at ${merges.size} merges")
            exhausted = true
          } else {
            println(s"[bpe] WARNING: learned pair ($l, $r) re-emerged " +
              s"(count $cnt); re-applying its merge without a new rule")
            lastReapplied = Some((l, r))
            w = w.select(col("freq"),
                expr(s"replace(s, ' ${esc(l)}  ${esc(r)} ', ' ${esc(l + r)} ')").as("s"))
              .localCheckpoint(true)
          }
        } else {
          lastReapplied = None
          merges += ((rank, l, r, l + r, cnt))
          w = w.select(col("freq"),
              expr(s"replace(s, ' ${esc(l)}  ${esc(r)} ', ' ${esc(l + r)} ')").as("s"))
            .localCheckpoint(true)
          rank += 1
        }
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** The merge loop on the driver — value-identical to the distributed
    * loop BY CONSTRUCTION, not by approximation:
    *  - words use the same double-space symbol representation, and a merge
    *    is `java.lang.String.replace`, the same non-overlapping
    *    left-to-right scan Spark's `replace` expression performs;
    *  - the argmax tie-break compares symbols as UTF-8 BYTES (unsigned),
    *    exactly UTF8String's binary ordering under `orderBy(cnt DESC, l,
    *    r)` (for the tokenizer's `[a-z0-9]+` output the two orders
    *    coincide anyway; the byte compare removes the assumption);
    *  - the re-emerged-pair handling (re-apply without a new rule, stop
    *    if the same pair returns twice) is copied verbatim.
    * BpeSpec pins in-process ≡ distributed on the hand-checkable corpus.
    */
  private[graft] def learnMergesInProcess(
      vocab: Array[(String, Long)], numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    def spaced(w: String): String = {
      val sb = new StringBuilder(" ")
      var i = 0
      var first = true
      while (i < w.length) {
        val cp = w.codePointAt(i)
        if (!first) sb.append("  ")
        sb.appendAll(Character.toChars(cp))
        first = false
        i += Character.charCount(cp)
      }
      sb.append(" ").toString
    }
    def byteLt(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    var words = vocab.map { case (w, f) => (f, spaced(w)) }
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    var exhausted = false
    var lastReapplied: Option[(String, String)] = None
    while (rank <= numMerges && !exhausted) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (f, s) =>
        val syms = s.trim.split(" ").filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        cnt.foreach { case (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (byteLt(p._1, best._1._1) ||
                (p._1 == best._1._1 && byteLt(p._2, best._1._2)))))
            best = (p, c)
        }
        val ((l, r), c) = best
        if (merges.exists(m => m._2 == l && m._3 == r)) {
          if (lastReapplied.contains((l, r))) {
            println(s"[bpe] WARNING: pair ($l, $r) re-selected twice with " +
              s"no effect; stopping at ${merges.size} merges")
            exhausted = true
          } else {
            println(s"[bpe] WARNING: learned pair ($l, $r) re-emerged " +
              s"(count $c); re-applying its merge without a new rule")
            lastReapplied = Some((l, r))
            words = words.map { case (f, s) =>
              (f, s.replace(s" $l  $r ", s" ${l + r} ")) }
          }
        } else {
          lastReapplied = None
          merges += ((rank, l, r, l + r, c))
          words = words.map { case (f, s) =>
            (f, s.replace(s" $l  $r ", s" ${l + r} ")) }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  /** Encode a corpus under a trained merge list — the APPLY side of the
    * tokenizer (what [[learnMerges]] trains): per document
    * `(id, n_words, n_tokens, fertility)` where `n_tokens` counts BPE
    * subword symbols after applying every merge in learned order and
    * `fertility = n_tokens / n_words` (the a19 KPI, now under the TRAINED
    * tokenizer instead of the regex estimator).
    *
    * 100 TB shape: the merges are applied to the DISTINCT word table only
    * — encode cost is O(vocab · rounds), independent of corpus size — and
    * the encoded vocabulary `(word, n_sub)` is broadcast back onto the
    * per-document word counts (one corpus pass, map-side combined, one
    * broadcast join, one groupBy). Documents with no tokens keep their row
    * with zero counts and fertility 0.0.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val wc = docs.select(col(idCol),
        explode(TextFunctions.tokenize(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    // chained non-overlapping replace in learned order — the same merge
    // convention the trainer used, as ONE codegen projection over the vocab
    val sym = merges.foldLeft(
      concat(lit(" "),
        array_join(filter(split(col("w"), ""), c => length(c) > 0), "  "),
        lit(" "))) { case (s, (l, r)) =>
      replace(s, lit(s" $l  $r "), lit(s" $l$r "))
    }
    val vocab = wc.select("w").distinct()
      .select(col("w"),
        size(filter(split(trim(sym), " "), x => length(x) > 0))
          .cast("long").as("n_sub"))
    val agg = wc.join(broadcast(vocab), Seq("w"))
      .groupBy(idCol)
      .agg(sum("c").as("n_words"),
        sum(col("c") * col("n_sub")).as("n_tokens"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_words"), lit(0L)) === 0L, lit(0.0))
          .otherwise(round(
            col("n_tokens").cast("double") / col("n_words").cast("double"),
            4)).as("fertility"))
  }

  /** Apply learned merges to a word (driver-side twin for specs). */
  private[graft] def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var s = " " + word.toCharArray.mkString("  ") + " "
    merges.foreach { case (l, r) => s = s.replace(s" $l  $r ", s" $l$r ") }
    s.trim.split(" ").toSeq.filter(_.nonEmpty)
  }

  // tokens are [a-z0-9]+ so quoting is never needed in practice; escape
  // single quotes anyway so the SQL fragment cannot be broken by input
  private def esc(s: String): String = s.replace("'", "''")
}
