package graft.operators

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memoization shared by the in-process serving rungs
  * (flat / IVF / graph corpora, BM25 term arrays): weak-keyed by
  * SparkSession so a stopped session's entries (and their broadcasts) can
  * be collected, ConcurrentHashMap inside for compute-once semantics.
  * One implementation instead of a copy per cache — the guard policies
  * that sit in front of these memos (LIMIT-bounded counts, byte budgets)
  * are easier to audit when the memo itself has exactly one shape.
  */
/** Cheap driver-side change marker for a locally-stored table directory:
  * CRC32 over the sorted (name, mtime, length) tuples — 0 when the path
  * has no local java.io view (non-local filesystems fall back to
  * path-only identity, the pre-existing cachedIndex staleness contract).
  * A plain mtime+length SUM collides on rewrites inside the mtime
  * granularity with equal sizes; the tuple hash does not.
  */
private[graft] object PathFingerprint {
  def apply(path: String): Long =
    scala.util.Try {
      val d = new java.io.File(path)
      val fs = Option(d.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
      val crc = new java.util.zip.CRC32()
      fs.foreach { f =>
        crc.update(s"${f.getName}:${f.lastModified()}:${f.length()};"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      crc.getValue
    }.getOrElse(0L)
}

/** Per-FILE inventory of a stored table directory — sorted
  * `(relative path, mtime, length)` rows over the DATA files
  * (Spark-hidden `_`/`.` metadata like `_SUCCESS` is excluded at every
  * path level: a legitimate append rewrites the success marker). Where
  * [[PathFingerprint]] answers "did ANYTHING change", the inventory
  * answers the append-soundness question (ADVICE r15): append-only
  * parquet growth adds new part files without touching old ones, so
  * `recorded ⊆ current` discriminates pure id growth from an in-place
  * re-embed that also added files in the same step.
  *
  * Routed through the Hadoop FileSystem API with RECURSIVE listing
  * (ADVICE r16): the previous `java.io.File` top-level view returned
  * empty on remote kbs AND on subdirectory-partitioned layouts, silently
  * degrading every incremental run there to a full rebuild. Keys are
  * base-relative paths so a partitioned layout's files stay distinct.
  * Empty when the path is absent or unlistable — callers treat empty as
  * UNATTESTABLE (not merely stale) and take the rebuild path; note
  * name+mtime+length is change detection, not content attestation (a
  * same-size rewrite with preserved mtime evades it — the documented
  * limit of fingerprint-level staleness everywhere in this engine).
  */
private[graft] object PathInventory {
  def apply(spark: SparkSession, path: String): Seq[(String, Long, Long)] =
    scala.util.Try {
      val base = new org.apache.hadoop.fs.Path(path)
      val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
      val baseUri = fs.makeQualified(base).toUri
      val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      val it = fs.listFiles(base, true) // recursive
      while (it.hasNext) {
        val st = it.next()
        val rel = baseUri.relativize(st.getPath.toUri).getPath
        val hidden = rel.split('/')
          .exists(seg => seg.startsWith("_") || seg.startsWith("."))
        if (!hidden) out += ((rel, st.getModificationTime, st.getLen))
      }
      out.sortBy(_._1).toSeq
    }.getOrElse(Seq.empty)
}

private[graft] final class SessionMemo[V] {
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, V]]()

  def getOrBuild(spark: SparkSession, key: String)(build: => V): V = {
    val perSession = cache.synchronized {
      cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, V]())
    }
    perSession.computeIfAbsent(key, _ => build)
  }
}
