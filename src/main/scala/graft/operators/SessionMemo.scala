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
private[operators] final class SessionMemo[V] {
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
