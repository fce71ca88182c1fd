package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive library artifacts — persisted
  * intermediate frames, offline ANN indexes, synthetic fixtures — that
  * several catalog queries share and that Verify/Bench re-request per
  * invocation.
  *
  * Entries are keyed by (session, key) and EVICTED when the owning
  * SparkContext ends: without the hook, persisted DataFrames stay
  * pinned for the process lifetime and entries for stopped sessions
  * hold dead references (the cached plans are unusable once their
  * context is gone). The hook is keyed — and registered exactly once,
  * via putIfAbsent — per SparkContext, and clears every entry whose
  * session rides that context, so `newSession()`-derived sessions are
  * swept too, not only the one that first populated the memo. A
  * retired-but-context-alive session (long-lived context, short-lived
  * sessions) is released eagerly with [[evict]].
  */
final class SessionMemo[K, V] {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkContext, Unit]

  def getOrElseUpdate(session: SparkSession, key: K)(value: => V): V = {
    val sc = session.sparkContext
    if (hooked.putIfAbsent(sc, ()).isEmpty) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((s, _), _) => s.sparkContext ne sc }
          hooked.remove(sc)
          ()
        }
      })
    }
    entries.getOrElseUpdate((session, key), value)
  }

  /** Drop every entry pinned by `session` — for sessions retired before
    * their shared context ends. Returns the number of entries dropped. */
  def evict(session: SparkSession): Int = {
    val before = entries.size
    entries.filterInPlace { case ((s, _), _) => s ne session }
    before - entries.size
  }
}
