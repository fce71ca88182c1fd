package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive library artifacts — persisted
  * intermediate frames, offline ANN indexes, synthetic fixtures — that
  * several catalog queries share and that Verify/Bench re-request per
  * invocation.
  *
  * Entries are keyed by (session, key) and EVICTED when the session's
  * SparkContext ends: without the hook, persisted DataFrames stay
  * pinned for the process lifetime and entries for stopped sessions
  * hold dead references (the cached plans are unusable once their
  * context is gone). One listener is registered per session on first
  * use; it drops every entry belonging to that session.
  */
final class SessionMemo[K, V] {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Unit]

  def getOrElseUpdate(session: SparkSession, key: K)(value: => V): V = {
    hooked.getOrElseUpdate(session, {
      session.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          entries.filterInPlace { case ((s, _), _) => s ne session }
          hooked.remove(session)
          ()
        }
      })
    })
    entries.getOrElseUpdate((session, key), value)
  }
}
