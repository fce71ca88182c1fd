package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** ST10 retry policy: the reference restarts failed work via Airflow
  * task retries (retries 1-2, delay 30 s - 5 min,
  * cdc_health_check_dag.py:10-13). Spark's equivalent is a driver loop
  * that restarts the StreamingQuery from its checkpoint — state and
  * offsets resume, the idempotent merge absorbs any replayed batch.
  */
object ResilientRunner {

  final case class Policy(maxRetries: Int = 2, delayMs: Long = 30000L) {
    /** Delay before attempt n (1-based), linear like Airflow's fixed
      * retry_delay. */
    def delayFor(attempt: Int): Long = delayMs
    def shouldRetry(attempt: Int): Boolean = attempt <= maxRetries
  }

  /** Run `start` until it terminates cleanly or retries are exhausted.
    * Returns the number of restarts performed; rethrows the final
    * failure. `sleep` is injectable for tests. */
  def runWithRetries(start: () => StreamingQuery, policy: Policy,
                     sleep: Long => Unit = Thread.sleep): Int = {
    var attempt = 0
    var restarts = 0
    var done = false
    while (!done) {
      val q = start()
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: Throwable =>
          attempt += 1
          if (!policy.shouldRetry(attempt)) throw e
          restarts += 1
          sleep(policy.delayFor(attempt))
      }
    }
    restarts
  }
}
