package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Runtime shuffle/spill telemetry: execute a query and harvest the
  * ACTUAL exchange bytes from the executed plan's SQL metrics.
  *
  * Plan fingerprints (X195) pin the shuffle STRUCTURE; this measures
  * the shuffle VOLUME — the number that decides whether a plan
  * survives a 100× scale-up. A broadcast as-of join and a shuffled
  * one can share an exchange count (the rollup still shuffles) while
  * moving orders of magnitude different bytes; per-round telemetry in
  * BENCH_r{N}.json (`shuffle_bytes`) makes that a committed series
  * instead of an `.explain` impression, and `ShuffleStatsSpec` gates
  * the relative claims (e.g. the broadcast as-of moves less than the
  * composed join at the same SF).
  *
  * Harvesting walks the POST-EXECUTION adaptive plan (query stages +
  * reused exchanges deduped by identity), so AQE re-plans are
  * reflected — the bytes are what actually crossed the wire, not the
  * initial plan's estimate.
  */
object ShuffleStats {

  /** @param rows         rows produced by the query's own plan
    * @param shuffleBytes total shuffle bytes WRITTEN across exchanges
    * @param spillBytes   disk spill across sorts/aggs/joins
    * @param exchanges    distinct shuffle exchanges that executed */
  final case class Stats(rows: Long, shuffleBytes: Long, spillBytes: Long,
                         exchanges: Int)

  /** Execute `df` (its own plan — projections and all, same discipline
    * as Bench's toRdd.count) and harvest metrics from the final plan. */
  def run(df: DataFrame): Stats = {
    val qe = df.queryExecution
    val rows = qe.toRdd.count()
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    var bytes = 0L
    var spill = 0L
    var n = 0
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case e: ShuffleExchangeLike =>
          n += 1
          e.metrics.get("shuffleBytesWritten").foreach(bytes += _.value)
          e.children.foreach(walk)
        case other =>
          other.metrics.get("spillSize").foreach(spill += _.value)
          other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(qe.executedPlan)
    Stats(rows, bytes, spill, n)
  }
}
