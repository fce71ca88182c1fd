package graft.plans

import graft.SparkSpec
import graft.operators.QueryCatalog

/** Gates for the runtime shuffle telemetry (see [[ShuffleStats]]).
  *
  * Thresholds are COMPARATIVE (same session, same SF), not absolute:
  * absolute byte budgets at sf0.001 would be noise-sized, but the
  * relative claims they pin are scale claims — the broadcast as-of
  * join's "zero exchanges on the fact side" must show up as moving
  * strictly fewer shuffle bytes than the composed (shuffling)
  * formulation of the same contract, at ANY scale factor.
  */
class ShuffleStatsSpec extends SparkSpec {

  private def stats(name: String) = {
    spark.catalog.clearCache()
    ShuffleStats.run(QueryCatalog.byName(name).fn(spark, sf0001))
  }

  test("harvester sanity: a grouped query reports exchanges and bytes, " +
    "and its row count matches the plan's own output") {
    val s = stats("agg_pricing_summary")
    assert(s.exchanges >= 1, s"expected >=1 exchange, got $s")
    assert(s.shuffleBytes > 0, s"expected shuffle bytes > 0, got $s")
    assert(s.rows > 0)
  }

  test("broadcast as-of join moves fewer shuffle bytes than the " +
    "composed union+window formulation of the same contract") {
    val bc = stats("join_asof_broadcast")
    val composed = stats("join_asof")
    assert(bc.shuffleBytes < composed.shuffleBytes,
      s"broadcast=$bc composed=$composed — the zero-fact-shuffle " +
        "claim no longer holds at runtime")
  }

  test("the salted skew join shuffles the same order of bytes as the " +
    "events input, not a replicated blowup") {
    val s = stats("join_salted_skew")
    // the salt replicates only the BROADCAST side; the big side must
    // cross the wire about once. 20x headroom: a cartesian or
    // per-salt fact replication would be 100-1000x.
    val inputBytes = java.nio.file.Files.size(java.nio.file.Paths.get(
      s"$sf0001/events.parquet"))
    assert(s.shuffleBytes < 20L * inputBytes,
      s"skew-join shuffled ${s.shuffleBytes} bytes vs input " +
        s"$inputBytes — replication blowup")
  }
}
