package graft

import org.apache.spark.sql.SparkSession

/** Engine front door: a SparkSession configured the way every graft
  * component assumes (UTC, AQE on, modest shuffle partitions for local
  * mode; on a real cluster pass `shufflePartitions` ≈ 2-3× total
  * cores). */
object GraftSession {
  /** @param rocksDbState enable for stateful streaming with
    *   `transformWithState` (e.g. [[graft.streaming.StatefulOps
    *   .firstSeenOnly]]): the RocksDB state store provider plus
    *   changelog checkpointing — without the latter every micro-batch
    *   uploads a full RocksDB snapshot per partition. */
  def build(master: String = "local[*]",
            appName: String = "graft",
            shufflePartitions: Int = 32,
            rocksDbState: Boolean = false): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withState =
      if (!rocksDbState) b
      else b.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
    val s = withState.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // a front-door session comes fully equipped: SQL-registered custom
    // expressions/UDAFs, the MV rewrite rule, and the native as-of
    // strategy + its pushdown/pruning rule (all idempotent, and
    // register() also covers the getOrCreate-returned-existing-session
    // case where builder extensions would be ignored)
    GraftExtensions.register(s)
    graft.plans.AsofJoinNative.ensureRegistered(s)
    s
  }
}
