package graft.operators

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew stress with a SYNTHETIC 100x-hot key, asserted on TASK METRICS
  * (not plan strings): the natural-data join_salted_skew query proves
  * correctness, this proves the mitigation actually bounds the work —
  * under both the deterministic salt (operators/Skew.scala) and AQE's
  * runtime split, no post-split task reads more than ~2x the median
  * task's input, while the unmitigated join concentrates the hot key
  * into one straggler task. At 1000 executors that straggler IS the
  * stage time; the bound is the scale property. */
class SkewStressSpec extends SparkSpec {

  /** Per-task shuffle-read metrics grouped by stage. */
  private class TaskInputListener extends SparkListener {
    val byStage = TrieMap.empty[Int, ArrayBuffer[(Long, Long)]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null && m.shuffleReadMetrics.recordsRead > 0)
        byStage.getOrElseUpdate(t.stageId, ArrayBuffer()) +=
          ((m.shuffleReadMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead))
    }
    /** The join's reduce stage = the stage reading the most records. */
    def joinStageTasks: Seq[(Long, Long)] = {
      // listener bus is async — wait for the task events to drain
      val deadline = System.nanoTime() + 10000000000L
      var last = -1
      var size = byStage.values.map(_.size).sum
      while (size != last && System.nanoTime() < deadline) {
        last = size; Thread.sleep(200)
        size = byStage.values.map(_.size).sum
      }
      byStage.values.maxBy(_.map(_._1).sum).toSeq
    }
  }

  // key 0 carries 50k rows; keys 1..100 carry 500 each — a 100x-hot key
  private def fact: DataFrame = spark.range(0, 100000).select(
    when(col("id") < 50000, 0L).otherwise(col("id") % 100 + 1).as("k"),
    md5(col("id").cast("string")).as("pad"))

  private def dim: DataFrame = spark.range(0, 101).select(
    col("id").as("k"), concat(lit("dim_"), col("id")).as("name"))

  private def withConfs(confs: Map[String, String])(f: => Unit): Unit = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def measure(job: => Unit): Seq[(Long, Long)] = {
    val l = new TaskInputListener
    spark.sparkContext.addSparkListener(l)
    try { job; l.joinStageTasks }
    finally spark.sparkContext.removeSparkListener(l)
  }

  private def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)

  test("unmitigated hot-key join concentrates one straggler task; " +
    "salting bounds every task to ~2x the median input") {
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "false", // isolate the salt's effect
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {

      // keep `pad` alive through the join so shuffled rows carry real
      // width (count() alone lets Catalyst prune the join to keys)
      def run(joined: DataFrame): Unit = {
        val r = joined.agg(count(lit(1)), sum(length(col("pad")))).head()
        assert(r.getLong(0) == 100000L)
      }

      // baseline: the hot key lands in ONE task — max >> median
      val plainTasks = measure(run(fact.join(dim, "k")))
      val plainRecs = plainTasks.map(_._1)
      assert(plainRecs.max > 5 * median(plainRecs),
        s"stress not real: task records ${plainRecs.sorted.reverse.take(3)} " +
          s"vs median ${median(plainRecs)}")

      // salted: the SAME join spread over 32 salts — bounded tasks
      val saltedTasks = measure(
        run(Skew.saltedEquiJoin(fact, dim, "k", saltFactor = 32)))
      val saltedRecs = saltedTasks.map(_._1)
      assert(saltedRecs.max <= 2 * median(saltedRecs),
        s"salted task records not bounded: max ${saltedRecs.max} vs " +
          s"median ${median(saltedRecs)} over ${saltedRecs.length} tasks")
    }
  }

  test("AQE skew split bounds every task's shuffle-read bytes to ~2x " +
    "the median at runtime, no salt column") {
    withConfs(Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")) {
      val tasks = measure {
        // payload kept alive so the hot partition's shuffle bytes cross
        // the split threshold (pruned to keys it never would)
        val r = fact.join(dim, "k")
          .agg(count(lit(1)), sum(length(col("pad")))).head()
        assert(r.getLong(0) == 100000L)
      }
      val bytes = tasks.map(_._2)
      assert(bytes.length > 8, s"expected split tasks, got ${bytes.length}")
      assert(bytes.max <= 2 * median(bytes),
        s"AQE-split task bytes not bounded: max ${bytes.max} vs " +
          s"median ${median(bytes)} over ${bytes.length} tasks")
    }
  }
}
