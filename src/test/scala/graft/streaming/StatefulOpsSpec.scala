package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StatefulOps.{KeyedChange, Transition}

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("changesOnly emits transitions, suppresses replays and stale events") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedChange]
    val q = StatefulOps.changesOnly(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("transitions")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def emitted(): Seq[(Long, String, String)] = spark.table("transitions")
        .as[Transition].collect().map(t => (t.id, t.kind, t.payload)).toSeq

      ms.addData(KeyedChange(1, "c", 100, 0, "a"))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "insert", "a")))

      // replay of the same change: no output
      ms.addData(KeyedChange(1, "c", 100, 0, "a"))
      q.processAllAvailable()
      assert(emitted() == Seq((1L, "insert", "a")))

      // genuine update + new key
      ms.addData(KeyedChange(1, "u", 200, 1, "b"), KeyedChange(2, "c", 200, 2, "x"))
      q.processAllAvailable()
      assert(emitted().toSet ==
        Set((1L, "insert", "a"), (1L, "update", "b"), (2L, "insert", "x")))

      // stale out-of-order event: suppressed
      ms.addData(KeyedChange(1, "u", 150, 0, "stale"))
      q.processAllAvailable()
      assert(emitted().count(_._1 == 1L) == 2)

      // delete then delete again: one transition
      ms.addData(KeyedChange(1, "d", 300, 3, ""))
      q.processAllAvailable()
      ms.addData(KeyedChange(1, "d", 400, 4, ""))
      q.processAllAvailable()
      assert(emitted().filter(_._1 == 1L).map(_._2) ==
        Seq("insert", "update", "delete"))
    } finally q.stop()
  }

  test("firstSeenOnly (transformWithState): cross-batch exact dedup by fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.FingerprintedDoc
    // transformWithState is backed by the RocksDB state store;
    // changelog checkpointing avoids a full RocksDB snapshot zip per
    // batch per partition (observed minutes per micro-batch without it)
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    val ms = MemoryStream[FingerprintedDoc]
    val q = StatefulOps.firstSeenOnly(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("first_seen")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      def ids(): Set[Long] = spark.table("first_seen")
        .as[FingerprintedDoc].collect().map(_.doc_id).toSet

      // batch 1: two distinct docs + a within-batch duplicate of fp "a"
      ms.addData(FingerprintedDoc("a", 1, "t1"), FingerprintedDoc("b", 2, "t2"),
        FingerprintedDoc("a", 3, "t1"))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L))

      // batch 2: cross-batch duplicate suppressed, new fp admitted
      ms.addData(FingerprintedDoc("a", 4, "t1"), FingerprintedDoc("c", 5, "t3"))
      q.processAllAvailable()
      assert(ids() == Set(1L, 2L, 5L))
    } finally {
      q.stop()
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dropDuplicatesWithinWatermark dedups replayed events") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val q = ms.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .trigger(Trigger.ProcessingTime(10)).start()
    try {
      val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      ms.addData((t, 1L), (t, 1L), (t, 2L))
      q.processAllAvailable()
      ms.addData((t, 2L), (t, 3L)) // 2 is a replay within the watermark
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 3)
    } finally q.stop()
  }
}
