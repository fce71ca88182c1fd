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
