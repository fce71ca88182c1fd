package graft.cdc

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style randomized checks (seeded, deterministic): the
  * distributed materializer must agree with a naive sequential reference
  * model for arbitrary op sequences and arbitrary batch splits, and the
  * DLQ split must conserve records. (SURVEY §5 t2 property list.)
  */
class MaterializePropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Change(op: String, ts: Long, offset: Long, id: Long, v: String)

  /** Sequential reference model: apply changes in (ts, offset) order. */
  private def model(changes: Seq[Change]): Map[Long, String] =
    changes.sortBy(c => (c.ts, c.offset)).foldLeft(Map.empty[Long, String]) {
      (state, c) =>
        if (c.op == "d") state - c.id else state.updated(c.id, c.v)
    }

  private def toDf(changes: Seq[Change]) =
    changes.map(c => ("t.x", 0, c.offset, c.op, c.ts, c.id, c.v))
      .toDF("topic", "partition", "offset", "op", "ts_ms", "id", "v")

  private def genChanges(rnd: Random, n: Int, keys: Int): Seq[Change] =
    (0 until n).map { i =>
      val op = rnd.nextInt(10) match {
        case 0 | 1 => "d"
        case 2 => "c"
        case 3 => "r"
        case _ => "u"
      }
      Change(op, ts = rnd.nextInt(50).toLong, offset = i.toLong,
        id = rnd.nextInt(keys).toLong, v = s"v$i")
    }

  test("random op sequences: one-shot materialization matches the model") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val changes = genChanges(rnd, n = 120, keys = 12)
      val got = Materialize.currentState(toDf(changes), Seq("id"))
        .select($"id", $"v").as[(Long, String)].collect().toMap
      assert(got == model(changes), s"trial $trial diverged from model")
    }
  }

  test("random batch splits: chained merges match the model") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val changes = genChanges(rnd, n = 100, keys = 10)
      // split into 1-4 batches at random cut points BY ARRIVAL (offset),
      // but let ts be arbitrary — late arrivals included
      val nBatches = 1 + rnd.nextInt(3)
      val batches = changes.grouped(math.max(1, changes.size / nBatches)).toSeq
      val finalMirror = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
        (mirror, batch) =>
          Some(mirror match {
            case None => Materialize.versionedState(toDf(batch), Seq("id"))
            case Some(m) => Materialize.merge(m, toDf(batch), Seq("id"))
          })
      }.get
      val got = Materialize.stripVersions(finalMirror)
        .select($"id", $"v").as[(Long, String)].collect().toMap
      assert(got == model(changes), s"trial $trial diverged from model")
    }
  }

  test("replaying every batch twice changes nothing") {
    val rnd = new Random(11)
    val changes = genChanges(rnd, n = 80, keys = 8)
    val batches = changes.grouped(27).toSeq
    def replay(dupes: Boolean) = {
      val ms = batches.flatMap(b => if (dupes) Seq(b, b) else Seq(b))
      ms.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) { (mirror, batch) =>
        Some(mirror match {
          case None => Materialize.versionedState(toDf(batch), Seq("id"))
          case Some(m) => Materialize.merge(m, toDf(batch), Seq("id"))
        })
      }.get
    }
    val once = Materialize.stripVersions(replay(false))
      .as[(Long, String)].collect().toMap
    val twice = Materialize.stripVersions(replay(true))
      .as[(Long, String)].collect().toMap
    assert(once == twice)
    assert(once == model(changes))
  }

  test("DLQ conservation: parsed + dlq == input for arbitrary corruption") {
    val rnd = new Random(3)
    val rows = (0 until 200).map { i =>
      val value =
        if (rnd.nextInt(4) == 0) s"{corrupt $i"
        else s"""{"payload":{"after":{"id":$i,"v":"x"},"op":"c","ts_ms":1}}"""
      ("t.x", s"""{"payload":{"id":$i}}""", value, 0, i.toLong)
    }.toDF("topic", "key", "value", "partition", "offset")
    val parsed = Envelope.parse(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val good = Envelope.wellFormed(parsed).count()
    val bad = Envelope.dlq(parsed).count()
    assert(good + bad == 200)
    assert(bad > 0)
  }
}
