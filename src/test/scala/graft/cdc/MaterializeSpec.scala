package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  // (topic, partition, offset, op, ts_ms, id, v)
  private def changes(rows: (String, Long, Long, String)*) =
    rows.zipWithIndex.map { case ((op, ts, id, v), i) =>
      ("t.x", 0, i.toLong, op, ts, id, v)
    }.toDF("topic", "partition", "offset", "op", "ts_ms", "id", "v")

  test("insert then update keeps last write") {
    val state = Materialize.currentState(changes(
      ("c", 1L, 1L, "a"), ("u", 2L, 1L, "b")), Seq("id"))
    assert(state.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "b")))
  }

  test("delete removes the key; delete then reinsert keeps it") {
    val state = Materialize.currentState(changes(
      ("c", 1L, 1L, "a"), ("d", 2L, 1L, null),
      ("c", 1L, 2L, "x"), ("d", 2L, 2L, null), ("c", 3L, 2L, "y")), Seq("id"))
    assert(state.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "y")))
  }

  test("same ts_ms resolves by offset (log order)") {
    val state = Materialize.currentState(changes(
      ("c", 1L, 1L, "first"), ("u", 1L, 1L, "second")), Seq("id"))
    assert(state.collect().head.getString(1) == "second")
  }

  test("merge across batch boundary == one-shot replay") {
    val all = changes(
      ("c", 1L, 1L, "a"), ("u", 2L, 1L, "b"),
      ("c", 1L, 2L, "x"), ("d", 3L, 2L, null),
      ("c", 1L, 3L, "p"))
    val oneShot = Materialize.currentState(all, Seq("id"))
    val mirror = Materialize.versionedState(all.filter($"ts_ms" < 2), Seq("id"))
    val merged = Materialize.stripVersions(
      Materialize.merge(mirror, all.filter($"ts_ms" >= 2), Seq("id")))
    assert(merged.orderBy("id").collect().toSeq ==
      oneShot.orderBy("id").collect().toSeq)
  }

  test("merge is idempotent: replaying the same batch is a no-op") {
    val all = changes(("c", 1L, 1L, "a"), ("u", 2L, 1L, "b"), ("d", 2L, 2L, null))
    val once = Materialize.stripVersions(Materialize.merge(
      Materialize.versionedState(all, Seq("id")), all, Seq("id")))
    val oneShot = Materialize.currentState(all, Seq("id"))
    assert(once.orderBy("id").collect().toSeq == oneShot.orderBy("id").collect().toSeq)
  }

  test("late old change cannot regress a newer mirror row or resurrect a delete") {
    val newer = changes(("u", 9L, 1L, "new"), ("d", 9L, 2L, null))
    val mirror = Materialize.versionedState(newer, Seq("id"))
    val lateOld = changes(("c", 1L, 1L, "old"), ("c", 1L, 2L, "zombie"))
    val merged = Materialize.stripVersions(
      Materialize.merge(mirror, lateOld, Seq("id")))
    val rows = merged.orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "new")))
  }

  test("additive schema evolution backfills null") {
    val mirror = Materialize.versionedState(
      changes(("c", 1L, 1L, "a")), Seq("id"))
    val batch = Seq(("t.x", 0, 10L, "u", 5L, 1L, "b", "extra1"),
      ("t.x", 0, 11L, "c", 5L, 2L, "c", "extra2"))
      .toDF("topic", "partition", "offset", "op", "ts_ms", "id", "v", "v2")
    val merged = Materialize.stripVersions(
      Materialize.merge(mirror, batch, Seq("id")))
    val rows = merged.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("b", "c"))
    assert(rows.map(_.getString(2)).toSeq == Seq("extra1", "extra2"))
  }
}
