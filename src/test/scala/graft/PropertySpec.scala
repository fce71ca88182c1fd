package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.cdc.{Envelope, Materialize}

/** Property-based checks (SURVEY §5 tier-2): upsert idempotence,
  * within-key order-independence, DLQ conservation, packing invariants,
  * top-k aggregator vs reference. ScalaCheck drives the generators;
  * each property runs a reduced number of trials (every trial is a
  * Spark job). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(prop: Prop, trials: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  // unwrapped change events: unique offsets, small key space so
  // update/delete/reinsert chains actually collide on keys
  private case class Ev(topic: String, partition: Int, offset: Long,
                        op: String, ts_ms: Long, id: Long, v: Double)

  private val evsGen: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 40)
    ops <- Gen.listOfN(n, Gen.oneOf("c", "u", "d"))
    keys <- Gen.listOfN(n, Gen.choose(0L, 5L))
    ts <- Gen.listOfN(n, Gen.choose(0L, 10L))
  } yield List.tabulate(n)(i =>
    Ev("t", 0, i.toLong, ops(i), ts(i), keys(i), keys(i) * 10.0 + i))

  private def state(evs: Seq[Ev]) =
    Materialize.versionedState(spark.createDataFrame(evs).toDF(), Seq("id"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("upsert replay is idempotent: merge(state(b), b) == state(b)") {
    check(Prop.forAll(evsGen) { evs =>
      val s1 = state(evs)
      val replayed = Materialize.merge(s1,
        spark.createDataFrame(evs).toDF(), Seq("id"))
      rows(replayed) == rows(s1)
    })
  }

  test("materialized state is independent of event arrival order") {
    val gen = for { evs <- evsGen; shuffled <- Gen.const(scala.util.Random.shuffle(evs)) }
      yield (evs, shuffled)
    check(Prop.forAll(gen) { case (evs, shuffled) =>
      rows(state(evs)) == rows(state(shuffled))
    })
  }

  test("batch-split invariance: merge(state(a), b) == state(a ++ b)") {
    check(Prop.forAll(evsGen, evsGen) { (a, b0) =>
      // keep offsets globally unique across the two batches
      val off = a.map(_.offset).maxOption.getOrElse(-1L) + 1
      val b = b0.zipWithIndex.map { case (e, i) => e.copy(offset = off + i) }
      val incremental = Materialize.merge(state(a),
        spark.createDataFrame(b).toDF(), Seq("id"))
      rows(incremental) == rows(state(a ++ b))
    })
  }

  test("DLQ conservation: well-formed + dead letters == input") {
    val valueGen: Gen[String] = Gen.oneOf(
      Gen.choose(0L, 99L).map(id =>
        s"""{"payload":{"after":{"id":$id,"v":1.0},"op":"c","ts_ms":5}}"""),
      Gen.alphaNumStr.map(s => s"garbage:$s"), // malformed
      Gen.const(null: String))                 // tombstone: well-formed
    check(Prop.forAll(Gen.listOfN(30, valueGen)) { values =>
      val raw = values.zipWithIndex
        .map { case (v, i) => ("mysql-server.pos_bi_db.orders", 0, i.toLong, v, s"""{"payload":{"id":1}}""") }
        .toDF("topic", "partition", "offset", "value", "key")
      val parsed = Envelope.parse(raw, graft.cdc.Fixture.rowSchema)
      Envelope.wellFormed(parsed).count() + Envelope.dlq(parsed).count() ==
        raw.count()
    }, trials = 5)
  }

  test("packing matches the sequential reference implementation") {
    val docsGen = for {
      n <- Gen.choose(1, 60)
      langs <- Gen.listOfN(n, Gen.oneOf("en", "de", "fr"))
      lens <- Gen.listOfN(n, Gen.choose(1L, 300L))
    } yield List.tabulate(n)(i => (langs(i), i.toLong, lens(i)))
    check(Prop.forAll(docsGen) { docs =>
      val out = graft.functions.Packing.packGreedy(
        docs.toDF("lang", "doc_id", "n_tokens"),
        "lang", "doc_id", "n_tokens", ctx = 128)
        .collect().map(p => p.doc_id -> (p.bin_id, p.fill_after)).toMap
      // reference: per group in id order, greedy first-fit-sequential
      val expected = docs.groupBy(_._1).flatMap { case (_, g) =>
        var bin = -1L; var fill = Long.MaxValue / 2
        g.sortBy(_._2).map { case (_, id, n) =>
          if (fill + n > 128) { bin += 1; fill = 0 }
          fill += n
          id -> (bin, fill)
        }
      }.toMap
      out == expected
    })
  }

  test("TopKAggregator equals the sort-based reference on random data") {
    val gen = for {
      n <- Gen.choose(1, 80)
      grp <- Gen.listOfN(n, Gen.choose(0, 3))
      score <- Gen.listOfN(n, Gen.choose(0.0, 10.0))
    } yield List.tabulate(n)(i => (grp(i), score(i), i.toLong))
    check(Prop.forAll(gen) { data =>
      val out = graft.functions.TopK.perGroup(
        data.toDF("g", "s", "id"), Seq("g"), "s", "id", k = 4)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
      val expected = data.groupBy(_._1).flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(4).zipWithIndex
          .map { case ((_, s, id), rank) => (g, rank, s, id) }
      }.toSet
      out == expected
    })
  }
}
