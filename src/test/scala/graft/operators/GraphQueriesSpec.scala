package graft.operators

import graft.SparkSpec

class GraphQueriesSpec extends SparkSpec {

  private def ranks: Map[Long, Double] =
    QueryCatalog.byName("graph_pagerank_prior").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("every document gets a rank ≥ the damping floor; total mass ≤ 1") {
    val r = ranks
    val n = r.size
    assert(n > 0)
    val floor = 0.15 / n
    // -1e-9: the floor itself was rounded to 8 dp in the output
    assert(r.values.forall(_ >= floor - 1e-9), r.values.min)
    // mass leaks (self-loops dropped), never inflates
    assert(r.values.sum <= 1.0 + 1e-6, r.values.sum)
  }

  test("matches a local brute-force PageRank on the same derivation rule") {
    val r = ranks
    val n = r.size.toLong
    val edges = (0L until n).flatMap { src =>
      (1L to 3L).map(j => src -> ((src * 7 + j) % n)).filter(e => e._1 != e._2)
    }
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var local = (0L until n).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => local(src) / outdeg(src) }.sum
      }
      local = (0L until n)
        .map(id => id -> (0.15 / n + 0.85 * contrib.getOrElse(id, 0.0))).toMap
    }
    r.foreach { case (id, got) =>
      assert(math.abs(got - local(id)) < 1e-6, s"doc $id: $got vs ${local(id)}")
    }
  }

  test("5-core peel has converged at the fixed 4 rounds, actually " +
    "peels nodes, and matches a local reference peel") {
    val got = QueryCatalog.byName("graph_kcore_peel").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // local reference: same derivation, peel to a FIXED POINT
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val und = (0L until n).flatMap { src =>
      (1L to 3L).map(j => src -> ((src * 7 + j) % n)).filter(e => e._1 != e._2)
    }.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = und ++ und.map { case (a, b) => (b, a) }
    val all = adj.map(_._1).distinct.toSet
    var alive = all
    var rounds = 0
    var changed = true
    while (changed) {
      val next = adj.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).collect { case (v, es) if es.size >= 5 => v }.toSet
      changed = next != alive
      alive = next
      rounds += 1
    }
    // the fixed 4 query rounds must have reached the fixed point
    assert(rounds <= 5, s"reference needed $rounds rounds — raise the " +
      "query's unrolled round count")
    // NON-VACUOUS: at k=5 the peel must actually remove nodes (the
    // graph's min degree is 4, so k≤4 would peel nothing) yet not
    // annihilate the core
    assert(alive.size < all.size, "peel removed nothing — k too low")
    assert(alive.nonEmpty, "peel annihilated the graph — k too high")
    val refDeg = adj.filter(e => alive(e._1) && alive(e._2))
      .groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    assert(got == refDeg,
      s"missing=${(refDeg.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- refDeg.keySet).take(5)}")
  }
}
