package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables.load
import graft.operators.AsofJoin

/** The native sort-merge as-of exec vs the union+window composition:
  * same contract, so they must agree row-for-row on real data under
  * any partitioning; plus the null semantics and the plan shape. */
class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0), ("B", 60L, 9.9))
    .toDF("sym", "qt", "px")
  private def trades = Seq(
    (1L, "A", 10L), (2L, "A", 25L), (3L, "A", 5L), (4L, "B", 50L),
    (5L, "C", 9L))
    .toDF("trade_id", "sym", "t")

  test("unit semantics match the composed operator's documented cases") {
    val m = AsofJoinNative(trades, quotes, "sym", "sym", "t", "qt", Seq("px"))
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(2.0)) // at-or-before includes equal time
    assert(m(2L).contains(3.0))
    assert(m(3L).isEmpty && m(4L).isEmpty && m(5L).isEmpty)
  }

  test("null left keys/times and null right keys/times never match") {
    val q = Seq((Some("A"), Some(5L), 1.0), (None, Some(6L), 7.0),
      (Some("A"), None, 8.0)).toDF("sym", "qt", "px")
    val t = Seq((1L, Some("A"), Some(9L)), (2L, None, Some(9L)),
      (3L, Some("A"), None)).toDF("trade_id", "sym", "t")
    val m = AsofJoinNative(t, q, "sym", "sym", "t", "qt", Seq("px"))
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(1.0)) // the null-key/time right rows are skipped
    assert(m(2L).isEmpty && m(3L).isEmpty)
  }

  test("parity with the composed AsofJoin on the fixture, several " +
    "partitionings — same rows, same payloads") {
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val versions = load(spark, sf0001, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("vt"), col("asof_orderkey"))
    val composed = AsofJoin(events, versions,
      "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"))
      .select(col("event_id"), col("asof_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    for (parts <- Seq(1, 3, 16)) {
      val native = AsofJoinNative(
        events.repartition(parts), versions.repartition(parts + 1),
        "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"))
        .select(col("event_id"), col("asof_orderkey"))
        .as[(Long, Option[Long])].collect().toMap
      assert(native == composed, s"parts=$parts: diverged")
    }
  }

  test("directions + tolerance unit semantics: forward takes the " +
    "earliest at-or-after, nearest takes the closer side with ties " +
    "backward, tolerance voids distant matches") {
    val q = Seq(("A", 1000000L, 1.0), ("A", 3000000L, 2.0),
      ("B", 9000000L, 5.0)).toDF("sym", "qt", "px")
      .select($"sym", timestamp_micros($"qt").as("qt"), $"px")
    val t = Seq((1L, "A", 1400000L), // back 0.4s vs fwd 1.6s -> 1.0
      (2L, "A", 2200000L),           // back 1.2s vs fwd 0.8s -> 2.0
      (3L, "A", 2000000L),           // equidistant 1s -> backward 1.0
      (4L, "A", 3000000L),           // exact hit -> 2.0 in all modes
      (5L, "B", 1000000L))           // fwd 8s away
      .toDF("trade_id", "sym", "tt")
      .select($"trade_id", $"sym", timestamp_micros($"tt").as("tt"))
    def run(dir: String, tol: Option[Long]) =
      AsofJoinNative(t, q, "sym", "sym", "tt", "qt", Seq("px"),
        direction = dir, toleranceSec = tol)
        .select($"trade_id", $"px").as[(Long, Option[Double])]
        .collect().toMap
    val near = run("nearest", None)
    assert(near(1L).contains(1.0) && near(2L).contains(2.0))
    assert(near(3L).contains(1.0)) // tie -> backward
    assert(near(4L).contains(2.0))
    assert(near(5L).contains(5.0)) // only a forward candidate exists
    val fwd = run("forward", None)
    assert(fwd(1L).contains(2.0) && fwd(2L).contains(2.0))
    assert(fwd(4L).contains(2.0)) // at-or-after includes equal time
    assert(fwd(5L).contains(5.0))
    val nearTol = run("nearest", Some(1L))
    assert(nearTol(1L).contains(1.0) && nearTol(2L).contains(2.0))
    assert(nearTol(5L).isEmpty) // 8s > 1s tolerance
    val fwdTol = run("forward", Some(1L))
    assert(fwdTol(2L).contains(2.0) && fwdTol(5L).isEmpty)
    val backTol = run("backward", Some(1L))
    assert(backTol(1L).contains(1.0) && backTol(2L).isEmpty)
  }

  test("nearest+tolerance parity with the composed AsofJoin on the " +
    "fixture (the join_asof_nearest catalog shape), several " +
    "partitionings") {
    val ev = load(spark, sf0001, "events")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
    val pur = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val composedDf = AsofJoin(err, pur, "user_id", "p_user", "ts", "p_ts",
      Seq("purchase_id"), direction = "nearest",
      toleranceSec = Some(86400L))
    // the composed operator's one-exchange property (both direction
    // windows ride the SAME _k partitioning) — pinned here since the
    // catalog's join_asof_nearest moved to the native exec
    val cp = composedDf.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(_k".r.findAllIn(cp).size == 1,
      cp.take(1500))
    val composed = composedDf
      .select(col("error_id"), col("purchase_id"))
      .as[(Long, Option[Long])].collect().toMap
    for (parts <- Seq(1, 7)) {
      val native = AsofJoinNative(err.repartition(parts),
        pur.repartition(parts + 2), "user_id", "p_user", "ts", "p_ts",
        Seq("purchase_id"), direction = "nearest",
        toleranceSec = Some(86400L))
        .select(col("error_id"), col("purchase_id"))
        .as[(Long, Option[Long])].collect().toMap
      assert(native == composed, s"parts=$parts: diverged")
    }
  }

  test("plan: AsofJoinExec with one exchange per side, no union, no " +
    "window, no nested loop") {
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val versions = load(spark, sf0001, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("asof_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("vt"), col("asof_orderkey"))
    val df = AsofJoinNative(events, versions,
      "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"))
    df.collect()
    // AQE reprints the pre-adaptive plan under "Initial Plan" — audit
    // only the final executed section
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("AsofJoin "), p.take(1200)) // the exec node
    assert(!p.contains("Union") && !p.contains("Window ") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // three exchanges total: the operator's two required-distribution
    // shuffles + the version-collapse groupBy's — nothing else
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 3,
      p.take(1200))
  }

  test("broadcast mode: unit + null semantics match the merge exec") {
    val m = AsofJoinNative(trades, quotes, "sym", "sym", "t", "qt",
      Seq("px"), mode = "broadcast")
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(m(1L).contains(2.0) && m(2L).contains(3.0))
    assert(m(3L).isEmpty && m(4L).isEmpty && m(5L).isEmpty)
    val q = Seq((Some("A"), Some(5L), 1.0), (None, Some(6L), 7.0),
      (Some("A"), None, 8.0)).toDF("sym", "qt", "px")
    val t = Seq((1L, Some("A"), Some(9L)), (2L, None, Some(9L)),
      (3L, Some("A"), None)).toDF("trade_id", "sym", "t")
    val n = AsofJoinNative(t, q, "sym", "sym", "t", "qt", Seq("px"),
      mode = "broadcast")
      .select($"trade_id", $"px").as[(Long, Option[Double])].collect().toMap
    assert(n(1L).contains(1.0))
    assert(n(2L).isEmpty && n(3L).isEmpty)
  }

  test("broadcast mode: duplicate equal right times still match at " +
    "distance 0 in every direction (which equal-payload row wins is " +
    "unspecified in BOTH execs — the duplicates share a payload here)") {
    val q = Seq(("A", 10L, 7.0), ("A", 10L, 7.0), ("A", 10L, 7.0),
      ("A", 20L, 9.0)).toDF("sym", "qt", "px")
    val t = Seq((1L, "A", 10L), (2L, "A", 15L), (3L, "A", 5L))
      .toDF("trade_id", "sym", "t")
    def run(mode: String, dir: String) =
      AsofJoinNative(t, q, "sym", "sym", "t", "qt", Seq("px"),
        direction = dir, mode = mode)
        .select($"trade_id", $"px").as[(Long, Option[Double])]
        .collect().toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val bc = run("broadcast", dir)
      val mg = run("merge", dir)
      assert(bc == mg, s"direction=$dir: broadcast $bc vs merge $mg")
      if (dir != "backward") assert(bc(3L).contains(7.0)) // fwd hit at 10
      if (dir != "forward") assert(bc(1L).contains(7.0))  // exact hit
    }
  }

  test("broadcast mode: parity with the composed AsofJoin on the " +
    "fixture for every direction + tolerance, several partitionings") {
    val ev = load(spark, sf0001, "events")
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts"))
    val pur = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(86400L))) {
      val composed = AsofJoin(err, pur, "user_id", "p_user", "ts", "p_ts",
        Seq("purchase_id"), direction = dir, toleranceSec = tol)
        .select(col("error_id"), col("purchase_id"))
        .as[(Long, Option[Long])].collect().toMap
      for (parts <- Seq(1, 7)) {
        val bc = AsofJoinNative(err.repartition(parts), pur,
          "user_id", "p_user", "ts", "p_ts", Seq("purchase_id"),
          direction = dir, toleranceSec = tol, mode = "broadcast")
          .select(col("error_id"), col("purchase_id"))
          .as[(Long, Option[Long])].collect().toMap
        assert(bc == composed, s"dir=$dir tol=$tol parts=$parts: diverged")
      }
    }
  }

  test("broadcast mode plan: BroadcastAsofJoin with a broadcast " +
    "exchange on the right and ZERO hashpartitioning exchanges — the " +
    "fact side is never shuffled or sorted") {
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    // non-aggregated right side so the only possible exchange is the
    // join's own
    val versions = load(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("vt"), col("o_orderkey").as("asof_orderkey"))
    val df = AsofJoinNative(events, versions,
      "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"),
      mode = "broadcast")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastAsofJoin"), p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      p.take(1200))
    assert(!p.contains("Sort "), p.take(1200))
  }

  test("left-predicate pushdown: a filter on fact columns moves BELOW " +
    "the as-of node (pre-exchange), right-column predicates stay above") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val versions = load(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("vt"), col("o_orderkey").as("asof_orderkey"))
    val joined = AsofJoinNative(events, versions,
      "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"))
    val df = joined.filter(col("user_id") % 10 === 3 &&
      col("asof_orderkey").isNotNull)
    val opt = df.queryExecution.optimizedPlan
    val node = opt.collectFirst { case n: AsofJoinNode => n }.get
    // the left-only predicate landed inside the node's left child
    val leftFilters = node.left.collect { case f: LFilter => f }
    assert(leftFilters.nonEmpty, opt.toString.take(1500))
    assert(leftFilters.exists(_.condition.toString.contains("% 10")),
      leftFilters.map(_.condition).mkString("; "))
    // the right-column predicate did NOT push into either child
    assert(!node.left.collect { case f: LFilter => f }
      .exists(_.condition.toString.contains("asof_orderkey")))
    assert(node.right.collect { case f: LFilter => f }.isEmpty ||
      !node.right.collect { case f: LFilter => f }
        .exists(_.condition.toString.contains("asof_orderkey")))
    // and results match the unpushed formulation
    val expected = joined.collect()
      .filter(r => r.getLong(r.fieldIndex("user_id")) % 10 == 3 &&
        !r.isNullAt(r.fieldIndex("asof_orderkey")))
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("asof_orderkey"))))
      .toSet
    val got = df.select(col("event_id"), col("asof_orderkey"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("column pruning through the node: a wide right side shrinks to " +
    "(payload + key/time) below the join, and the scans narrow") {
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wide = load(spark, sf0001, "orders") // all 5 order columns
      .withColumn("vt", col("o_orderdate").cast("timestamp"))
    val df = AsofJoinNative(events, wide,
      "user_id", "o_custkey", "ts", "vt", Seq("o_orderkey"))
    val node = df.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    val rightCols = node.right.output.map(_.name).toSet
    assert(rightCols == Set("o_custkey", "vt", "o_orderkey"),
      s"right side not pruned: $rightCols")
    // the unused wide columns never reach the scan output either
    assert(!df.queryExecution.executedPlan.toString
      .contains("o_totalprice"))
    assert(df.count() > 0)
  }

  test("left-key predicate TRANSPOSES to the right side (both scans " +
    "prune), results unchanged; rule is fixed-point idempotent") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val versions = load(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("vt"), col("o_orderkey").as("asof_orderkey"))
    val joined = AsofJoinNative(events, versions,
      "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"))
    val df = joined.filter(col("user_id") % 10 === 3)
    val node = df.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    // the transposed copy sits inside the right child, keyed by the
    // RIGHT key attribute
    val rightFilters = node.right.collect { case f: LFilter => f }
    assert(rightFilters.size == 1, // idempotence: ONE filter, not stacked
      df.queryExecution.optimizedPlan.toString.take(1500))
    assert(rightFilters.head.condition.toString.contains("o_custkey"),
      rightFilters.head.condition.toString)
    // equality shape reaches the right SCAN's PushedFilters. (Left-side
    // scan pushdown is pinned logically above and physically by the
    // older left-pushdown test; asserting the left scan's PushedFilters
    // here is order-fragile under the shared test session — an earlier
    // suite's cache can absorb the events scan into an
    // InMemoryRelation, whose embedded scan text shows the ORIGINAL
    // empty PushedFilters: the NOTES persistOnce plan-text gotcha.)
    val dfEq = joined.filter(col("user_id") === 3L)
    dfEq.collect()
    val phys = dfEq.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val pushedSections = "PushedFilters: \\[[^\\]]*\\]".r
      .findAllIn(phys).toSeq
    assert(pushedSections.exists(_.contains("EqualTo(o_custkey,3)")),
      s"expected the TRANSPOSED key predicate on the right scan: " +
        s"$pushedSections")
    val nEq = dfEq.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    assert(nEq.left.collect { case f: LFilter => f }.nonEmpty &&
      nEq.right.collect { case f: LFilter => f }.nonEmpty,
      "both children must carry the predicate logically")
    // value parity with the unpushed formulation
    val expected = joined.collect()
      .filter(r => r.getLong(r.fieldIndex("user_id")) % 10 == 3)
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("asof_orderkey")))
        .map(_.asInstanceOf[Long]))).toSet
    val got = df.select(col("event_id"), col("asof_orderkey"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got == expected)
  }

  test("right-key predicate: null-INTOLERANT shapes copy below (kept " +
    "above); null-TOLERANT shapes must not — the counterexample class") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // rename so the right key survives into the output under its own name
    val q = Seq(("A", 10L, 1.0), ("B", 10L, 2.0), ("B", 20L, 3.0))
      .toDF("qsym", "qt", "px")
    val t = Seq((1L, "A", 25L), (2L, "B", 25L), (3L, "C", 25L))
      .toDF("trade_id", "sym", "t")
    val joined = AsofJoinNative(t, q, "sym", "qsym", "t", "qt",
      Seq("qsym", "px"))
    // null-intolerant: qsym = 'B' -> copied below AND kept above
    val safe = joined.filter(col("qsym") === "B")
    val n1 = safe.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    assert(n1.right.collect { case f: LFilter => f }.exists(
      _.condition.toString.contains("qsym")),
      safe.queryExecution.optimizedPlan.toString.take(1200))
    assert(safe.select($"trade_id", $"px").as[(Long, Double)]
      .collect().toMap == Map(2L -> 3.0))
    // null-TOLERANT: (qsym IS NULL OR qsym = 'A'). Above-semantics keep
    // trade 1 (matched A) and trade 3 (no match -> null qsym). Pushing
    // it below would instead re-match trade 2 to nothing and KEEP it as
    // a null row — silently wrong. The rule must leave the right child
    // clean and preserve above-semantics.
    val unsafe = joined.filter(col("qsym").isNull || col("qsym") === "A")
    val n2 = unsafe.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    assert(n2.right.collect { case f: LFilter => f }.isEmpty,
      unsafe.queryExecution.optimizedPlan.toString.take(1200))
    val rows = unsafe.select($"trade_id", $"px")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> Some(1.0), 3L -> None), rows.toString)
  }

  test("idempotence THROUGH the pruning Project: a kept-above right-key " +
    "predicate on a pruned-right plan lands exactly one copy below") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // wide right side (extra columns) so the rule's own pruning case
    // wraps the pushed Filter in a Project — the fixed-point guard must
    // look through it or it stacks a duplicate Filter every pass
    val q = Seq(("A", 10L, 1.0, "x", 1), ("B", 20L, 3.0, "y", 2))
      .toDF("qsym", "qt", "px", "extra1", "extra2")
    val t = Seq((1L, "A", 25L), (2L, "B", 25L)).toDF("trade_id", "sym", "t")
    val df = AsofJoinNative(t, q, "sym", "qsym", "t", "qt",
      Seq("qsym", "px")).filter(col("qsym") === "B")
    val node = df.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    val rightFilters = node.right.collect { case f: LFilter => f }
    assert(rightFilters.size == 1,
      s"expected exactly ONE pushed copy, got ${rightFilters.size}: " +
        df.queryExecution.optimizedPlan.toString.take(1500))
    assert(df.select($"trade_id", $"px").as[(Long, Double)]
      .collect().toMap == Map(2L -> 3.0))
  }

  test("right-PAYLOAD predicate never pushes: pushing would re-match " +
    "dropped rows to worse candidates (concrete counterexample pinned)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val q = Seq(("A", 10L, 1.0), ("A", 20L, 2.0)).toDF("qsym", "qt", "px")
    val t = Seq((1L, "A", 25L)).toDF("trade_id", "sym", "t")
    val joined = AsofJoinNative(t, q, "sym", "qsym", "t", "qt", Seq("px"))
    val df = joined.filter(col("px") === 1.0)
    val node = df.queryExecution.optimizedPlan
      .collectFirst { case n: AsofJoinNode => n }.get
    assert(node.right.collect { case f: LFilter => f }.isEmpty,
      df.queryExecution.optimizedPlan.toString.take(1200))
    // above-semantics: the trade matched px=2.0, which fails the filter
    // -> zero rows. (A pushed filter would have re-matched it to the
    // older px=1.0 quote and kept it.)
    assert(df.count() == 0)
  }

  test("left-time bounds transpose with direction/tolerance widening; " +
    "the tolerance-less open side does not push") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val events = load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val versions = load(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp")
        .as("vt"), col("o_orderkey").as("asof_orderkey"))
    val cutoff = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def rightTimeFilters(direction: String, tol: Option[Long],
                         cond: org.apache.spark.sql.Column): Seq[String] = {
      val joined = AsofJoinNative(events, versions,
        "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"),
        direction = direction, toleranceSec = tol)
      joined.filter(cond).queryExecution.optimizedPlan
        .collectFirst { case n: AsofJoinNode => n }.get
        .right.collect { case f: LFilter => f.condition.toString }
    }
    // backward upper bound: transposes directly (vt <= U)
    assert(rightTimeFilters("backward", None, col("ts") <= cutoff)
      .exists(_.contains("vt")), "backward upper must push")
    // backward LOWER bound without tolerance: open — must NOT push
    assert(!rightTimeFilters("backward", None, col("ts") >= cutoff)
      .exists(_.contains("vt")), "backward lower w/o tol must not push")
    // backward lower WITH tolerance: pushes widened (vt >= T - tol)
    assert(rightTimeFilters("backward", Some(3600L), col("ts") >= cutoff)
      .exists(_.contains("vt")), "backward lower with tol must push")
    // forward lower bound: transposes directly
    assert(rightTimeFilters("forward", None, col("ts") > cutoff)
      .exists(_.contains("vt")), "forward lower must push")
    // nearest without tolerance: neither side pushes
    assert(!rightTimeFilters("nearest", None, col("ts") <= cutoff)
      .exists(_.contains("vt")), "nearest w/o tol must not push")
    // nearest with tolerance: both bounds push widened
    assert(rightTimeFilters("nearest", Some(3600L),
      col("ts") <= cutoff && col("ts") >= cutoff)
      .count(_.contains("vt")) >= 1, "nearest with tol must push")
    // value parity: pushed backward-upper result equals manual filter
    val joined = AsofJoinNative(events, versions,
      "user_id", "o_custkey", "ts", "vt", Seq("asof_orderkey"))
    val expected = joined.collect()
      .filter(r => !r.isNullAt(r.fieldIndex("ts")) &&
        !r.getAs[java.sql.Timestamp](r.fieldIndex("ts")).after(cutoff))
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("asof_orderkey")))
        .map(_.asInstanceOf[Long]))).toSet
    val got = joined.filter(col("ts") <= cutoff)
      .select(col("event_id"), col("asof_orderkey"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got == expected)
  }

  test("auto mode rides the autoBroadcastJoinThreshold knob: broadcast " +
    "under it, merge when broadcasting is disabled") {
    def planFor(): String = {
      val df = AsofJoinNative(trades, quotes, "sym", "sym", "t", "qt",
        Seq("px"), mode = "auto")
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10485760")
      assert(planFor().contains("BroadcastAsofJoin"))
      spark.conf.set(key, "-1")
      val p = planFor()
      assert(p.contains("AsofJoin ") && !p.contains("BroadcastAsofJoin"), p)
    } finally spark.conf.set(key, saved)
  }
}
