package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables.load

/** Bucketed range joins. A naive non-equi join (`p BETWEEN lo AND hi`,
  * interval overlap) gives Spark no equi keys, so the planner falls
  * back to BroadcastNestedLoopJoin — O(n·m) compares and a broadcast
  * that must hold an entire side. Bucketizing the range domain turns
  * both shapes into plain shuffled equi-joins on `floor(value/width)`:
  * intervals explode to the buckets they touch (span/width + 1 keys),
  * points map to exactly one, and the residual predicate filters
  * within each bucket. Work scales with per-bucket density — the same
  * plan survives 100 TB because it shuffles by bucket like any
  * hash join, never materializing a cross product.
  *
  * Reference telemetry joins (lag/health probes vs time windows) are
  * the SQL shape this accelerates; cf. reference
  * dags/kafka_latency_monitor.py:60-66 (offset windows per poll).
  */
object RangeJoin {

  /** Inner join of `points` rows whose `pCol` lies in
    * `[loCol, hiCol]` of `intervals`. `width` should be at least the
    * typical interval span so each interval lands in ~2 buckets.
    * Column sets of the two inputs must be disjoint. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val ib = intervals.withColumn("_ib",
      explode(sequence(floor(col(loCol) / width), floor(col(hiCol) / width))))
    val pb = points.withColumn("_pb", floor(col(pCol) / width))
    pb.join(ib, pb("_pb") === ib("_ib") &&
        col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("_pb", "_ib")
  }

  /** Inner join of interval pairs that overlap
    * (`lo1 <= hi2 AND lo2 <= hi1`). Each matching pair is emitted
    * exactly ONCE without a distinct pass: a pair can collide in every
    * shared bucket, so we keep only the collision in the bucket of
    * `max(lo1, lo2)` — the first bucket both intervals touch. */
  def intervalOverlap(left: DataFrame, lo1: String, hi1: String,
      right: DataFrame, lo2: String, hi2: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val lb = left.withColumn("_lb",
      explode(sequence(floor(col(lo1) / width), floor(col(hi1) / width))))
    val rb = right.withColumn("_rb",
      explode(sequence(floor(col(lo2) / width), floor(col(hi2) / width))))
    lb.join(rb, lb("_lb") === rb("_rb") &&
        col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        lb("_lb") === floor(greatest(col(lo1), col(lo2)) / width))
      .drop("_lb", "_rb")
  }

  // --- catalog queries -------------------------------------------------

  private def epochDays(c: org.apache.spark.sql.Column) =
    datediff(to_date(c), to_date(lit("1970-01-01"))).cast("long")

  def queries: Seq[Q] = Seq(
    // Lineitems shipped inside an order's active window
    // [o_orderdate, o_orderdate + o_orderkey%30 days]; per-window match
    // counts so the oracle output stays bounded while hash-checking the
    // full join cardinality per key. Oracle is the NAIVE range join.
    Q("join_range_point",
      (s, d) => {
        val pts = load(s, d, "lineitem").filter(col("l_orderkey") < 5000)
          .select(epochDays(col("l_shipdate")).as("d"))
        val iv = load(s, d, "orders").filter(col("o_orderkey") < 5000)
          .select(col("o_orderkey"),
            epochDays(col("o_orderdate")).as("lo"),
            (epochDays(col("o_orderdate")) + col("o_orderkey") % 30).as("hi"))
        pointInInterval(pts, "d", iv, "lo", "hi", width = 32L)
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_shipped"))
      },
      Some("""WITH pts AS (
             |  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d
             |  FROM lineitem WHERE l_orderkey < 5000),
             |iv AS (
             |  SELECT o_orderkey,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + o_orderkey % 30 AS hi
             |  FROM orders WHERE o_orderkey < 5000)
             |SELECT o_orderkey, count(*) AS n_shipped
             |FROM pts p JOIN iv i ON p.d >= i.lo AND p.d <= i.hi
             |GROUP BY o_orderkey""".stripMargin),
      "bucketed point-in-interval range join vs naive BETWEEN oracle"),

    // Which order windows overlap: low-key windows vs high-key windows,
    // counted per left window. Exactly-once emission via the
    // first-shared-bucket trick (no distinct shuffle).
    Q("join_range_overlap",
      (s, d) => {
        def win(lo: Long, hi: Long, kCol: String) =
          load(s, d, "orders")
            .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
            .select(col("o_orderkey").as(kCol),
              epochDays(col("o_orderdate")).as(s"lo_$kCol"),
              (epochDays(col("o_orderdate")) + col("o_orderkey") % 30).as(s"hi_$kCol"))
        val a = win(0L, 1000L, "ka")
        val b = win(1000L, 2000L, "kb")
        intervalOverlap(a, "lo_ka", "hi_ka", b, "lo_kb", "hi_kb", width = 32L)
          .groupBy(col("ka")).agg(count(lit(1)).as("n_overlap"))
      },
      Some("""WITH w AS (
             |  SELECT o_orderkey AS k,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo,
             |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + o_orderkey % 30 AS hi
             |  FROM orders)
             |SELECT a.k AS ka, count(*) AS n_overlap
             |FROM w a JOIN w b
             |  ON a.lo <= b.hi AND b.lo <= a.hi
             |WHERE a.k < 1000 AND b.k >= 1000 AND b.k < 2000
             |GROUP BY a.k""".stripMargin),
      "bucketed interval-overlap join, exactly-once per pair, vs naive oracle"),

    // 2-D neighbor join — the spatial variant of the same bucketing
    // idea: "all pairs of points within distance ε" is a cross join to
    // a naive planner, but snapping points to an ε-sized grid turns it
    // into an equi-join on the cell key. Each point probes its 3×3
    // neighborhood (a 9-row explode on the LEFT side only); any pair
    // closer than ε must share or neighbor a cell (cell width = ε), so
    // recall is exact, and each pair surfaces exactly once because the
    // right side keeps its single home cell and `a < b` orients the
    // pair. Candidates ∝ 9 · n · (points per cell) — per-cell density,
    // never n². Dense cells are the spatial analogue of join skew:
    // at real scale a hot cell gets salted or subdivided (quadtree
    // refinement), same cure as join_salted_skew. Coordinates are
    // derived deterministically from md5(c_custkey) (testdata carries
    // no geo columns; both engines parse the same hex prefix), cells
    // from INTEGER division of the 0.1-granular coordinate — no float
    // floor at a cell boundary. Distances are single-op IEEE chains on
    // exact tenths → hash-match unrounded.
    Q("join_grid_neighbors",
      (s, d) => {
        import graft.core.Caching.persistOnce
        def axis(salt: String) =
          conv(substring(md5(concat(col("c_custkey").cast("string"),
            lit(salt))), 1, 8), 16, 10).cast("long") % 1000
        val pts = persistOnce(load(s, d, "customer")
          .select(col("c_custkey").as("id"), axis(":gx").as("xi"),
            axis(":gy").as("yi"))
          .select(col("id"),
            (col("xi").cast("double") / 10.0).as("x"),
            (col("yi").cast("double") / 10.0).as("y"),
            (col("xi") / 20).cast("long").as("cx"),
            (col("yi") / 20).cast("long").as("cy")))
        val probe = pts
          .select(col("id"), col("x"), col("y"), col("cx"), col("cy"),
            explode(array(lit(-1L), lit(0L), lit(1L))).as("ox"))
          .select(col("id"), col("x"), col("y"),
            (col("cx") + col("ox")).as("pcx"), col("cy"),
            explode(array(lit(-1L), lit(0L), lit(1L))).as("oy"))
          .select(col("id").as("a"), col("x").as("ax"), col("y").as("ay"),
            col("pcx"), (col("cy") + col("oy")).as("pcy"))
        val home = pts.select(col("id").as("b"), col("x").as("bx"),
          col("y").as("by"), col("cx"), col("cy"))
        probe.join(home,
            col("pcx") === col("cx") && col("pcy") === col("cy") &&
              col("a") < col("b"))
          .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
            (col("ay") - col("by")) * (col("ay") - col("by")) < 4.0)
          .select(col("a"), col("b"),
            sqrt((col("ax") - col("bx")) * (col("ax") - col("bx")) +
              (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist"))
      },
      Some("""WITH h AS (
             |  SELECT c_custkey AS id,
             |    CAST(list_reduce(list_transform(range(1, 9),
             |      i -> CAST(strpos('0123456789abcdef', substr(
             |        md5(CAST(c_custkey AS VARCHAR) || ':gx'), i, 1)) - 1
             |        AS DOUBLE)), (a, x) -> a * 16 + x) AS BIGINT) % 1000 AS xi,
             |    CAST(list_reduce(list_transform(range(1, 9),
             |      i -> CAST(strpos('0123456789abcdef', substr(
             |        md5(CAST(c_custkey AS VARCHAR) || ':gy'), i, 1)) - 1
             |        AS DOUBLE)), (a, x) -> a * 16 + x) AS BIGINT) % 1000 AS yi
             |  FROM customer),
             |p AS (
             |  SELECT id, CAST(xi AS DOUBLE) / 10.0 AS x,
             |    CAST(yi AS DOUBLE) / 10.0 AS y
             |  FROM h)
             |SELECT a.id AS a, b.id AS b,
             |  sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
             |    AS dist
             |FROM p a JOIN p b ON a.id < b.id
             |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             |  < 4.0""".stripMargin),
      "ε-grid neighbor join: 3×3 cell probe equi-join vs the naive " +
        "all-pairs oracle — spatial ball queries without a cross product"),

    // ALLEN'S INTERVAL ALGEBRA histogram — classify every intersecting
    // or abutting window pair into its temporal relation (equals /
    // starts / finishes / during / contains / meets / overlaps + the
    // four inverses). The relation CASE runs inside the SAME bucketed
    // overlap join as join_range_overlap (before/after — the unbounded
    // disjoint relations — are excluded by construction), so the
    // classification adds zero plan cost over the pair generation; the
    // histogram is an 11-group rollup. The CASE order is identical in
    // both engines, so tie rows classify identically.
    Q("window_allen_relations",
      (s, d) => {
        def win(lo: Long, hi: Long, kCol: String) =
          load(s, d, "orders")
            .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
            .select(col("o_orderkey").as(kCol),
              epochDays(col("o_orderdate")).as(s"lo_$kCol"),
              (epochDays(col("o_orderdate")) + col("o_orderkey") % 30)
                .as(s"hi_$kCol"))
        val a = win(0L, 1000L, "ka")
        val b = win(1000L, 2000L, "kb")
        val rel = when(col("lo_ka") === col("lo_kb") &&
            col("hi_ka") === col("hi_kb"), "equals")
          .when(col("hi_ka") === col("lo_kb"), "meets")
          .when(col("hi_kb") === col("lo_ka"), "met_by")
          .when(col("lo_ka") === col("lo_kb") &&
            col("hi_ka") < col("hi_kb"), "starts")
          .when(col("lo_ka") === col("lo_kb"), "started_by")
          .when(col("hi_ka") === col("hi_kb") &&
            col("lo_ka") > col("lo_kb"), "finishes")
          .when(col("hi_ka") === col("hi_kb"), "finished_by")
          .when(col("lo_ka") > col("lo_kb") &&
            col("hi_ka") < col("hi_kb"), "during")
          .when(col("lo_ka") < col("lo_kb") &&
            col("hi_ka") > col("hi_kb"), "contains")
          .when(col("lo_ka") < col("lo_kb"), "overlaps")
          .otherwise("overlapped_by")
        intervalOverlap(a, "lo_ka", "hi_ka", b, "lo_kb", "hi_kb",
            width = 32L)
          .groupBy(rel.as("relation"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH w AS (
             |  SELECT o_orderkey AS k,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS lo,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) + o_orderkey % 30 AS hi
             |  FROM orders),
             |pairs AS (
             |  SELECT a.lo AS lo_ka, a.hi AS hi_ka,
             |         b.lo AS lo_kb, b.hi AS hi_kb
             |  FROM w a JOIN w b ON a.lo <= b.hi AND b.lo <= a.hi
             |  WHERE a.k < 1000 AND b.k >= 1000 AND b.k < 2000)
             |SELECT CASE
             |    WHEN lo_ka = lo_kb AND hi_ka = hi_kb THEN 'equals'
             |    WHEN hi_ka = lo_kb THEN 'meets'
             |    WHEN hi_kb = lo_ka THEN 'met_by'
             |    WHEN lo_ka = lo_kb AND hi_ka < hi_kb THEN 'starts'
             |    WHEN lo_ka = lo_kb THEN 'started_by'
             |    WHEN hi_ka = hi_kb AND lo_ka > lo_kb THEN 'finishes'
             |    WHEN hi_ka = hi_kb THEN 'finished_by'
             |    WHEN lo_ka > lo_kb AND hi_ka < hi_kb THEN 'during'
             |    WHEN lo_ka < lo_kb AND hi_ka > hi_kb THEN 'contains'
             |    WHEN lo_ka < lo_kb THEN 'overlaps'
             |    ELSE 'overlapped_by' END AS relation,
             |  count(*) AS n
             |FROM pairs GROUP BY 1""".stripMargin),
      "Allen interval-relation histogram over the bucketed overlap " +
        "join — 11 temporal relations classified in the pair pass, " +
        "an 11-group rollup, zero cost over pair generation"),

    // CIDR longest-prefix match as an EQUI-join — the classic trick
    // that turns routing-table/geo-IP lookup into a hash join: explode
    // each address by the DISTINCT prefix lengths present in the rule
    // set (5 here), truncate, equi-join on (len, prefix), then argmax
    // on len per event. Candidates ∝ #lengths × events, never
    // events × rules; the rule side broadcasts. Deterministic IPs
    // derive from user_id (top byte = user group, low 24 bits Knuth
    // hash) and the 25 nation rules form 5 NESTED chains per group
    // (/8 → /24 on the group anchor's address), so the
    // longest-prefix disambiguation path is guaranteed non-degenerate
    // at every SF: anchors match all 5 lengths and must resolve /24.
    Q("join_cidr_lookup",
      (s, d) => {
        val ev = load(s, d, "events")
          .select(col("event_id"), col("user_id").cast("long").as("u"))
          .withColumn("ip", (col("u") % 5 + 10) * lit(16777216L) +
            (col("u") * lit(2654435761L)) % lit(16777216L))
        val rules = load(s, d, "nation")
          .select(col("n_nationkey").cast("long").as("nk"))
          .select(col("nk"), (col("nk") % 5).as("a"),
            (lit(8) + lit(4) * expr("CAST(nk DIV 5 AS INT)"))
              .cast("int").as("len"))
          .withColumn("anchor_ip", (col("a") + 10) * lit(16777216L) +
            (col("a") * lit(2654435761L)) % lit(16777216L))
          .groupBy(col("len"),
            expr("shiftright(anchor_ip, 32 - len)").as("prefix"))
          .agg(min(col("nk")).as("rule_nation"))
        val cand = ev
          .withColumn("len",
            explode(array(Seq(8, 12, 16, 20, 24).map(lit): _*)))
          .withColumn("prefix", expr("shiftright(ip, 32 - len)"))
          .join(broadcast(rules), Seq("len", "prefix"))
        cand.groupBy(col("event_id"))
          .agg(max_by(col("rule_nation"), col("len")).as("rule_nation"),
            max(col("len")).as("len"), first(col("u")).as("u"))
          .groupBy(col("rule_nation"), col("len"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("u")).as("n_users"))
      },
      Some("""WITH ips AS (
             |  SELECT event_id, CAST(user_id AS BIGINT) AS u,
             |    (CAST(user_id AS BIGINT) % 5 + 10) * 16777216 +
             |      (CAST(user_id AS BIGINT) * 2654435761) % 16777216
             |      AS ip
             |  FROM events),
             |rules AS (
             |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
             |    CAST(n_nationkey AS BIGINT) % 5 AS a,
             |    CAST(8 + 4 * (CAST(n_nationkey AS BIGINT) // 5)
             |      AS INTEGER) AS len
             |  FROM nation),
             |rp AS (
             |  SELECT len,
             |    ((a + 10) * 16777216 + (a * 2654435761) % 16777216)
             |      >> (32 - len) AS prefix,
             |    CAST(min(nk) AS BIGINT) AS rule_nation
             |  FROM rules GROUP BY 1, 2),
             |cand AS (
             |  SELECT i.event_id, i.u, r.rule_nation, r.len
             |  FROM ips i JOIN rp r ON (i.ip >> (32 - r.len)) = r.prefix),
             |lpm AS (
             |  SELECT event_id, arg_max(rule_nation, len) AS rule_nation,
             |    max(len) AS len, min(u) AS u
             |  FROM cand GROUP BY 1)
             |SELECT rule_nation, len, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT u) AS BIGINT) AS n_users
             |FROM lpm GROUP BY 1, 2""".stripMargin),
      "CIDR longest-prefix match via length-explode + equi-join on " +
        "(len, prefix): hash-join LPM with broadcast rules, argmax on " +
        "length — nested planted chains prove the /24-beats-/8 path"))
}
