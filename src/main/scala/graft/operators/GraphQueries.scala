package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Caching.persistOnce
import graft.core.Tables.load

/** Link-graph analysis for corpus curation: PageRank as a document
  * quality prior — the weighting a web-crawl training-data pipeline
  * derives from the link structure before sampling (the reference has
  * no graph surface; this is part of the 100 TB extension inventory,
  * SURVEY §2.10).
  *
  * The testdata carries no link table, so the edge set is DERIVED
  * deterministically from the dense doc_id space (three out-links per
  * document at (7·id + j) mod N, self-loops dropped) — the same
  * edge-derivation rule runs in the DuckDB oracle, so the whole
  * five-iteration computation is value-checked end to end.
  *
  * Scale shape (what survives 100 TB):
  *   - One shuffle per iteration, ∝ |edges|: ranks equi-join the
  *     out-degree-annotated edge list on src, contributions hash-agg
  *     by dst with map-side combine. No driver-side state — ranks stay
  *     a DataFrame throughout.
  *   - The node list and edge list are built once and reused across
  *     iterations (persistOnce); at real scale both would be bucketed
  *     by key so every iteration's join is co-partitioned, and each
  *     iteration's output would be checkpointed to truncate lineage.
  *   - Mass lost to dangling/self-link structure is NOT redistributed
  *     (ranks sum < 1): redistribution needs a per-iteration global
  *     reduce of the dangling mass — one extra 1-row broadcast if a
  *     use case needs the stochastic normalization.
  *   - Doubles are summed in engine-dependent order; ranks are rounded
  *     only at the final output (8 dp, ~7 orders of magnitude above
  *     the accumulated ulp noise), never between iterations.
  */
object GraphQueries {

  import org.apache.spark.sql.{DataFrame, SparkSession}

  private val Iterations = 5

  /** The ONE copy of the deterministic link-graph derivation (three
    * out-links per document at (7·id + j) mod N, self-loops dropped)
    * shared by every graph query below; [[edgeSqlPrefix]] is its
    * oracle-side mirror — change the rule in these two places only. */
  private def derivedDir(s: SparkSession, d: String): DataFrame = {
    val nRow = load(s, d, "documents").agg(count(lit(1)).as("nn"))
    load(s, d, "documents")
      .select(col("doc_id")).crossJoin(broadcast(nRow))
      .select(col("doc_id").as("src"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("j"), col("nn"))
      .select(col("src"),
        ((col("src") * 7 + col("j")) % col("nn")).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  private def derivedUnd(s: SparkSession, d: String): DataFrame =
    derivedDir(s, d)
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()

  /** Oracle CTE prefix defining nn / nodes / dir / und — identical
    * text in every graph oracle (an unused CTE is lazy in DuckDB). */
  private val edgeSqlPrefix: String =
    """nn AS (SELECT count(*) AS n FROM documents),
      |nodes AS (SELECT doc_id FROM documents),
      |dir AS (SELECT doc_id AS src, (doc_id * 7 + j) % n AS dst
      |        FROM nodes CROSS JOIN nn
      |        CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) js
      |        WHERE doc_id <> (doc_id * 7 + j) % n),
      |und AS (SELECT DISTINCT least(src, dst) AS a,
      |               greatest(src, dst) AS b FROM dir)""".stripMargin

  /** The shared edge-derivation rule as SQL CTEs (Spark side mirrors
    * it in Column algebra). */
  private def oracleSql: String = {
    val iters = (1 to Iterations).map { i =>
      s"""r$i AS (
         |  SELECT nodes.doc_id AS id, 0.15 / n + 0.85 * coalesce(t.c, 0.0) AS r
         |  FROM nodes CROSS JOIN nn LEFT JOIN (
         |    SELECT dst, sum(r / od) AS c
         |    FROM r${i - 1} JOIN ed ON id = src GROUP BY 1) t
         |  ON nodes.doc_id = t.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |nodes AS (SELECT doc_id FROM documents),
       |edges AS (
       |  SELECT doc_id AS src, (doc_id * 7 + j) % n AS dst
       |  FROM nodes CROSS JOIN nn
       |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) js
       |  WHERE doc_id <> (doc_id * 7 + j) % n),
       |ed AS (SELECT src, dst,
       |         CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS od
       |       FROM edges),
       |r0 AS (SELECT doc_id AS id, 1.0 / n AS r FROM nodes CROSS JOIN nn),
       |$iters
       |SELECT id AS doc_id, round(r, 8) AS rank8 FROM r$Iterations""".stripMargin
  }

  def queries: Seq[Q] = hitsQueries ++ Seq(
    Q("graph_pagerank_prior",
      (s, d) => {
        val nRow = load(s, d, "documents").agg(count(lit(1)).as("nn"))
        val nodes = persistOnce(load(s, d, "documents")
          .select(col("doc_id")).crossJoin(broadcast(nRow)))
        val edges = nodes
          .select(col("doc_id").as("src"),
            explode(array(lit(1L), lit(2L), lit(3L))).as("j"), col("nn"))
          .select(col("src"),
            ((col("src") * 7 + col("j")) % col("nn")).as("dst"))
          .filter(col("src") =!= col("dst"))
        val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
        val ed = persistOnce(edges.join(outdeg, "src"))

        var ranks = nodes
          .select(col("doc_id").as("id"), (lit(1.0) / col("nn")).as("r"))
        for (_ <- 1 to Iterations) {
          val contrib = ranks.join(ed, col("id") === col("src"))
            .groupBy(col("dst")).agg(sum(col("r") / col("od")).as("c"))
          ranks = nodes
            .join(contrib, col("doc_id") === col("dst"), "left")
            .select(col("doc_id").as("id"),
              (lit(0.15) / col("nn") +
                lit(0.85) * coalesce(col("c"), lit(0.0))).as("r"))
        }
        ranks.select(col("id").as("doc_id"), round(col("r"), 8).as("rank8"))
      },
      Some(oracleSql),
      "PageRank quality prior over a derived link graph — one " +
        "edge-keyed shuffle per iteration, map-side-combined dst " +
        "aggregation, no driver-side state; oracle replays all five " +
        "iterations"),

    // Triangle count + global clustering coefficient via DEGREE-ORDERED
    // orientation (the Suri–Vassilvitskii MapReduce shape): every
    // undirected edge is oriented from its (degree, id)-smaller
    // endpoint to the larger, so each triangle is generated exactly
    // once — as the wedge rooted at its lowest-ordered vertex — and a
    // node's OUT-neighborhood is bounded by O(√m) on any graph (hubs
    // sit on the RECEIVING side, so the classic curse-of-the-last-
    // reducer hub² wedge blowup is structurally impossible). Wedge
    // generation is one self-equi-join of the oriented list (x.v =
    // y.u); closing is one more equi-join on the (u, w) pair key;
    // candidates ∝ Σ out-deg² ≤ m·O(√m), never n². The same derived
    // edge rule as graph_pagerank_prior keeps the oracle exact: all
    // outputs are integer counts except the clustering coefficient,
    // a single integer-ratio division (identical IEEE op both
    // engines, left unrounded per the catalog determinism contract).
    Q("graph_triangle_count",
      (s, d) => {
        val nRow = load(s, d, "documents").agg(count(lit(1)).as("nn"))
        val und = persistOnce(derivedUnd(s, d))
        val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("dg"))
        val lower = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val o = persistOnce(und
          .join(deg.select(col("v").as("a"), col("dg").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("dg").as("db")), "b")
          .select(when(lower, col("a")).otherwise(col("b")).as("u"),
            when(lower, col("b")).otherwise(col("a")).as("v")))
        val wedge = o.as("x").join(o.as("y"), col("x.v") === col("y.u"))
          .select(col("x.u").as("u"), col("y.v").as("w"))
        val tri = wedge
          .join(o.select(col("u"), col("v").as("w")), Seq("u", "w"),
            "left_semi")
          .agg(count(lit(1)).as("n_triangles"))
        nRow.select(col("nn").as("n_nodes"))
          .crossJoin(und.agg(count(lit(1)).as("n_edges")))
          .crossJoin(tri)
          .crossJoin(deg.agg(sum(col("dg") * (col("dg") - 1)).as("w2")))
          .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
            ((lit(6L) * col("n_triangles")).cast("double") /
              col("w2").cast("double")).as("clustering"))
      },
      Some(s"""WITH $edgeSqlPrefix,
             |deg AS (SELECT v, count(*) AS dg FROM (
             |          SELECT a AS v FROM und
             |          UNION ALL SELECT b AS v FROM und) e GROUP BY 1),
             |o AS (SELECT CASE WHEN da.dg < db.dg
             |                    OR (da.dg = db.dg AND a < b)
             |                  THEN a ELSE b END AS u,
             |             CASE WHEN da.dg < db.dg
             |                    OR (da.dg = db.dg AND a < b)
             |                  THEN b ELSE a END AS v
             |      FROM und JOIN deg da ON und.a = da.v
             |               JOIN deg db ON und.b = db.v),
             |wedge AS (SELECT x.u AS u, y.v AS w
             |          FROM o x JOIN o y ON x.v = y.u),
             |tri AS (SELECT count(*) AS t FROM wedge
             |        WHERE EXISTS (SELECT 1 FROM o
             |                      WHERE o.u = wedge.u AND o.v = wedge.w)),
             |w2 AS (SELECT sum(dg * (dg - 1)) AS w2 FROM deg)
             |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
             |       (SELECT count(*) FROM und) AS n_edges,
             |       t AS n_triangles,
             |       CAST(6 * t AS DOUBLE) / CAST(w2 AS DOUBLE) AS clustering
             |FROM tri, w2""".stripMargin),
      "degree-ordered triangle count + clustering coefficient: " +
        "orientation bounds wedge fan-out by O(√m) per node, all " +
        "stages equi-joins — counts exact, full pipeline value-checked"),

    // BFS link-distance layers from a seed document (4 hops): the
    // "crawl frontier depth" / seed-proximity signal a link-curated
    // corpus ranks by. Classic iterative-frontier BFS as data-parallel
    // joins: each round expands ONLY the newest layer (min-d == i−1)
    // through one src-keyed equi-join, then a min-distance hash-agg
    // folds rediscoveries — per-round shuffle ∝ frontier out-edges,
    // never nodes × edges, and rounds are bounded by the hop cap
    // exactly like dedup_cluster_election bounds by diameter. Each
    // round's frontier is persisted (it feeds both the filter and the
    // union — without the persist the lineage re-derives 2^rounds
    // times). The DuckDB oracle replays the walk as a recursive CTE
    // (UNION set-semantics bounds it at nodes × hops pairs) + min
    // rollup, so every (node, dist) value is hash-checked.
    Q("graph_bfs_layers",
      (s, d) => {
        val edges = persistOnce(derivedDir(s, d))
        var dist = load(s, d, "documents").filter(col("doc_id") === 0)
          .select(col("doc_id").as("node"), lit(0).as("d"))
        for (i <- 1 to 4) {
          val cur = persistOnce(dist)
          val nxt = cur.filter(col("d") === i - 1)
            .join(edges, col("node") === col("src"))
            .select(col("dst").as("node"), lit(i).as("d"))
          dist = cur.unionByName(nxt)
            .groupBy("node").agg(min(col("d")).as("d"))
        }
        dist.select(col("node").as("doc_id"), col("d").as("dist"))
      },
      Some(s"""WITH RECURSIVE $edgeSqlPrefix,
             |walk AS (
             |  SELECT doc_id AS node, 0 AS d FROM nodes WHERE doc_id = 0
             |  UNION
             |  SELECT dst, d + 1 FROM walk JOIN dir ON node = src
             |  WHERE d < 4)
             |SELECT node AS doc_id, min(d) AS dist
             |FROM walk GROUP BY 1""".stripMargin),
      "frontier BFS to 4 hops: one src-keyed equi-join + min-distance " +
        "rollup per round, shuffle ∝ frontier edges — layer distances " +
        "hash-checked against a recursive-CTE walk"),

    // 5-core peeling (fixed-round): the density filter link-graph
    // curation runs before PageRank — nodes that can't sustain 5
    // neighbors INSIDE the surviving subgraph are peeled, and peeling
    // cascades (removing a node can strand its neighbors). k = 5
    // because the derived graph's MINIMUM degree is 4: a k ≤ 4 peel
    // would remove nothing and the whole cascade would be dead code
    // under both the oracle and the spec (found by review — the
    // planted-ground-truth rule applies to graph shape too). Each
    // round is two alive-membership equi-joins over the symmetric
    // adjacency + a degree rollup — the dedup_cluster_election cost
    // class, with the alive set only shrinking (broadcastable as it
    // converges). Rounds are FIXED at 4 and the oracle unrolls the
    // identical four rounds as CTEs (recursive SQL can't aggregate in
    // the recursive term), so the output is exact whether or not the
    // cascade has fully converged — on this graph it has (the fixed
    // point is reached and non-trivial, asserted in GraphQueriesSpec).
    Q("graph_kcore_peel",
      (s, d) => {
        val und = derivedUnd(s, d)
        val adj = persistOnce(und
          .select(col("a").as("src"), col("b").as("dst"))
          .unionByName(und.select(col("b").as("src"), col("a").as("dst"))))
        var alive = adj.select(col("src").as("v")).distinct()
        for (_ <- 1 to 4) {
          val av = persistOnce(alive)
          alive = adj
            .join(av.select(col("v").as("src")), "src")
            .join(av.select(col("v").as("dst")), "dst")
            .groupBy(col("src")).agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= 5).select(col("src").as("v"))
        }
        val fin = persistOnce(alive)
        adj.join(fin.select(col("v").as("src")), "src")
          .join(fin.select(col("v").as("dst")), "dst")
          .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
          .select(col("src").as("doc_id"), col("core_deg"))
      },
      Some {
        val rounds = (1 to 4).map { i =>
          s"""r$i AS (
             |  SELECT src AS v FROM adj
             |  JOIN r${i - 1} x ON adj.src = x.v
             |  JOIN r${i - 1} y ON adj.dst = y.v
             |  GROUP BY src HAVING count(*) >= 5)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgeSqlPrefix,
           |adj AS (SELECT a AS src, b AS dst FROM und
           |        UNION ALL SELECT b, a FROM und),
           |r0 AS (SELECT a AS v FROM und UNION SELECT b FROM und),
           |$rounds
           |SELECT adj.src AS doc_id, count(*) AS core_deg
           |FROM adj JOIN r4 x ON adj.src = x.v
           |         JOIN r4 y ON adj.dst = y.v
           |GROUP BY 1""".stripMargin
      },
      "fixed-round 5-core peel: two membership equi-joins + a degree " +
        "rollup per round over a shrinking alive set — core degrees " +
        "hash-checked against four unrolled oracle rounds"),

    // Degree assortativity (Newman's r): do high-degree nodes link to
    // high-degree nodes? Positive r = hub-to-hub cores (social
    // graphs), negative = hub-and-spoke (the web) — it decides whether
    // hub-biased sampling starves the periphery. Over the SYMMETRIC
    // edge list the x/y marginals are identical, so Pearson collapses
    // to (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²) — a ratio of two exact
    // BIGINT moments, one double division, hash-checked UNROUNDED.
    // Two degree-annotation equi-joins + a 1-row moment aggregate;
    // the only shuffles are the degree rollup and the joins.
    Q("graph_assortativity",
      (s, d) => {
        val und = derivedUnd(s, d)
        // adj feeds the degree rollup AND the twice-annotated moment
        // pass; deg joins in twice (dx, dy) — persist both
        val adj = persistOnce(und
          .select(col("a").as("src"), col("b").as("dst"))
          .unionByName(und.select(col("b").as("src"), col("a").as("dst"))))
        val deg = persistOnce(adj.groupBy(col("src").as("v"))
          .agg(count(lit(1)).as("dg")))
        adj
          .join(deg.select(col("v").as("src"), col("dg").as("dx")), "src")
          .join(deg.select(col("v").as("dst"), col("dg").as("dy")), "dst")
          .agg(count(lit(1)).as("m"), sum(col("dx") * col("dy")).as("sxy"),
            sum(col("dx")).as("sx"), sum(col("dx") * col("dx")).as("sx2"))
          .select(col("m"),
            ((col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
              (col("m") * col("sx2") - col("sx") * col("sx")).cast("double"))
              .as("assortativity"))
      },
      Some(s"""WITH $edgeSqlPrefix,
             |adj AS (SELECT a AS src, b AS dst FROM und
             |        UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT src AS v, count(*) AS dg FROM adj GROUP BY 1),
             |mo AS (SELECT count(*) AS m,
             |         CAST(sum(dx.dg * dy.dg) AS BIGINT) AS sxy,
             |         CAST(sum(dx.dg) AS BIGINT) AS sx,
             |         CAST(sum(dx.dg * dx.dg) AS BIGINT) AS sx2
             |       FROM adj JOIN deg dx ON adj.src = dx.v
             |                JOIN deg dy ON adj.dst = dy.v)
             |SELECT m, CAST(m * sxy - sx * sx AS DOUBLE)
             |  / CAST(m * sx2 - sx * sx AS DOUBLE) AS assortativity
             |FROM mo""".stripMargin),
      "Newman degree assortativity from exact integer moments — the " +
        "symmetric-marginal collapse makes it one unrounded division"),

    // Link prediction by neighborhood overlap: score non-adjacent node
    // pairs by common-neighbor count and Adamic-Adar (Σ 1/ln deg(w)
    // over shared neighbors w) — the "which documents should cite each
    // other" / recommendation prior. Shape that survives 100 TB: the
    // candidate set is generated by the WEDGE equi-join (pairs sharing
    // a neighbor, ∝ Σ deg² — never all pairs), existing edges drop out
    // via an equi-keyed anti join, and scoring is one hash aggregate.
    // A wedge center always has degree ≥ 2, so ln(deg) never hits
    // ln(1)=0 and the AA terms are finite; per-term 1/ln is bitwise
    // cross-engine, the order-unstable sum is rounded 6 dp.
    Q("graph_link_prediction",
      (s, d) => {
        val und = persistOnce(derivedUnd(s, d))
        val nb = persistOnce(und
          .select(col("a").as("u"), col("b").as("v"))
          .unionByName(und.select(col("b").as("u"), col("a").as("v"))))
        val deg = nb.groupBy(col("u")).agg(count(lit(1)).as("dg"))
          .select(col("u").as("w"), col("dg"))
        val wedges = nb.as("n1").join(nb.as("n2"),
            col("n1.v") === col("n2.v") && col("n1.u") < col("n2.u"))
          .select(col("n1.u").as("x"), col("n2.u").as("y"),
            col("n1.v").as("w"))
        val cand = wedges.join(und,
          wedges("x") === und("a") && wedges("y") === und("b"), "left_anti")
        cand.join(deg, "w")
          .groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("cn"),
            round(sum(lit(1.0) / log(col("dg").cast("double"))), 6).as("aa"))
          .filter(col("cn") >= 2)
      },
      Some(s"""WITH $edgeSqlPrefix,
             |nb AS (SELECT a AS u, b AS v FROM und
             |       UNION ALL SELECT b, a FROM und),
             |deg AS (SELECT u AS w, count(*) AS dg FROM nb GROUP BY 1),
             |wedge AS (
             |  SELECT n1.u AS x, n2.u AS y, n1.v AS w
             |  FROM nb n1 JOIN nb n2 ON n1.v = n2.v AND n1.u < n2.u),
             |cand AS (
             |  SELECT x, y, w FROM wedge
             |  WHERE NOT EXISTS (SELECT 1 FROM und WHERE a = x AND b = y))
             |SELECT x, y, CAST(count(*) AS BIGINT) AS cn,
             |  round(sum(1.0 / ln(CAST(dg AS DOUBLE))), 6) AS aa
             |FROM cand JOIN deg USING (w)
             |GROUP BY x, y
             |HAVING count(*) >= 2""".stripMargin),
      "link prediction: common-neighbor + Adamic-Adar scores over " +
        "wedge-join candidates — never all pairs, edges drop via anti join"),

    // Label propagation communities (Raghavan et al. 2007), SYNCHRONOUS
    // variant with a total tie order so the fixpoint is deterministic:
    // every node adopts its neighborhood's most frequent label (count
    // desc, label asc) each round, 3 rounds. The argmax is ONE packed-
    // long min — (2³¹−count)·2³¹+label — so each round is exactly two
    // hash aggregates and one edge-keyed equi-join (the same
    // per-iteration shuffle shape as PageRank; struct-ordered min_by
    // would demote to SortAggregate). Labels are doc_ids (< 2³¹ by the
    // fixture's dense id space); isolated nodes keep their label via
    // the left join. The oracle replays all three rounds including the
    // packed arithmetic, so the full fixpoint trajectory value-checks.
    Q("graph_label_propagation",
      (s, d) => {
        val und = persistOnce(derivedUnd(s, d))
        val nb = persistOnce(und
          .select(col("a").as("u"), col("b").as("v"))
          .unionByName(und.select(col("b").as("u"), col("a").as("v"))))
        val two31 = 2147483648L
        var labels = load(s, d, "documents")
          .select(col("doc_id").as("node"), col("doc_id").as("label"))
        for (_ <- 1 to 3) {
          val chosen = nb
            .join(labels.select(col("node").as("v"), col("label")), "v")
            .groupBy(col("u"), col("label"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("u"))
            .agg(min((lit(two31) - col("c")) * two31 + col("label"))
              .as("pk"))
            .select(col("u"), (col("pk") % two31).as("nl"))
          labels = labels.join(chosen, col("node") === col("u"), "left")
            .select(col("node"),
              coalesce(col("nl"), col("label")).as("label"))
        }
        labels.select(col("node").as("doc_id"), col("label").as("community"))
      },
      Some {
        val iters = (1 to 3).map { i =>
          s"""l$i AS (
             |  SELECT p.node, coalesce(ch.nl, p.label) AS label
             |  FROM l${i - 1} p LEFT JOIN (
             |    SELECT u, CAST(min((2147483648 - c) * 2147483648 + label)
             |      % 2147483648 AS BIGINT) AS nl
             |    FROM (SELECT e.u, l.label, count(*) AS c
             |          FROM nb e JOIN l${i - 1} l ON e.v = l.node
             |          GROUP BY 1, 2) t
             |    GROUP BY u) ch ON p.node = ch.u)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgeSqlPrefix,
           |nb AS (SELECT a AS u, b AS v FROM und
           |       UNION ALL SELECT b, a FROM und),
           |l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents),
           |$iters
           |SELECT node AS doc_id, label AS community FROM l3""".stripMargin
      },
      "synchronous label-propagation communities: per round one " +
        "edge-keyed join + two hash aggregates, packed-long argmax " +
        "(count desc, label asc) keeps the mode hash-aggregable; " +
        "3-round fixpoint trajectory value-checked"),

    // Weighted shortest paths from a seed document, hop-bounded: the
    // WEIGHTED companion of graph_bfs_layers (link distance where
    // links cost different amounts — crawl cost, latency, toll).
    // Semantics are the exact-h-edges DP, not mixed-state
    // Bellman-Ford: layer h holds D[v][h] = cheapest path using
    // EXACTLY h edges (one src-keyed equi-join + min hash-agg per
    // round — shuffle ∝ layer out-edges, the BFS cost class), and the
    // answer folds min over h ≤ 5 packed as dist·8+hops so a distance
    // tie resolves to the FEWEST hops deterministically (the packed
    // lexicographic-min idiom; hops ≤ 5 < 8, dist ≤ 35 — no overflow).
    // Mixed-state BF would be one frame instead of six but its
    // intermediate values depend on relaxation order when a hop cap
    // is the spec; the layered DP is exact and each layer is
    // independently correct, so the oracle replays it as six chained
    // CTEs and every (node, dist, hops) value hash-checks. Edge
    // weights w = 1 + (src+dst) mod 7 derive from the same shared
    // link rule — integer arithmetic end to end, nothing rounded.
    Q("graph_shortest_paths",
      (s, d) => {
        val ew = persistOnce(derivedDir(s, d)
          .select(col("src"), col("dst"),
            (lit(1L) + (col("src") + col("dst")) % 7).as("w")))
        var layer = load(s, d, "documents").filter(col("doc_id") === 0)
          .select(col("doc_id").as("node"), lit(0L).as("dist"))
        val layers = Seq.newBuilder[org.apache.spark.sql.DataFrame]
        layers += layer.select(col("node"), col("dist"), lit(0L).as("h"))
        for (i <- 1 to 5) {
          layer = persistOnce(layer
            .join(ew, col("node") === col("src"))
            .groupBy(col("dst"))
            .agg(min(col("dist") + col("w")).as("dist"))
            .select(col("dst").as("node"), col("dist")))
          layers += layer.select(col("node"), col("dist"), lit(i.toLong).as("h"))
        }
        layers.result().reduce(_ unionByName _)
          .groupBy(col("node"))
          .agg(min(col("dist") * 8 + col("h")).as("pk"))
          .select(col("node").as("doc_id"),
            expr("pk DIV 8").as("dist"),
            (col("pk") % 8).as("hops"))
      },
      Some {
        val iters = (1 to 5).map { i =>
          s"""d$i AS (
             |  SELECT dst AS node, min(p.dist + w) AS dist
             |  FROM d${i - 1} p JOIN ew ON p.node = ew.src GROUP BY 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH $edgeSqlPrefix,
           |ew AS (SELECT src, dst,
           |         CAST(1 + (src + dst) % 7 AS BIGINT) AS w FROM dir),
           |d0 AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
           |       FROM nodes WHERE doc_id = 0),
           |$iters,
           |united AS (
           |  SELECT node, dist, 0 AS h FROM d0
           |  UNION ALL SELECT node, dist, 1 FROM d1
           |  UNION ALL SELECT node, dist, 2 FROM d2
           |  UNION ALL SELECT node, dist, 3 FROM d3
           |  UNION ALL SELECT node, dist, 4 FROM d4
           |  UNION ALL SELECT node, dist, 5 FROM d5)
           |SELECT node AS doc_id,
           |       min(dist * 8 + h) // 8 AS dist,
           |       CAST(min(dist * 8 + h) % 8 AS BIGINT) AS hops
           |FROM united GROUP BY 1""".stripMargin
      },
      "hop-bounded weighted shortest paths (exact-h layered DP): one " +
        "src-keyed equi-join + min hash-agg per layer, packed " +
        "(dist, hops) lexicographic-min fold — integer-exact, all six " +
        "layers value-checked against chained CTEs"))

  /** HITS (hubs & authorities, Kleinberg) over the derived link graph,
    * UNNORMALIZED for a fixed two rounds — without the per-round L1
    * normalization the scores are exact INTEGER path counts (auth² of
    * v = # of 2-step paths u→x→v weighted by in-degree seeds), so the
    * whole iteration hash-checks engine-exactly; normalization only
    * rescales ranks and is a single 1-row broadcast division when a
    * consumer wants it. Same shuffle shape as PageRank: one edge-keyed
    * equi-join + one map-side-combined hash agg per half-round, no
    * driver-side state. */
  private def hitsQueries: Seq[Q] = Seq(
    Q("graph_hits_paths",
      (s, d) => {
        val ed = persistOnce(derivedDir(s, d).select(col("src"), col("dst")))
        val nodes = load(s, d, "documents").select(col("doc_id"))
        val auth1 = ed.groupBy(col("dst").as("v"))
          .agg(count(lit(1)).as("a1"))
        val hub1 = ed.join(auth1, col("dst") === col("v"))
          .groupBy(col("src").as("u")).agg(sum(col("a1")).as("h1"))
        val auth2 = ed.join(hub1, col("src") === col("u"))
          .groupBy(col("dst").as("w")).agg(sum(col("h1")).as("a2"))
        val hub2 = ed.join(auth2, col("dst") === col("w"))
          .groupBy(col("src").as("x")).agg(sum(col("a2")).as("h2"))
        nodes
          .join(auth2, col("doc_id") === col("w"), "left")
          .join(hub2, col("doc_id") === col("x"), "left")
          .select(col("doc_id"),
            coalesce(col("a2"), lit(0L)).as("auth2"),
            coalesce(col("h2"), lit(0L)).as("hub2"))
      },
      Some(s"""WITH $edgeSqlPrefix,
             |a1 AS (SELECT dst AS v, CAST(count(*) AS BIGINT) AS a1
             |       FROM dir GROUP BY 1),
             |h1 AS (SELECT src AS u, CAST(sum(a1) AS BIGINT) AS h1
             |       FROM dir JOIN a1 ON dst = v GROUP BY 1),
             |a2 AS (SELECT dst AS w, CAST(sum(h1) AS BIGINT) AS a2
             |       FROM dir JOIN h1 ON src = u GROUP BY 1),
             |h2 AS (SELECT src AS x, CAST(sum(a2) AS BIGINT) AS h2
             |       FROM dir JOIN a2 ON dst = w GROUP BY 1)
             |SELECT doc_id,
             |  CAST(coalesce(a2, 0) AS BIGINT) AS auth2,
             |  CAST(coalesce(h2, 0) AS BIGINT) AS hub2
             |FROM nodes LEFT JOIN a2 ON doc_id = w
             |LEFT JOIN h2 ON doc_id = x""".stripMargin),
      "HITS hubs/authorities, two unnormalized rounds = exact integer " +
        "path counts — one edge-keyed join + hash agg per half-round, " +
        "the PageRank shuffle discipline"),

    // Per-node LOCAL clustering coefficient — the node-grain sibling
    // of graph_triangle_count's global number (community cores vs
    // bridge nodes). Same degree-ordered orientation, but the closed
    // wedge keeps its MIDDLE vertex so each triangle credits all
    // three corners via one explode; lcc = 2t/(d(d−1)) is an exact
    // integer ratio (one division, unrounded). Candidates stay
    // ∝ Σ out-deg² — the hub² blowup is structurally impossible.
    Q("graph_local_clustering",
      (s, d) => {
        val und = persistOnce(derivedUnd(s, d))
        val deg = persistOnce(und
          .select(explode(array(col("a"), col("b"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("dg")))
        val lower = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val o = persistOnce(und
          .join(deg.select(col("v").as("a"), col("dg").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("dg").as("db")), "b")
          .select(when(lower, col("a")).otherwise(col("b")).as("u"),
            when(lower, col("b")).otherwise(col("a")).as("v")))
        val closed = o.as("x").join(o.as("y"), col("x.v") === col("y.u"))
          .select(col("x.u").as("u"), col("x.v").as("m"),
            col("y.v").as("w"))
          .join(o.select(col("u"), col("v").as("w")), Seq("u", "w"),
            "left_semi")
        val perNode = closed
          .select(explode(array(col("u"), col("m"), col("w"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("t"))
        deg.join(perNode, Seq("v"), "left")
          .select(col("v").as("doc_id"), col("dg"),
            coalesce(col("t"), lit(0L)).as("n_triangles"),
            when(col("dg") < 2, lit(0.0))
              .otherwise((lit(2L) * coalesce(col("t"), lit(0L)))
                .cast("double") / (col("dg") * (col("dg") - 1)))
              .as("lcc"))
      },
      Some(s"""WITH $edgeSqlPrefix,
             |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
             |          SELECT a AS v FROM und
             |          UNION ALL SELECT b AS v FROM und) e GROUP BY 1),
             |o AS (SELECT CASE WHEN da.dg < db.dg
             |                    OR (da.dg = db.dg AND a < b)
             |                  THEN a ELSE b END AS u,
             |             CASE WHEN da.dg < db.dg
             |                    OR (da.dg = db.dg AND a < b)
             |                  THEN b ELSE a END AS v
             |      FROM und JOIN deg da ON und.a = da.v
             |               JOIN deg db ON und.b = db.v),
             |closed AS (
             |  SELECT x.u AS u, x.v AS m, y.v AS w
             |  FROM o x JOIN o y ON x.v = y.u
             |  WHERE EXISTS (SELECT 1 FROM o
             |                WHERE o.u = x.u AND o.v = y.v)),
             |tv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
             |         SELECT u AS v FROM closed
             |         UNION ALL SELECT m FROM closed
             |         UNION ALL SELECT w FROM closed) z GROUP BY 1)
             |SELECT deg.v AS doc_id, dg,
             |  coalesce(t, 0) AS n_triangles,
             |  CASE WHEN dg < 2 THEN 0.0
             |       ELSE CAST(2 * coalesce(t, 0) AS DOUBLE)
             |         / (dg * (dg - 1)) END AS lcc
             |FROM deg LEFT JOIN tv ON deg.v = tv.v""".stripMargin),
      "per-node local clustering coefficient via degree-ordered " +
        "wedges that keep their middle vertex — one explode credits " +
        "all three triangle corners; exact integer ratio, no hub² " +
        "blowup"),

    // Edge reciprocity of the DIRECTED derivation — what fraction of
    // links are mutual? The macro signal separating broadcast-shaped
    // graphs (follow/cite, low r) from conversation-shaped ones
    // (mutual, high r); also the sanity probe for any pipeline that
    // SYMMETRIZES edges downstream (und = dedup of dir) — r says how
    // much that dedup collapses. One self equi-join on the reversed
    // key + two exact counts; join keyed (src, dst) like any hash
    // join, no degree² term anywhere.
    Q("graph_reciprocity",
      (s, d) => {
        val dir = persistOnce(derivedDir(s, d).distinct())
        val mutual = dir.as("e").join(dir.as("r"),
          col("e.src") === col("r.dst") && col("e.dst") === col("r.src"))
          .select(count(lit(1)).as("n_mutual"))
        dir.agg(count(lit(1)).as("n_edges"))
          .crossJoin(broadcast(mutual))
          .select(col("n_edges"), col("n_mutual"),
            (col("n_mutual").cast("double") / col("n_edges"))
              .as("reciprocity"))
      },
      Some(s"""WITH $edgeSqlPrefix,
             |dd AS (SELECT DISTINCT src, dst FROM dir),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_mutual
             |  FROM dd e JOIN dd r ON e.src = r.dst AND e.dst = r.src)
             |SELECT CAST(count(*) AS BIGINT) AS n_edges,
             |  max(m.n_mutual) AS n_mutual,
             |  CAST(max(m.n_mutual) AS DOUBLE) / count(*) AS reciprocity
             |FROM dd CROSS JOIN m""".stripMargin),
      "directed-edge reciprocity: one reversed-key self equi-join, " +
        "exact integer counts — the broadcast-vs-conversation shape " +
        "scalar"))
}
