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

  private val Iterations = 5

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

  def queries: Seq[Q] = Seq(
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
        "iterations"))
}
