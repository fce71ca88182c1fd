package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-plan regression guard: the scale-critical plan shapes
  * documented in PLANS.md, asserted against the actual executed plans
  * so a refactor can't silently trade them away. (Small-SF plans —
  * AQE may choose broadcasts here that become shuffles at scale; the
  * asserted properties are the ones that hold at ANY scale.) */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    QueryCatalog.byName(name).fn(spark, sf0001)
      .queryExecution.executedPlan.toString

  /** Plan AFTER running the query — AQE stage/exchange reuse only
    * materializes in the final adaptive plan, not the initial one. */
  private def executedPlan(name: String): String = {
    val df = QueryCatalog.byName(name).fn(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("agg_pricing_summary pushes the date filter into the parquet scan") {
    val p = plan("agg_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      p.take(800))
  }

  test("topk_orders is TakeOrderedAndProject, never a global sort") {
    assert(plan("topk_orders").contains("TakeOrderedAndProject"))
  }

  test("join_shipping_priority: top-k via TakeOrderedAndProject") {
    val p = plan("join_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("window_topn_per_group truncates partitions before the shuffle") {
    assert(plan("window_topn_per_group").contains("WindowGroupLimit"))
  }

  test("range joins never fall back to a nested loop") {
    assert(!plan("join_range_point").contains("BroadcastNestedLoopJoin"))
    assert(!plan("join_range_overlap").contains("BroadcastNestedLoopJoin"))
  }

  test("profile_orders computes all column stats in one scan (Expand)") {
    val p = plan("profile_orders")
    assert(p.contains("Expand"), p.take(800))
    // exactly one parquet scan of orders feeds the whole profile
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(800))
  }

  test("tfidf ranking is TakeOrderedAndProject over the scored pairs") {
    assert(plan("text_tfidf_topk").contains("TakeOrderedAndProject"))
  }

  test("IVF-routed KNN join is an equi-join on cell, never a nested loop") {
    val p = plan("sim_knn_join_ivf")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the per-query rank limit truncates map-side (Partial) BEFORE the
    // shuffle — candidates per partition cap at k per query, so the
    // exchange never carries a full candidate set
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("decontamination broadcasts the eval grams; corpus never shuffles " +
    "before the join") {
    val p = plan("dedup_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    // corpus grams + eval grams — both derive from documents, two scans
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(800))
  }

  test("curate+pack: ONE train-side corpus pass — broadcast left join " +
    "on the eval grams + doc-grain contamination aggregate") {
    val p = plan("pipeline_curate_pack")
    // r14 shape: explode_outer keeps gram-less docs, the broadcast
    // eval-gram join runs LEFT OUTER, and a doc-grain max(hit)
    // aggregate replaces the anti-join — so tokenize+quality evaluate
    // once per train doc instead of twice (OPTIMIZATION_r14.md)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("LeftOuter"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // exactly TWO documents scans: train (quality-gated) + eval grams
    // — the old anti-join shape paid a third full tokenize+quality pass
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(1500))
  }

  test("salted skew join joins on (key, salt) — the hot key is spread") {
    // force the shuffle path: at scale neither side broadcasts, and the
    // point of salting is the shape of that shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("join_salted_skew")
      assert(p.contains("_salt"), p.take(1200))
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
      // the exchange keys include the salt, not the bare hot key
      assert("hashpartitioning\\([^)]*_salt".r.findFirstIn(p).isDefined,
        p.take(1200))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("EXISTS / NOT EXISTS plan as semi/anti hash joins, never nested loops") {
    val p = plan("subquery_exists")
    assert(p.contains("LeftSemi"), p.take(800))
    assert(p.contains("LeftAnti"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
    // the EXISTS predicates reach the orders scans as pushed filters
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"), p.take(1200))
  }

  test("LATERAL ... LIMIT k rewrites to a per-group window limit, not a re-scan per row") {
    val p = plan("join_lateral_topn")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("correlated scalar subquery aggregates the inner table once, joined on the key") {
    val p = plan("subquery_scalar_brand")
    // one aggregate of (brand, avg) joined back — not a per-row re-scan;
    // part is scanned at most twice (outer + the deduplicated subquery)
    assert("Scan parquet".r.findAllIn(p).size <= 3, p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("six-table star join: region filter pushed, no nested-loop fallback") {
    val p = plan("join_local_supplier_revenue")
    assert(p.contains("EqualTo(r_name,ASIA)"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("mergeable HLL rollup: sketches union without rescanning orders") {
    // two scans total: one builds the per-month sketches, one the
    // direct estimate + exact baseline — the per-priority MERGE reuses
    // the month sketches instead of a third scan
    val p = plan("agg_hll_mergeable")
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(1200))
  }

  test("hybrid RRF: both retrieval arms truncate via TakeOrderedAndProject " +
    "before the rank windows run") {
    val p = plan("text_hybrid_rrf")
    // each arm is a top-k (BM25 / cosine) feeding a ≤20-row window;
    // neither arm may globally sort its full candidate set
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p.take(1500))
  }

  test("nDCG eval: per-query top-20 truncates map-side before the shuffle") {
    assert(plan("eval_ndcg_at_k").contains("WindowGroupLimit"))
  }

  test("funnel: three per-user min-aggs chained on user_id, no window " +
    "over the raw event history and no nested-loop fallback") {
    val p = plan("events_funnel_stages")
    assert(!p.contains("Window "), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("attribution as-of join: one user-keyed exchange + sort, " +
    "never a range theta-join") {
    val p = plan("events_attribution_asof")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("fuzzy decontamination joins the corpus against a BROADCAST eval " +
    "side — the training corpus is never self-joined or nested-looped") {
    val p = plan("dedup_fuzzy_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("heavy hitters: the confirm pass re-aggregates only candidate " +
    "keys (broadcast 1-row sketch, no second full-domain shuffle)") {
    val p = plan("agg_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("min-cost supplier (Q2 shape): part slice + dim chain broadcast, " +
    "winner picked via map-side WindowGroupLimit, filters pushed") {
    val p = plan("join_min_cost_supplier")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("EqualTo(p_type,SMALL)"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("market share (Q8 shape): selective dim filters pushed into " +
    "their scans, every dim arm broadcast, no nested-loop fallback") {
    val p = plan("join_market_share")
    assert(p.contains("EqualTo(p_type,ECONOMY)"), p.take(2000))
    assert(p.contains("EqualTo(r_name,ASIA)"), p.take(2000))
    // the 8-relation join runs as broadcast hash joins off the fact
    // spine — at most the fact-fact lineitem⋈orders edge may shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 6, p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("NOT IN over a nullable subquery column plans the null-aware " +
    "anti join, not a nested-loop fallback") {
    val p = plan("join_not_in_null_aware")
    // BroadcastHashJoinExec prints isNullAwareAntiJoin as the trailing
    // boolean: "LeftAnti, BuildRight, true"
    assert("LeftAnti, BuildRight(, [^,\\s]+)?, true".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("small-qty revenue (Q17 shape): the correlated per-part avg is " +
    "ONE aggregate broadcast back — the fact table is scanned twice " +
    "(avg + probe) but never shuffled into the join") {
    val p = plan("subquery_small_qty_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("large-volume orders (Q18 shape): the HAVING-filtered aggregate " +
    "broadcasts into the orders join") {
    val p = plan("subquery_large_volume_orders")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("dominant supplier share: per-part total and winner ride ONE " +
    "exchange of the (part,supplier) rollup") {
    val p = plan("join_dominant_supplier_share")
    // exactly one single-key l_partkey exchange feeds BOTH the sum
    // window and the row_number winner (the other hashpartitioning is
    // the (part,supplier) rollup's own map-side-combined shuffle)
    assert("hashpartitioning\\(l_partkey#\\d+L, \\d+\\)".r.findAllIn(p).size == 1,
      p.take(2000))
    // the winner is truncated by WindowGroupLimit, not a full sort+filter
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("fuzzy part-name join: candidates come from a block-key " +
    "equi-join — no cross join anywhere") {
    val p = plan("join_fuzzy_part_names")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("Q13 distribution: orders pre-aggregate to (custkey, count) " +
    "BEFORE the outer join — the join never carries raw order rows") {
    val p = plan("join_customer_order_distribution")
    // the orders-side aggregate sits below the join: a partial_count
    // keyed by o_custkey appears in the plan before any join node
    val aggIdx = p.indexOf("partial_count")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"),
      math.max(p.indexOf("BroadcastHashJoin"), p.indexOf("ShuffledHashJoin")))
    assert(aggIdx >= 0 && joinIdx >= 0, p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("Q19 disjunctive predicates: both per-side envelopes reach the " +
    "parquet scans as pushed filters") {
    val p = plan("join_disjunctive_pushdown")
    // part scan: brand IN-list + size upper bound pushed
    assert("PushedFilters: \\[[^\\]]*In\\(p_brand".r.findFirstIn(p).isDefined,
      p.take(2000))
    // fact scan: the quantity envelope pushed
    assert("PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("quantile bins: the orders table is scanned, never shuffled — " +
    "the only exchanges carry the 1-row thresholds and O(bins) partials") {
    val p = plan("pipeline_quantile_bins")
    // no exchange keyed by the raw cents value (no global sort / no
    // row-level repartition); the bin rollup exchanges on `bin`
    assert(!p.contains("rangepartitioning"), p.take(1200))
    assert(!"hashpartitioning\\(cents".r.findFirstIn(p).isDefined, p.take(1200))
  }

  test("bloom prefilter: the corpus is probed map-side (might_contain " +
    "below any exchange on the train side) before the confirm join") {
    val p = plan("dedup_bloom_prefilter")
    assert(p.contains("might_contain"), p.take(1500))
    // the bloom probe is a filter, not a join: exactly the confirm
    // semi-join plus the 1-row bits broadcast appear as joins
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("returned-items ranking: per-customer rollup below the dim joins, " +
    "top-20 via TakeOrderedAndProject") {
    val p = plan("join_returned_items")
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    // the rollup's partial agg must sit BELOW the customer join: the
    // shuffle carries (custkey, cents), never raw lineitem rows
    val aggIdx = p.indexOf("partial_sum")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(aggIdx >= 0 && (joinIdx < 0 || p.indexOf("partial_sum", joinIdx) >= 0),
      p.take(1500))
  }

  test("nation-volume and promo-share never fall back to a nested loop") {
    for (q <- Seq("join_nation_volume", "agg_promo_share", "join_product_profit",
        "join_top_supplier", "agg_order_priority", "join_supplier_part_counts")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q: ${p.take(800)}")
    }
  }

  test("Q15 top supplier: the twice-referenced revenue aggregate rides " +
    "ONE exchange — the max branch is a ReusedExchange, lineitem is " +
    "scanned once in the final plan") {
    val p = executedPlan("join_top_supplier")
    assert(p.contains("ReusedExchange"), p.take(2000))
    val cut = p.indexOf("== Initial Plan ==")
    val finalPlan = if (cut < 0) p else p.substring(0, cut)
    assert("lineitem\\.parquet".r.findAllIn(finalPlan).size == 1,
      finalPlan.take(2000))
  }

  test("correlated scalar subquery (brand avg): the deduplicated " +
    "subquery reuses the outer exchange in the final plan") {
    assert(executedPlan("subquery_scalar_brand").contains("ReusedExchange"))
  }

  test("Q12 ship-class priority counts: IN-list and date window pushed " +
    "into the lineitem scan, no nested-loop fallback") {
    val p = plan("join_shipmode_priority")
    assert("PushedFilters: \\[[^\\]]*In\\(l_returnflag".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(p).isDefined,
      p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("partition-pruned month query: the filter resolves against the " +
    "directory layout at planning time") {
    val p = plan("layout_partition_pruned")
    assert("PartitionFilters: \\[[^\\]]*o_month".r.findFirstIn(p).isDefined,
      p.take(1500))
  }

  test("containment dedup: prefix-filter candidates are equi-joins — " +
    "no all-pairs fallback anywhere in the plan") {
    val p = plan("dedup_containment_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("content-defined chunking is zero-exchange: boundaries, spans " +
    "and hashes all compute inside the per-row token array") {
    val p = plan("text_cdc_chunks")
    assert(!p.contains("Exchange"), p.take(1200))
    assert(p.contains("Generate"), p.take(1200)) // the chunk explode
  }

  test("bucket digest diff: both sides fold to O(buckets) rows before " +
    "the full-outer compare — the join never carries raw customer rows") {
    val p = plan("recon_bucket_digest")
    // digests aggregate below the join (partial_sum of fingerprints)
    val aggIdx = p.indexOf("partial_sum")
    assert(aggIdx >= 0, p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("Q20 excess stock: the correlated scalar never becomes a second " +
    "fact pass — one lineitem scan feeds both conditional aggregates") {
    val p = plan("subquery_excess_stock")
    // lineitem + part + supplier + nation: exactly four scans total,
    // so the year slice and the all-time total provably share one
    // fact read (the decorrelation claim, pinned)
    assert("Scan parquet".r.findAllIn(p).size == 4, p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
  }

  test("priority sampling: the per-stratum rank truncates map-side — " +
    "the lang exchange carries at most k+1 rows per stratum per task") {
    val p = plan("pipeline_priority_sample")
    assert(p.contains("WindowGroupLimit"), p.take(1200))
  }

  test("SLO burn rate: both trailing windows ride ONE topic-keyed " +
    "exchange and one Window pass over a single events scan") {
    val p = plan("mon_slo_burn")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
    assert("Exchange".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("EWMA forecast: one events scan; the eight lag taps share one " +
    "ordered window over the per-minute rollup") {
    val p = plan("mon_lag_ewma")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
    // rollup exchange + window exchange — never one per tap
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(1200))
  }

  test("Zipf fit: the corpus is scanned once; the rank runs over the " +
    "O(vocab) aggregate, not the token stream") {
    val p = plan("text_zipf_fit")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("triangle count: wedge generation and closure are equi-joins " +
    "(semi for closure), never a cartesian dominance pass") {
    val p = plan("graph_triangle_count")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("PMI collocations: the top-40 cut is TakeOrderedAndProject, " +
    "never a global sort of the scored pairs") {
    assert(plan("text_collocations_pmi").contains("TakeOrderedAndProject"))
  }

  test("skyline: the sweep window runs over the price AGGREGATE — the " +
    "part table is scanned twice (rollup + result join), never " +
    "dominance-self-joined") {
    val p = plan("topk_skyline")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(1200))
  }

  test("RFM segmentation: orders roll up ONCE into a cached customer " +
    "frame; quartiles are broadcast value-domain cutoffs, never a " +
    "global ntile over the customer aggregate") {
    val p = plan("agg_rfm_segments")
    // the customer rollup is CACHED — the stacked cutoff pipeline and
    // the final segment assignment both read the cache (the FileScan
    // lines in the printout sit inside the cached-relation subplan =
    // the one-time fill); the ONE quartile window (r14: the three
    // per-dim pipelines stack into a single (dim, blk, v) rollup) is
    // (dim, blk)-PARTITIONED over the value rollup, never an ntile
    // over customer grain
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    assert(!p.contains("ntile"), p.take(1200))
    assert(!"windowspecdefinition\\(v#".r.findFirstIn(p).isDefined &&
      p.contains("windowspecdefinition(dim"), p.take(1500))
    assert("Window \\[".r.findAllIn(p).size == 1, p.take(1500))
  }

  test("CUSUM drift: the recursion is two cumulative windows over the " +
    "CACHED daily rollup, sharing ONE type-keyed sort") {
    val p = plan("mon_cusum_drift")
    // both consumers read the persisted rollup, not a re-scan
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    // the stacked sum + running-min windows share a single sort pass
    assert("Window \\[".r.findAllIn(p).size == 2, p.take(1600))
    assert("Sort \\[event_type".r.findAllIn(p).size == 1, p.take(1600))
  }

  test("PSI drift: one event scan feeds both halves — the time split " +
    "is a CASE on a broadcast midpoint, not two passes") {
    val p = plan("mon_psi_drift")
    // events + the two 1-row stat aggregates all reuse one file scan
    // lineage; binned is derived once (counts + totals re-read it)
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("growth accounting: lag and lead share ONE user-keyed window " +
    "sort over the distinct user-month grain") {
    val p = plan("events_growth_accounting")
    assert("Window \\[".r.findAllIn(p).size == 1, p.take(1600))
    assert("Sort \\[user_id".r.findAllIn(p).size == 1, p.take(1600))
  }

  test("Neyman allocation: one corpus rollup + a broadcast normalizer — " +
    "the documents table is scanned once per consumer, never joined " +
    "row-level") {
    val p = plan("sample_neyman_allocation")
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("weighted median: the cumulative window is PARTITIONED by the " +
    "group key over the per-price rollup — no global sort, no " +
    "sort-merge join") {
    val p = plan("agg_weighted_median")
    assert(p.contains("windowspecdefinition(l_returnflag"), p.take(1600))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("drill-across: the two facts meet in a FULL OUTER join of their " +
    "ROLLUPS (aggregates below the join, no fan-out)") {
    val p = plan("join_drill_across")
    assert(p.contains("FullOuter"), p.take(1600))
    // both inputs to the conformed join are aggregated first
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(1600))
  }

  test("referential integrity: every edge probes broadcast parent keys " +
    "with an anti join") {
    val p = plan("quality_referential_integrity")
    assert(p.contains("LeftAnti"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("sweep concurrency: the boundary running sum is MONTH-partitioned " +
    "(two-phase sweep) — the only unpartitioned window is the " +
    "O(months) carry prefix") {
    val p = plan("window_sweep_concurrency")
    assert(p.contains("windowspecdefinition(month"), p.take(1600))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("MAD outliers: two broadcast-median passes — the orders table " +
    "is never sorted or sort-merge-joined") {
    val p = plan("agg_mad_outliers")
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("typo dedup: block-keyed equi-join candidates; the codegen'd " +
    "DamerauLevenshtein stays inside whole-stage codegen") {
    val p = plan("dedup_typo_pairs")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the PAIR join is hash-keyed on the block columns (the only
    // nested loop anywhere is the 1-row offset broadcast inside the
    // cached corpus build — the standard O(n) idiom)
    assert("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \\[blk".r
      .findFirstIn(p).isDefined, p.take(1200))
    // the distance expression compiles into the generated stage —
    // no BatchEvalPython/UDF fallback markers anywhere
    assert(!p.contains("BatchEval"), p.take(1200))
  }

  test("sorted-neighborhood dedup: the window compare is a rank " +
    "equi-join on exploded probes, never a range self-join") {
    val p = plan("dedup_sorted_neighborhood")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("Generate"), p.take(1200)) // the probe explode
  }

  test("market basket: the pair join is keyed on ORDER KEY (bounded by " +
    "basket size) and the top-25 is TakeOrderedAndProject") {
    val p = plan("join_market_basket")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    // the basket self-join reads the CACHED distinct (order, part)
    // set on both sides, not two scans
    assert(p.contains("InMemoryTableScan"), p.take(1200))
  }

  test("BFS layers: every round is an equi-join on src — no nested " +
    "loop anywhere in the 4-round expansion") {
    val p = plan("graph_bfs_layers")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("entropy profile: stack() unpivots map-side (Generate, no " +
    "pre-rollup shuffle); totals and scoring share the cached counts") {
    val p = plan("profile_entropy")
    assert(p.contains("Generate"), p.take(1200))
    assert(p.contains("InMemoryTableScan"), p.take(1200))
    // totals join the counts broadcast — never a sort-merge of values
    assert(!p.contains("SortMergeJoin"), p.take(1200))
  }

  test("PVM bridge: two-year window pushed into the lineitem scan, " +
    "brand dim broadcast, one fact aggregation") {
    val p = plan("agg_pvm_bridge")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      p.take(1200))
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // one lineitem + one part scan feed the whole bridge
    assert("Scan parquet".r.findAllIn(p).size == 2, p.take(1200))
  }

  test("OHLC bars: one hash aggregate over the tick stream — no " +
    "window and no per-group sort anywhere in the plan") {
    val p = plan("events_ohlc_bars")
    // the packed long ordering key keeps min_by/max_by hash-aggregable;
    // a struct key would demote the whole bar to SortAggregate
    assert(p.contains("HashAggregate"), p.take(1200))
    assert(!p.contains("Window ") && !p.contains("SortAggregate"),
      p.take(1200))
  }

  test("cohort LTV: the cached (user, week) rollup feeds both cohort " +
    "min and the curve — no second events pass") {
    val p = plan("events_cohort_ltv")
    // every reader of the rollup hits the cache (the embedded
    // InMemoryRelation plan text re-prints the one real FileScan)
    assert(p.contains("InMemoryTableScan"), p.take(1200))
  }

  test("grid neighbor join: cell-keyed equi-join — never a cross " +
    "product; the point set is cached, not re-derived per side") {
    val p = plan("join_grid_neighbors")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(p.contains("Generate"), p.take(1200)) // the 3×3 probe explode
    assert(p.contains("InMemoryTableScan"), p.take(1200))
  }

  test("M4 downsampling: one hash aggregate, no window and no sort — " +
    "min_by/max_by under the (ts, event_id) struct stay hash-aggregable") {
    val p = plan("events_m4_downsample")
    assert(p.contains("HashAggregate"), p.take(1200))
    assert(!p.contains("Window ") && !p.contains("SortAggregate") &&
      !p.contains("Sort "), p.take(1200))
  }

  test("KMV sketch: the typed aggregator partial-aggregates map-side — " +
    "only O(k) sketch buffers per group travel, never the key domain") {
    val p = plan("sketch_kmv_distinct")
    // partial_kmvaggregator below the exchange = map-side combine; the
    // second exchange belongs to the EXACT countDistinct calibration
    // column (expand+dedup phases), not the sketch
    assert(p.contains("partial_kmvaggregator"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      p.take(1500))
  }

  test("penny allocation: every window and the final rollup ride ONE " +
    "orderkey exchange; no partition-less window anywhere") {
    val p = plan("agg_penny_allocation")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(1500))
    // a partition-less window would force Exchange SinglePartition
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("SCD2 compaction: the island windows and the collapse aggregate " +
    "share the per-key partitioning — one exchange past the union") {
    val p = plan("cdc_scd2_compact")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("broadcast as-of join (catalog): BroadcastAsofJoin exec, the " +
    "fact side never shuffled — the only hashpartitioning exchange in " +
    "the plan is the final 42-group rollup") {
    val p = plan("join_asof_broadcast")
    assert(p.contains("BroadcastAsofJoin"), p.take(1500))
    assert(p.contains("BroadcastExchange"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(1500))
    assert(!p.contains("Sort "), p.take(1500))
  }

  test("nearest as-of join (catalog): served by the NATIVE merge exec " +
    "— no union, no window, no nested loop; the composed fallback's " +
    "one-exchange property stays pinned in AsofJoinNativeSpec") {
    val p = plan("join_asof_nearest")
    assert(p.contains("AsofJoin "), p.take(1500)) // the custom exec node
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("Union") && !p.contains("Window "), p.take(1500))
  }

  test("winnowing match: fingerprint pairing is an equi-join on the " +
    "selected hash, never a nested loop; selection windows are " +
    "per-document, never partition-less") {
    val p = plan("dedup_winnow_matches")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("DDSketch: the (group, bucket) sketch partial-aggregates " +
    "map-side below its exchange; no SortAggregate anywhere") {
    val p = plan("sketch_dd_quantiles")
    assert(p.contains("partial_count"), p.take(1500))
    assert(!p.contains("SortAggregate"), p.take(1500))
  }

  test("AMS sketch: both relation sketches partial-aggregate map-side " +
    "(12 longs per map task on the wire), and the raw relations are " +
    "never equi-joined — only the O(seeds) sketch rows and the " +
    "O(distinct-keys) frequency rollups meet") {
    val p = plan("sketch_ams_joinsize")
    assert(p.contains("partial_sum"), p.take(1500))
    // the only nested loop allowed is the 1-row × 1-row Cross gluing
    // the two scalar aggregates; no cartesian on real inputs
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert("BroadcastNestedLoopJoin(?![^\\n]*Cross)".r.findAllIn(p).isEmpty,
      p.take(1500))
  }

  test("MATCH_RECOGNIZE emulation: direction/run windows, the run " +
    "rollup and the adjacent-run pairing all share ONE user_id " +
    "exchange — partitioning on user_id satisfies the (user_id, rid) " +
    "clusterings downstream") {
    val p = plan("window_match_recognize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(1500))
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("label propagation: every round is equi-join + hash aggregates " +
    "— no nested loop, and the packed-long argmax never demotes a " +
    "round to SortAggregate") {
    val p = plan("graph_label_propagation")
    // the only nested loop allowed is the 1-row broadcast of the node
    // count N into the edge derivation (the PageRank shape)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert("BroadcastNestedLoopJoin(?![^\\n]*Cross)".r.findAllIn(p).isEmpty,
      p.take(1500))
    assert(!p.contains("SortAggregate"), p.take(1500))
  }

  test("AUC: the global rank window runs on the distinct-score rollup " +
    "(bounded domain), never on raw event rows — the partial count " +
    "sits below the single-partition window's exchange") {
    val p = plan("eval_auc_brier")
    val aggIdx = p.indexOf("partial_count")
    val spIdx = p.indexOf("SinglePartition")
    assert(aggIdx >= 0 && spIdx >= 0 && spIdx < aggIdx, p.take(1500))
  }

  test("runtime bloom-filter join: a selective build side injects a " +
    "might_contain probe ahead of the big-side shuffle, and the " +
    "filtered result is bit-identical to the unfiltered join") {
    // thresholds floored so the injection triggers at test SF — at
    // real scale the defaults (10 MB build / 10 GB probe) gate it
    // applicationSideScanSizeThreshold is a MINIMUM (probe side must
    // be big enough to be worth filtering — 10 GB default) → floored
    // to 0 for test SF; creationSideThreshold is a MAXIMUM (build
    // side must be cheap) and the filtered orders side already fits.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    def q() = {
      val li = graft.core.Tables.load(spark, sf0001, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val o = graft.core.Tables.load(spark, sf0001, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qc"))
    }
    val plain = q().collect().toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = q()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"), p.take(2000))
      assert(df.collect().toSeq == plain)
    } finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  test("join strategy hints are honored: SHUFFLE_HASH builds a " +
    "ShuffledHashJoin, MERGE a SortMergeJoin — the per-join overrides " +
    "a tuner reaches for when statistics mislead the planner") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = graft.core.Tables.load(spark, sf0001, "lineitem")
        .select(col("l_orderkey"))
      val o = graft.core.Tables.load(spark, sf0001, "orders")
        .select(col("o_orderkey"))
      def planWith(hint: String) =
        li.join(o.hint(hint), col("l_orderkey") === col("o_orderkey"))
          .queryExecution.executedPlan.toString
      assert(planWith("SHUFFLE_HASH").contains("ShuffledHashJoin"))
      assert(planWith("MERGE").contains("SortMergeJoin"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("map-only text scoring stays inside whole-stage codegen — no " +
    "interpreted fallback in the hot path") {
    for (q <- Seq("text_quality_score", "text_langid", "scalar_arith_charge")) {
      val p = plan(q)
      assert(p.contains("*("), s"$q has no WholeStageCodegen span: ${p.take(600)}")
    }
  }

  test("dynamic partition pruning: the month predicate from the " +
    "broadcast dim result reaches the Hive-layout scan as a runtime " +
    "PartitionFilter") {
    val p = plan("layout_dynamic_pruning")
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(2000))
  }

  test("Theil-Sen: the pair enumeration joins the DAILY rollups — " +
    "partial aggregation sits below the self-join on both sides") {
    val p = plan("mon_theil_sen")
    val aggIdx = p.indexOf("partial_sum")
    assert(aggIdx >= 0, p.take(1500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("catalog-wide: no unpartitioned window over a non-aggregated " +
    "input — a global single-partition sort is only ever allowed on a " +
    "grain-reduced frame (an aggregate / value-domain rollup / driver-" +
    "local list), never on raw row grain, in EVERY catalog query") {
    import org.apache.spark.sql.execution.{LocalTableScanExec, RDDScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec

    // tree walk that sees THROUGH caches, reuse markers and AQE
    // wrappers — a persistOnce'd rollup must still count as aggregated
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(nodes)
    // grain-reduced = every path from here down hits an aggregation or
    // a driver-local leaf before any file scan; joins/explodes OVER
    // such frames stay bounded by rollup-domain products, which is the
    // accepted aggregate-grain window regime
    def grainReduced(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case _: LocalTableScanExec => true
      case _: RDDScanExec => true
      // a GLOBAL limit bounds the frame to k rows at any scale (local
      // limits don't — they're per-partition and partitions ∝ data)
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case other =>
        val c = kids(other); c.nonEmpty && c.forall(grainReduced)
    }
    val offending = QueryCatalog.all.flatMap { q =>
      try {
        nodes(q.fn(spark, sf0001).queryExecution.sparkPlan).collectFirst {
          case w: WindowExec
            if w.partitionSpec.isEmpty && !w.children.forall(grainReduced) =>
            q.name
        }
      } catch {
        case e: Throwable =>
          Some(s"${q.name} (plan build failed: ${e.getClass.getSimpleName})")
      }
    }
    assert(offending.isEmpty,
      s"row-grain global windows in: ${offending.mkString(", ")}")
  }

  test("join_cidr_lookup: LPM is a broadcast HASH join on the exploded " +
    "(len, prefix) keys — no nested-loop theta join anywhere") {
    val p = plan("join_cidr_lookup")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // a 1-row Cross BNLJ is the accepted scalar-glue shape; any OTHER
    // BroadcastNestedLoopJoin means the LPM fell back to a theta join
    assert(!"BroadcastNestedLoopJoin(?![^\\n]*Cross)".r
      .findFirstIn(p).isDefined, p.take(1200))
  }

  test("agg_abc_classification: the part-grain cumulative window is " +
    "PARTITIONED BY bucket (the two-phase sweep), and the persisted " +
    "part rollup is reused across its four consumers") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    val df = QueryCatalog.byName("agg_abc_classification").fn(spark, sf0001)
    val sp = df.queryExecution.sparkPlan
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p.children ++ p.subqueries
      p +: kids.flatMap(nodes)
    }
    val windows = nodes(sp).collect { case w: WindowExec => w }
    // the part-grain sweep window keys on bucket; the only other
    // window (the O(buckets) carry) runs on the 8-row bucket rollup
    assert(windows.exists(w => w.partitionSpec.exists(
      _.toString.contains("bucket"))),
      s"no bucket-partitioned window:\n${sp.toString.take(1200)}")
    val planStr = sp.toString
    assert("InMemoryTableScan".r.findAllIn(planStr).size >= 2,
      "part rollup not served from the persisted copy:\n" +
        planStr.take(1200))
  }
}
