package graft.plans

import graft.SparkSpec
import graft.operators.QueryCatalog

/** Catalog-wide integer-overflow gate (see [[OverflowAudit]]).
  *
  * The one recurring silent-wrong-at-scale class: a `long × long`
  * product whose operands descend from n-scaling integral sums/counts
  * (bit twice — the Welch/TOST moment wrap at sf0.1, the
  * Kruskal-Wallis rank cube). This spec walks EVERY catalog query's
  * analyzed plan and requires each such product site to be either
  *   - WIDENED — DECIMAL accumulation (exact to 1e38) or a
  *     double-of-exact-longs product (same IEEE chain on both
  *     engines, never wraps) — in which case the site disappears
  *     from the audit; or
  *   - ANNOTATED below, with the binding magnitude and the wrap
  *     margin, so the headroom is a committed claim instead of a
  *     silent assumption.
  *
  * A NEW query that introduces an unannotated long×long product of
  * aggregated magnitudes fails this spec with the offending sites
  * printed. Editing a query so its site count changes forces a
  * re-review of the entry here.
  *
  * Margin vocabulary used in the annotations (n = input rows of the
  * driving table at the given sf; sf1 of this fixture ≈ 1.5e6 orders /
  * 6e6 lineitems / 1e6 events / 5e4 docs):
  *   - CONST(k): sum × literal k — wraps at sum ≈ 9.2e18/k. Practically
  *     unreachable (cents sums reach 9e16 only near sf1e5 = 100 TB).
  *   - PAIRCNT: product of two disjoint row counts (≤ n each) — wraps
  *     at n ≈ 3e9 (~sf2500 of this fixture). Documented, not silent:
  *     past that the counts must accumulate in DECIMAL.
  *   - GRAIN: operands bounded by a rollup domain that does NOT grow
  *     with corpus size (calendar days/hours, deciles, strata, label
  *     sets, per-entity activity) — margin governed by the domain, not
  *     the corpus.
  *   - The whole family below was EXECUTED GREEN at sf1 (10× the bench
  *     gate; tools/amplify.py data) — CORRECTNESS_sf1.json.
  */
class OverflowAuditSpec extends SparkSpec {

  /** query name -> (expected flagged-site count, margin annotation).
    *
    * Audit v2 (round 12) widened the walker to three classes —
    * `PRODSUM` (long×long of n-scaling sums, the original), `SUMPROD`
    * (integral Sum OVER a product of two non-literal row values:
    * Σx·y accumulates n row-grain products — the exact r9 Welch
    * shape), and `MODWRAP` (long multiply wrapping BEFORE an integral
    * Pmod) — and made integral scalar subqueries carry wideness.
    * Four Σ(value²) moment sites in the welch/tost/power/eb family
    * plus join_asof_broadcast's charge accumulator were DECIMAL-
    * widened rather than annotated (margins of ~sf16–sf90 were inside
    * the 100 TB envelope); the counts below absorb the remaining
    * bounded-summand sites. */
  private val annotated: Map[String, (Int, String)] = Map(
    // ---- contingency / agreement coefficients: PAIRCNT class -------
    "eval_mcnemar" -> (2,
      "(b−c)² of discordant counts: PAIRCNT, wraps |b−c|≈3e9 (~sf2500)"),
    "eval_cohens_kappa" -> (3,
      "margin products ≤ n²: PAIRCNT (~sf2500)"),
    "eval_fleiss_kappa" -> (3, "3n/6n: CONST(6)"),
    "eval_krippendorff_alpha" -> (6,
      "3N-item terms: CONST(6) linear + one (2P)(3N−P) PAIRCNT (~sf2500)"),
    "eval_cochrans_q" -> (8,
      "per-rater margin squares ≤ n²: PAIRCNT (~sf2500)"),
    "quality_srm_check" -> (1, "(a−b)² of arm counts: PAIRCNT (~sf2500)"),
    "quality_chi_square" -> (3,
      "row×col margin products ≤ n²: PAIRCNT (~sf2500); dof terms GRAIN"),
    "quality_capture_recapture" -> (2,
      "n1·n2 list sizes: PAIRCNT (~sf2500)"),
    "quality_disparate_impact" -> (5,
      "sel×group-n cross products ≤ n²: PAIRCNT; ×1e9 scaling CONST " +
        "wraps sel≈9e9 (~sf9000)"),
    "eval_conformal_coverage" -> (6,
      "y·n_groups and 9(ncal+1): y is a 0/1 indicator — CONST class"),
    "eval_pr_curve" -> (1, "2·tp: CONST(2)"),
    "eval_auc_brier" -> (9,
      "rank2 ≤ 2n over the ≤1001-point score domain: pos·rank2 ≤ 2n² " +
        "PAIRCNT (~sf2500); (s−1000)² GRAIN (score domain)"),

    // ---- rank/nonparametric tests (post-widening residue) ----------
    "profile_spearman_corr" -> (14,
      "GRAIN: day-grain rollup — ranks ≤ 2·#days, all moments ≤ " +
        "(2·3650)⁴ ≈ 3e15 even at a 10-year corpus"),
    "profile_kendall_tau" -> (3,
      "GRAIN: sx·sy of day-grain concordance counts ≤ (#days²)² /4"),
    "quality_mann_whitney" -> (1,
      "cum·2 rank doubling: CONST(2); quadratic/cubic terms widened " +
        "to DECIMAL this round"),
    "quality_kruskal_wallis" -> (2,
      "cum·2 rank doubling: CONST(2); rj2/tie-cube widened to DECIMAL"),
    "quality_wilcoxon_signed" -> (2,
      "cum·2 + 2n: CONST(2); w2/tie-cube/n(n+1)(2n+1) widened to " +
        "DECIMAL/double this round"),
    "mon_runs_test" -> (5,
      "GRAIN: n = #days (runs test over the daily direction sequence) " +
        "— n³ ≈ 5e10 at a 10-year corpus"),

    // ---- monitors over calendar rollups: GRAIN class ---------------
    "mon_cusum_drift" -> (4,
      "GRAIN: day-grain counts; 2n·x ≤ 2·#days·daily-max — wraps only " +
        "if one DAY holds 2.1e9 events (~5 PB/day)"),
    "mon_ks_drift" -> (1,
      "na·nb split counts: PAIRCNT (~sf2500)"),
    "mon_seasonal_hours" -> (5,
      "GRAIN: nd=#days ≤ 3650; nd·Σx² wraps at Σx²≈2.5e15 — daily " +
        "counts of 2.6e7 (~60 TB/day) before wrap"),
    "mon_bollinger_bands" -> (4,
      "GRAIN: 7-row window moments of daily counts — wraps at daily " +
        "count ≈ 1.1e9"),
    "mon_autocorrelation" -> (12,
      "GRAIN: day-grain lag moments, n=#days — same envelope as " +
        "mon_seasonal_hours"),
    "mon_theil_sen" -> (7,
      "GRAIN: daily rollup pair slopes — n=#days"),
    "mon_mann_kendall" -> (7,
      "GRAIN: n=#days; n(n−1)(2n+5) ≈ 1e11 at 10 years"),
    "mon_forecast_mase" -> (2,
      "GRAIN: 7-day vs 1-day error sums cross-multiplied — " +
        "Σ|err| wraps at 9e18/7"),
    "mon_changepoint_binseg" -> (2,
      "GRAIN: k·Σ and n·Σk over the day sequence — #days bounded"),
    "mon_dispersion_test" -> (2,
      "GRAIN: c² of per-(day,type) counts — wraps at cell count 3e9"),
    "mon_entropy_anomaly" -> (6,
      "GRAIN: e4 ≤ log2(24)·1e4 ≈ 4.6e4 (rounded-entropy scale is " +
        "data-independent); nd=#days; worst term nd·se2 ≤ 3650²·4.6e4² " +
        "≈ 2.8e16"),
    "mon_drawdown_duration" -> (4,
      "n·cum of day-grain cents cumsum: n=#days ≤ 3650, cum=Σcents — " +
        "wraps at Σcents ≈ 2.5e15 (~sf2500)"),
    "agg_seasonal_index" -> (2, "12·sum: CONST(12)"),

    // ---- text / dedup statistics ------------------------------------
    "text_good_turing" -> (3,
      "r·N_r frequency-of-frequency products: Σr·N_r = corpus tokens " +
        "— linear, CONST class"),
    "text_burrows_delta" -> (10,
      "counts ×1e6 fixed-point: CONST(1e6) wraps at c≈9e12 tokens per " +
        "source; per-source moment products GRAIN (#sources bounded)"),
    "dedup_blocking_quality" -> (1,
      "n(n−1) block-pair count: PAIRCNT per block (~sf2500 if one " +
        "block holds the corpus — the blocking-quality query EXISTS to " +
        "flag that)"),
    "dedup_fellegi_sunter" -> (9,
      "c(c−1)/n(n−1) agree-pair counts: PAIRCNT (~sf2500)"),
    "dedup_fs_decision" -> (9,
      "c(c−1)/n(n−1) agree-pair counts: PAIRCNT (~sf2500) — same " +
        "u-probability rollups as dedup_fellegi_sunter"),
    "dedup_fs_em" -> (30,
      "EM weights ≤ 1e6 × group counts: CONST(1e6), wraps at n≈9e12"),

    // ---- pipeline / sampling / layout advisors ----------------------
    "sample_neyman_allocation" -> (4,
      "nh(nh−1) per-stratum: PAIRCNT (~sf2500 per stratum)"),
    "pipeline_token_budget_split" -> (2,
      "token cumsum ×10: CONST(10), wraps at 9e17 corpus tokens"),
    "profile_encoding_advisor" -> (2, "×10 advisor scores: CONST(10)"),
    "pipeline_length_buckets" -> (5,
      "×8 bucket mapping CONST(8); n_chars·cnt and len·n_docs " +
        "PAIRCNT-style, wraps ≈ 3e9·3e9 (~sf2500)"),
    "pipeline_quantile_normalize" -> (2,
      "j(n−1)/2(nl−1) quantile interpolation: PAIRCNT on value-domain " +
        "sizes (~sf2500 of DISTINCT values — far beyond row sf2500)"),
    "agg_promo_share" -> (1, "cents ×100: CONST(100), wraps Σ≈9e16"),
    "agg_penny_allocation" -> (2,
      "GRAIN: per-order cents products ≤ (order total)² ≈ 5e14 — " +
        "order size does not grow with corpus"),
    "agg_abc_classification" -> (3,
      "cum·100 / total·80/95: CONST(100), wraps Σcents≈9e16 (~sf1e5)"),
    "agg_heavy_hitters" -> (1, "cnt·16: CONST(16)"),
    "agg_rfm_segments" -> (3,
      "4·cumsum (one stacked pipeline since r14) + ×200 score " +
        "scaling: CONST(200)"),
    "agg_eb_shrinkage" -> (2,
      "per-group n²: PAIRCNT per group (~sf2500)"),
    "agg_weighted_median" -> (1, "cum·2: CONST(2)"),
    "sketch_ams_joinsize" -> (3,
      "AMS counters |x|,|y| ≤ n: PAIRCNT (~sf2500); sketch estimate " +
        "variance dominates long before the wrap"),
    "profile_join_cardinality" -> (2,
      "GRAIN: per-key count products — per-key fan-in does not grow " +
        "with corpus under the fixture's key model (est. output only)"),
    "events_bot_score" -> (6,
      "GRAIN: per-user gap moments — per-user activity bounded, user " +
        "count carries the scale"),
    "quality_cuped_effect" -> (8,
      "GRAIN: per-user pre/post value sums — per-user bounded; the " +
        "cross-moment n·Σxy is over the USER rollup (PAIRCNT ~sf2500 " +
        "of users)"),
    "layout_compaction_plan" -> (1, "count·64: CONST(64)"),
    "layout_overlap_depth" -> (2,
      "depth·len: GRAIN (file-count × key-range, layout metadata)"),
    "layout_partition_advisor" -> (4,
      "max_bytes·n_partitions: GRAIN (advisor output over file stats)"),
    "layout_vacuum_plan" -> (1, "count·64: CONST(64)"),
    "recon_strata_estimator" -> (1,
      "d_i·2^(s+1): CONST(2^strata), strata ≤ 16 — wraps at d≈1e13"),

    // ---- graph ------------------------------------------------------
    "graph_local_clustering" -> (2,
      "dg(dg−1) degree pairs: PAIRCNT on max degree (~3e9 neighbors)"),
    "graph_triangle_count" -> (3,
      "dg(dg−1) + 6·triangles: same envelope"),
    "graph_assortativity" -> (7,
      "degree moment products over the EDGE rollup: degrees ≤ 3e9 " +
        "before wrap (PAIRCNT)"),
    "graph_label_propagation" -> (7,
      "(2³¹−c)·2³¹ label packing: CONST(2³¹) by construction — c < 2³¹ " +
        "labels, packed key < 2⁶²"),
    "graph_shortest_paths" -> (1, "dist·8: CONST(8)"),

    // ---- audit-v2 additions (SUMPROD class, bounded summands) -------
    "eval_cronbach_alpha" -> (4,
      "SUMPROD of 0/1 item indicators and their ≤3 total: summand ≤ 9 " +
        "— linear in n, wraps at n ≈ 1e18 docs"),
    "quality_simpson_reversal" -> (2,
      "SUMPROD of key-derived domains (x ≤ 26, |y| ≤ 60): summand ≤ " +
        "1.6e3 — linear, wraps at n ≈ 6e15; the n·Σxy numerators are " +
        "already DECIMAL-widened"))

  test("catalog-wide: every long×long product of n-scaling sums/counts " +
    "is either widened to decimal/double or carries a committed margin " +
    "annotation — no silent wrap headroom") {
    val failures = QueryCatalog.all.flatMap { q =>
      val sites =
        try OverflowAudit.audit(q.fn(spark, sf0001))
        catch { case e: Throwable => Seq(s"BUILD FAILED: ${e.getMessage}") }
      val expected = annotated.get(q.name).map(_._1).getOrElse(0)
      if (sites.length != expected)
        Some(s"${q.name}: ${sites.length} flagged site(s), " +
          s"$expected annotated\n    " + sites.mkString("\n    "))
      else None
    }
    assert(failures.isEmpty,
      s"\nunannotated long-product sites (widen to DECIMAL/double or " +
        s"annotate in OverflowAuditSpec):\n${failures.mkString("\n")}")
  }

  test("audit v2 detects each hazard class on synthetic plans " +
    "(positive detection, not just catalog absence)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10).select(col("id").as("x"), (col("id") * 2).as("y"))
    df.createOrReplaceTempView("oa_t")

    // SUMPROD: integral Sum over a product of two non-literal longs
    val sumprod = OverflowAudit.audit(df.agg(sum(col("x") * col("y"))))
    assert(sumprod.exists(_.startsWith("SUMPROD:")), sumprod.toString)
    // ...but Σ(k·x) is the linear CONST class, not flagged
    val sumconst = OverflowAudit.audit(df.agg(sum(col("x") * lit(7L))))
    assert(!sumconst.exists(_.startsWith("SUMPROD:")), sumconst.toString)
    // ...and a DECIMAL-widened product is a fix, not a site
    val widened = OverflowAudit.audit(df.agg(
      sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))))
    assert(widened.isEmpty, widened.toString)

    // MODWRAP: long multiply wrapping before an integral Pmod
    val modwrap = OverflowAudit.audit(
      df.select(pmod(col("x") * col("y"), lit(97L))))
    assert(modwrap.exists(_.startsWith("MODWRAP:")), modwrap.toString)

    // scalar-subquery wideness: (SELECT sum(x)) * col flags PRODSUM
    val sq = OverflowAudit.audit(spark.sql(
      "SELECT (SELECT sum(x) FROM oa_t) * y AS p FROM oa_t"))
    assert(sq.exists(_.startsWith("PRODSUM:")), sq.toString)
  }

  test("annotation table carries no stale entries for queries that no " +
    "longer exist or no longer flag") {
    val known = QueryCatalog.byName.keySet
    val stale = annotated.keys.filterNot(known.contains)
    assert(stale.isEmpty, s"stale annotations: ${stale.mkString(", ")}")
  }
}
