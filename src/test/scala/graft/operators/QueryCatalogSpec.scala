package graft.operators

import graft.SparkSpec

/** t1 smoke: every catalog query runs on sf0.001 and produces rows with
  * the declared shape. Value-level checks are the driver's DuckDB oracle
  * (t2); this guards against queries that break outright. */
class QueryCatalogSpec extends SparkSpec {

  // queries whose result can legitimately be empty at tiny scale
  private val mayBeEmpty = Set("sim_near_dup_pairs", "dedup_minhash_lsh_pairs",
    "dedup_simhash_near_pairs", "mon_alert_fanin", "dedup_jaccard_pairs")

  test("catalog names are unique") {
    val names = QueryCatalog.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle references only known tables or its own CTE/subquery aliases") {
    val known = graft.core.Tables.all.toSet
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).foreach {
      case (name, sql) =>
        // `AS MATERIALIZED (` is DuckDB's explicit-materialization CTE
        // form (required for chained unrolled-step oracles, NOTES.md)
        val ctes = "(?i)(?:with(?:\\s+recursive)?|,)\\s*([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_,\\s]*\\))?\\s+as\\s*(?:materialized\\s*)?\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val aliases = "(?i)\\)\\s*([a-z_][a-z0-9_]*)".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        // (?<!distinct ) keeps "IS [NOT] DISTINCT FROM <column>" out of
        // the table-reference matches
        // (?<![a-z_]) keeps column names ending in "from"/"join"
        // (valid_from ROWS ...) from matching as keywords
        val fromTargets = "(?i)(?:(?<!distinct )(?<![a-z_])from|(?<![a-z_])join)\\s+([a-z_][a-z0-9_]*)".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        // "IS NOT DISTINCT FROM NULL" etc. match the from-regex; they
        // are keywords, not tables
        // "lateral" precedes a subquery in JOIN LATERAL (...)
        val keywords = Set("null", "unnest", "generate_series", "values",
          "lateral")
        val unknown = fromTargets -- known -- ctes -- aliases -- keywords
        assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
        // pure-literal oracles (VALUES fixtures, e.g. probe bodies) read
        // no table at all — only flag oracles that read NOTHING
        assert(fromTargets.intersect(known).nonEmpty ||
          (fromTargets -- keywords -- ctes -- aliases).isEmpty,
          s"$name oracle reads no known table")
    }
  }

  QueryCatalog.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry() returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct is within 5% of exact") {
    val r = QueryCatalog.byName("agg_approx_distinct").fn(spark, sf0001).head()
    assert(r.getAs[Long]("exact_parts") > 0)
    assert(r.getAs[Boolean]("within_5pct"),
      s"HLL++ estimate drifted beyond 5% of exact: $r")
  }
}
