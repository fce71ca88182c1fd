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

  test("every oracle references only known tables") {
    val known = graft.core.Tables.all.toSet
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).foreach {
      case (name, sql) =>
        val fromTargets = "(?i)(?:from|join)\\s+([a-z_][a-z0-9_]*)".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val unknown = fromTargets -- known -- Set("recs", "sh", "q", "t")
        assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
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
}
