package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism contract with the driver's hash compare (sorted rows,
  * columns sorted by name):
  *   - per-row arithmetic is left UNROUNDED — identical IEEE ops in Spark
  *     and DuckDB produce bitwise-identical doubles;
  *   - order-unstable double aggregations (sums of non-integer doubles)
  *     are ROUNDED (1 dp for large money sums, 4 dp for avgs) because the
  *     reduction order differs between engines;
  *   - sums of integer-valued doubles (e.g. l_quantity) are exact in any
  *     order (< 2^53) and stay unrounded;
  *   - every top-k / limit has a unique total order (tie-broken by key).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryCatalog {
  def all: Seq[Q] =
    Relational.queries ++ AdvancedQueries.queries ++ CdcQueries.queries ++
      Monitors.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++
      PipelineQueries.queries ++ RangeJoin.queries ++ CurationQueries.queries ++
      SqlSurface.queries ++ LayoutQueries.queries ++ Expectations.queries ++
      FuzzyJoin.queries ++ GraphQueries.queries ++ Reconcile.queries ++
      StatsQueries.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
