package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of materialized aggregate views for transparent query
  * rewrite (see [[MvRewriteRule]]): each entry claims "`view` holds
  * exactly `GROUP BY groupCols` + `aggs` over the table at
  * `sourcePath`", the claim a warehouse records when it maintains a
  * summary table (here: [[graft.sinks.IncrementalAggView]]'s agg
  * mirror, or any precomputed rollup).
  *
  * Freshness is a FILE-LISTING FINGERPRINT of the source directory
  * (path, length, mtime of every data file, order-insensitive): on an
  * immutable-file data lake any change to the source shows up in its
  * listing, so a stale view simply stops matching and the query falls
  * through to the base table — no wrong answers, only lost
  * acceleration. Re-[[register]] after refreshing the view to resume
  * rewrites. The listing costs one metadata round per candidate
  * rewrite; views front tables that are expensive to AGGREGATE, not
  * expensive to list.
  */
object MvCatalog {

  /** Aggregate key: (function, source column) — `("count", "*")` for
    * `COUNT(*)`/`COUNT(1)`, `("count", "x")` for the non-null count
    * that also licenses the AVG(x) = sum/count derivation. */
  type AggKey = (String, String)

  final case class Entry(
      sourcePath: String, // qualified URI string of the source dir
      groupCols: Seq[String],
      aggs: Map[AggKey, String], // agg key -> view column name
      view: () => DataFrame, // fresh plan per call (fresh exprIds)
      fingerprint: String)

  private val entries = new ConcurrentHashMap[String, Entry]()

  private[plans] def qualify(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString
  }

  /** Order-insensitive signature of the source's current data files. */
  private[plans] def listingFingerprint(spark: SparkSession,
                                        dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "<missing>"
    val it = fs.listFiles(p, true)
    val sigs = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // _SUCCESS / .crc churn is not data change
      if (!name.startsWith("_") && !name.startsWith("."))
        sigs += s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
    }
    sigs.sorted.mkString("\n").hashCode.toString + ":" + sigs.size
  }

  /** Register (or refresh) a view claim. Call again after every view
    * refresh — the fingerprint is captured NOW, so source changes
    * after this call disable the rewrite until the next register. */
  def register(spark: SparkSession, sourceDir: String,
               groupCols: Seq[String], aggs: Map[AggKey, String],
               view: () => DataFrame): Unit = {
    require(groupCols.nonEmpty && aggs.nonEmpty,
      "a materialized view needs group columns and aggregates")
    val q = qualify(spark, sourceDir)
    entries.put(q,
      Entry(q, groupCols, aggs, view, listingFingerprint(spark, sourceDir)))
  }

  def unregister(spark: SparkSession, sourceDir: String): Unit =
    entries.remove(qualify(spark, sourceDir))

  def clear(): Unit = entries.clear()

  private[plans] def isEmpty: Boolean = entries.isEmpty

  /** The entry for a source location, only if its fingerprint still
    * matches the directory's current listing. */
  private[plans] def freshEntry(spark: SparkSession,
                                qualified: String): Option[Entry] =
    Option(entries.get(qualified))
      .filter(e => listingFingerprint(spark, qualified) == e.fingerprint)
}
