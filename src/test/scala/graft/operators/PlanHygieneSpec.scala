package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct,
  GlobalLimit, LocalRelation, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.types.DecimalType

/** Catalog-wide plan-hygiene gates (round 13). One ANALYZED plan per
  * catalog query, shared by every test here — the multi-wave view sims
  * execute real micro-batches at build time, so each extra
  * catalog-build pass costs minutes; add new plan walkers to THIS
  * suite instead of writing another one.
  *
  * Gate 1 — rendering stability. The r12 driver red
  * (`join_asof_broadcast` rows ✓ schema ✓ hash ✗, unreproducible
  * locally at any SF) came from shipping a raw DECIMAL output column:
  * the driver comparator hashes `repr()` of cells and Python `Decimal`
  * repr is EXPONENT-SENSITIVE (`Decimal('3.5E+12')` ≠
  * `Decimal('3500000000000')` as strings while equal as values), so a
  * comparator-side DuckDB/Python version skew can hash-split equal
  * results. Accumulate in DECIMAL, but always SHIP long/double/string.
  *
  * Gate 2 — bounded-domain global windows (VERDICT r12 item 6). A
  * `Window.orderBy` with no partitionSpec executes on ONE task; that
  * is only acceptable when its input is a bounded-domain rollup
  * (calendar days, deciles, distinct cents — O(domain) rows), never
  * row grain. The checked proxy: every partition-less Window's input
  * must descend from an Aggregate / Distinct / global Limit /
  * LocalRelation before reaching a leaf — a planted row-grain global
  * window over a raw table fails (negative case asserted below).
  */
class PlanHygieneSpec extends SparkSpec {

  private lazy val analyzed: Seq[(String, Either[String, LogicalPlan])] =
    QueryCatalog.all.map { q =>
      q.name -> (try Right(q.fn(spark, sf0001).queryExecution.analyzed)
      catch { case e: Throwable => Left(s"BUILD FAILED: ${e.getMessage}") })
    }

  test("no catalog query ships a top-level DECIMAL output column " +
    "(accumulate in DECIMAL, emit long/double/string)") {
    val offenders = analyzed.flatMap {
      case (name, Left(err)) => Some(s"$name: $err")
      case (name, Right(plan)) =>
        val decCols = plan.output
          .collect { case a if a.dataType.isInstanceOf[DecimalType] => a.name }
        if (decCols.nonEmpty) Some(s"$name: ${decCols.mkString(", ")}")
        else None
    }
    assert(offenders.isEmpty,
      s"\nDECIMAL output columns (cast to long/double/string before " +
        s"the final select — comparator Decimal repr is not " +
        s"rendering-stable):\n${offenders.mkString("\n")}")
  }

  /** A partition-less Window input is scale-safe iff something between
    * it and every leaf collapses row grain to a bounded domain. */
  private def boundedBelow(p: LogicalPlan): Boolean = p.exists {
    case _: Aggregate => true
    case _: Distinct => true
    case _: GlobalLimit => true
    case _: LocalRelation => true
    case _ => false
  }

  test("every partition-less Window sits on a bounded-domain rollup " +
    "(Aggregate/Distinct/Limit/LocalRelation beneath), never row grain") {
    val offenders = analyzed.flatMap {
      case (_, Left(_)) => None // build failures surface in gate 1
      case (name, Right(plan)) =>
        val bad = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
            !boundedBelow(w.child) => w
        }
        if (bad.nonEmpty)
          Some(s"$name: ${bad.size} row-grain global window(s)")
        else None
    }
    assert(offenders.isEmpty,
      s"\npartition-less Window over row-grain input (single-task sort " +
        s"of the whole relation at scale — partition it or roll up " +
        s"first):\n${offenders.mkString("\n")}")
  }

  test("the bounded-window gate detects a planted row-grain global " +
    "window (positive detection, not just catalog absence)") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, sf0001, "documents")
    val planted = docs
      .withColumn("rn", row_number().over(W.orderBy(col("doc_id"))))
    val bad = planted.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        !boundedBelow(w.child) => w
    }
    assert(bad.nonEmpty, "planted row-grain global window not detected")
    // ...and the same window AFTER a rollup passes
    val rolled = docs.groupBy(col("lang")).count()
      .withColumn("rn", row_number().over(W.orderBy(col("lang"))))
    val ok = rolled.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        !boundedBelow(w.child) => w
    }
    assert(ok.isEmpty, "bounded-domain rollup window falsely flagged")
  }
}
