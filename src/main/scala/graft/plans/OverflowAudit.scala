package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Static integer-overflow audit over an analyzed logical plan.
  *
  * The one silent-wrong-at-scale class this engine has actually hit
  * (twice: the Welch/TOST long-moment wrap at sf0.1, the
  * Kruskal-Wallis rank-sum cube) is a `long * long` product whose
  * operands are AGGREGATED magnitudes — sums or counts that grow with
  * the row count n. A product of two such terms is O(n²) (a squared
  * sum is n²·avg², n·Σx² likewise), so headroom that looks huge at a
  * test SF silently evaporates a few SF decades later, while DuckDB's
  * HUGEINT oracle keeps going — the result diverges with no error.
  * Row-grain products (price·qty) and single sums are NOT the class:
  * they stay ≤ O(n·bounded) and long covers any realistic corpus.
  *
  * This walker finds every distinct `Multiply` of LongType whose
  * operand trees contain an integral Sum/Count aggregate (directly, or
  * through attribute lineage across Project/Aggregate/Window/Union
  * boundaries, including window frames and scalar subqueries). Each
  * hit must either carry a documented magnitude-margin annotation in
  * `OverflowAuditSpec`'s table or be rewritten with a double/decimal
  * widening cast before the product (exact below 2^53, and doubles
  * saturate instead of wrapping).
  *
  * Library surface: `OverflowAudit.audit(df)` returns the flagged
  * product sites of any user query, so a pipeline author can gate
  * their own catalog the same way the spec gates this one.
  */
object OverflowAudit {

  private def integral(t: DataType): Boolean = t match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Distinct long×long product sites whose operands descend from an
    * integral Sum/Count, as renderable SQL snippets (canonicalized-
    * deduped, deterministic order). */
  def audit(df: DataFrame): Seq[String] = audit(df.queryExecution.analyzed)

  def audit(root: LogicalPlan): Seq[String] = {
    // exprIds of attributes that carry an n-scaling integral magnitude
    val wide = mutable.Set.empty[ExprId]

    def isWide(e: Expression): Boolean = e.exists {
      case ae: AggregateExpression =>
        integral(ae.dataType) && (ae.aggregateFunction match {
          case _: Sum | _: Count => true
          case _ => false
        })
      case a: AttributeReference => wide.contains(a.exprId)
      case _ => false
    }

    // every plan node, bottom-up, with scalar/exists subquery plans
    // spliced in before the expression that references them
    def plans(p: LogicalPlan): Seq[LogicalPlan] = {
      val subs = p.expressions.flatMap(_.collect {
        case sq: SubqueryExpression => sq.plan
      })
      p.children.flatMap(plans) ++ subs.flatMap(plans) :+ p
    }
    val all = plans(root)

    // lineage pass: propagate wideness through the naming boundaries
    all.foreach {
      case a: Aggregate =>
        a.aggregateExpressions.foreach(ne =>
          if (isWide(ne)) wide += ne.toAttribute.exprId)
      case pr: Project =>
        pr.projectList.foreach(ne =>
          if (isWide(ne)) wide += ne.toAttribute.exprId)
      case w: Window =>
        w.windowExpressions.foreach(ne =>
          if (isWide(ne)) wide += ne.toAttribute.exprId)
      case u: Union =>
        // union output reuses the first child's exprIds; a wide column
        // in ANY branch makes the merged column wide
        u.output.zipWithIndex.foreach { case (attr, i) =>
          if (u.children.exists(c =>
            i < c.output.length && wide.contains(c.output(i).exprId)))
            wide += attr.exprId
        }
      case _ => ()
    }

    // flag pass: every distinct long-typed product with a wide operand
    val sites = mutable.LinkedHashMap.empty[Expression, String]
    def flag(e: Expression): Unit = {
      e match {
        case m: Multiply if m.dataType == LongType &&
            (isWide(m.left) || isWide(m.right)) =>
          sites.getOrElseUpdate(m.canonicalized, m.sql.take(200))
        case _ => ()
      }
      e.children.foreach(flag)
    }
    all.foreach(_.expressions.foreach(flag))
    sites.values.toSeq
  }
}
