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

  /** Distinct overflow-hazard sites as renderable SQL snippets
    * (canonicalized-deduped, deterministic order), across three
    * classes:
    *   - `PRODSUM:` long×long product whose operands descend from an
    *     integral Sum/Count — O(n²) magnitude (the original class);
    *   - `SUMPROD:` integral Sum over a product of two NON-LITERAL
    *     integral row values — Σ(x·y) accumulates n row-grain
    *     products (the Σcents² moment shape that caused the r9 Welch
    *     wrap; a literal operand is the linear CONST class, k·Σx,
    *     already covered by PRODSUM when it matters);
    *   - `MODWRAP:` integral Pmod whose dividend subtree contains a
    *     long multiply of non-literal (or wide) operands — the
    *     product can wrap BEFORE the mod, silently changing the
    *     residue vs an oracle computing in wider integers
    *     (intentional modular hashing must be annotated as such). */
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
      // an integral scalar subquery returning a Sum/Count IS that
      // aggregate: (SELECT sum(x) FROM t) * col must flag like
      // sum(x) * col (round-11 ADVICE false negative). The subquery
      // plan was walked before the referencing node (see plans()), so
      // its output attr is already in `wide` when lineage reaches us.
      case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
        integral(sq.dataType) &&
          sq.plan.output.headOption.exists(a => wide.contains(a.exprId))
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

    // a per-row integral product both of whose factors are data-driven
    // (non-foldable): the shape whose SUM accumulates n products
    def rowProduct(e: Expression): Boolean = e.exists {
      case m: Multiply => integral(m.dataType) &&
        !m.left.foldable && !m.right.foldable
      case _ => false
    }

    // flag pass over the three hazard classes
    val sites = mutable.LinkedHashMap.empty[(String, Expression), String]
    def put(cls: String, e: Expression): Unit = {
      sites.getOrElseUpdate((cls, e.canonicalized),
        s"$cls: ${e.sql.take(200)}")
      ()
    }
    def flag(e: Expression): Unit = {
      e match {
        case m: Multiply if m.dataType == LongType &&
            (isWide(m.left) || isWide(m.right)) =>
          put("PRODSUM", m)
        case ae: AggregateExpression => ae.aggregateFunction match {
          case s: Sum if integral(s.dataType) && rowProduct(s.child) =>
            put("SUMPROD", ae)
          case _ => ()
        }
        case pm: Pmod if integral(pm.dataType) &&
            (rowProduct(pm.left) || isWide(pm.left)) =>
          put("MODWRAP", pm)
        case _ => ()
      }
      e.children.foreach(flag)
    }
    all.foreach(_.expressions.foreach(flag))
    sites.values.toSeq
  }
}
