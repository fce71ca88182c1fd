package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Normalized physical-plan skeleton for drift pinning.
  *
  * PLANS.md's audits are prose; a silent plan flip (broadcast→SMJ
  * after a threshold nudge, a lost partial aggregate, an extra
  * exchange) would surface only as a bench mystery. This renders the
  * scale-relevant SHAPE of a plan — joins with their strategy,
  * exchanges with their partitioning kind, aggregate modes, sorts,
  * windows, limits, scans — as a stable indented tree, so
  * `PlanFingerprintSpec` can diff today's plan against a committed
  * fingerprint and fail on drift with both trees printed.
  *
  * Normalizations for stability:
  *   - the ADAPTIVE wrapper is unwrapped to its initialPlan (runtime
  *     re-plans depend on observed sizes, the initial plan only on
  *     the query + optimizer — and the initial shape is the one that
  *     holds at scale);
  *   - Project/Filter/codegen wrappers are elided (column-level detail
  *     churns on refactors that don't change the scale shape; filter
  *     pushdown is separately guarded by PlanAuditSpec);
  *   - InMemoryTableScan descends transparently into the cached plan
  *     (the shared test session caches rollups across suites — NOTES
  *     order-fragility rule — so cached vs uncached must render the
  *     same skeleton);
  *   - exchange partition COUNTS are omitted (they track the session
  *     conf, not the plan shape); partitioning kind and key count are
  *     kept.
  */
object PlanFingerprint {

  def of(df: DataFrame): String = render(df.queryExecution.executedPlan)

  def render(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      def emit(label: String, kids: Seq[SparkPlan]): Unit = {
        sb.append("  " * depth).append(label).append('\n')
        kids.foreach(walk(_, depth + 1))
      }
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.initialPlan, depth)
        case s: InMemoryTableScanExec => walk(s.relation.cachedPlan, depth)
        case r: ReusedExchangeExec => emit("ReusedExchange", Nil)
        case w: WholeStageCodegenExec => walk(w.child, depth)
        case i: InputAdapter => walk(i.child, depth)
        case pr: ProjectExec => walk(pr.child, depth)
        case f: FilterExec => walk(f.child, depth)
        // columnar<->row adapters appear/disappear with caching and
        // codegen boundaries — physical detail, not plan shape
        case c: ColumnarToRowExec => walk(c.child, depth)
        case c: RowToColumnarExec => walk(c.child, depth)
        case e: ShuffleExchangeExec =>
          val part = e.outputPartitioning match {
            case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
              s"hash[${h.expressions.length}]"
            case r: org.apache.spark.sql.catalyst.plans.physical.RangePartitioning =>
              s"range[${r.ordering.length}]"
            case _: org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning =>
              "roundrobin"
            case org.apache.spark.sql.catalyst.plans.physical.SinglePartition =>
              "single"
            case other => other.getClass.getSimpleName
          }
          emit(s"Exchange($part)", e.children)
        case b: BroadcastExchangeExec => emit("BroadcastExchange", b.children)
        case j: BroadcastHashJoinExec =>
          emit(s"BroadcastHashJoin(${j.joinType},${j.buildSide})", j.children)
        case j: SortMergeJoinExec =>
          emit(s"SortMergeJoin(${j.joinType})", j.children)
        case j: ShuffledHashJoinExec =>
          emit(s"ShuffledHashJoin(${j.joinType},${j.buildSide})", j.children)
        case j: BroadcastNestedLoopJoinExec =>
          emit(s"BroadcastNestedLoopJoin(${j.joinType})", j.children)
        case j: CartesianProductExec => emit("CartesianProduct", j.children)
        case a: BaseAggregateExec =>
          val modes = a.aggregateExpressions.map(_.mode).distinct
            .map(_.toString.toLowerCase).sorted.mkString("+")
          val m = if (modes.isEmpty) "keysonly" else modes
          emit(s"${a.getClass.getSimpleName.stripSuffix("Exec")}" +
            s"($m,keys=${a.groupingExpressions.length})", a.children)
        case s: SortExec =>
          emit(s"Sort(${if (s.global) "global" else "local"})", s.children)
        case w: WindowExec => emit("Window", w.children)
        case w: WindowGroupLimitExec => emit("WindowGroupLimit", w.children)
        case e: ExpandExec => emit("Expand", e.children)
        case g: GenerateExec => emit("Generate", g.children)
        case t: TakeOrderedAndProjectExec => emit("TakeOrdered", t.children)
        case l: GlobalLimitExec => emit("GlobalLimit", l.children)
        case l: LocalLimitExec => emit("LocalLimit", l.children)
        case l: CollectLimitExec => emit("CollectLimit", l.children)
        case _: LocalTableScanExec => emit("LocalScan", Nil)
        case _: RDDScanExec => emit("RDDScan", Nil)
        case s: FileSourceScanExec => emit("Scan", Nil)
        case u: UnionExec => emit("Union", u.children)
        case other =>
          emit(other.getClass.getSimpleName.stripSuffix("Exec"),
            other.children)
      }
    }
    walk(plan, 0)
    sb.toString
  }
}
