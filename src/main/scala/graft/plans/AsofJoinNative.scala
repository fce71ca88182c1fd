package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native sort-merge AS-OF join — the SURVEY §2.10 preference-(c) path
  * exercised end-to-end: a custom `LogicalPlan` node, a
  * `SparkStrategy`, and a `SparkPlan` with declared distribution +
  * ordering requirements, registered through
  * `SparkSessionExtensions` / `experimental.extraStrategies`.
  *
  * Semantics: for every left row, attach the right row with the same
  * key nearest in time under `direction` — `backward` (newest right
  * <= left time, the default), `forward` (earliest right >= left
  * time) or `nearest` (closer of the two, distance ties preferring
  * backward — pandas merge_asof contract), each under an optional
  * `tolerance` — the full contract of
  * [[graft.operators.AsofJoin]]'s union+window composition, served by
  * the SAME single merge pass: the backward candidate is the per-key
  * newest consumed right row, the forward candidate is simply the
  * next BUFFERED right row, so directions cost nothing extra (the
  * composition needs a second descending window for `nearest`). The
  * composition stays the repo's default. This operator exists
  * because the composition has one structural cost the planner cannot
  * remove: the right side's payload travels through the union and the
  * window sort as NULL-padded columns on every LEFT row too. The
  * native exec instead declares
  *   - `requiredChildDistribution` = clustered by key on each side
  *     (EnsureRequirements co-partitions both shuffles, exactly as it
  *     does for SortMergeJoin), and
  *   - `requiredChildOrdering` = (key, time) ascending per side,
  * then streams BOTH sorted iterators through a single forward merge
  * pass per partition: O(|L| + |R|) time, O(1) state (one buffered
  * right row per key), zero unioned null padding, and the sorts are
  * per-side so each sorts narrower rows. Same exchange count as the
  * composition; strictly less sorted volume.
  *
  * Null semantics: null left keys/times never match; null right
  * keys/times are skipped (they can match nothing) — both asserted in
  * `AsofJoinNativeSpec`, which also pins parity with the composed
  * operator on the real fixture under multiple partitionings.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None,
    mode: String = "merge") extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, dir, tol, mode) =>
      // "auto" picks broadcast exactly the way the planner picks
      // BroadcastHashJoin: right-side size estimate under the session's
      // autoBroadcastJoinThreshold (-1 disables, same knob)
      val useBroadcast = mode == "broadcast" || (mode == "auto" && {
        val threshold = org.apache.spark.sql.internal.SQLConf.get
          .autoBroadcastJoinThreshold
        threshold > 0 && r.stats.sizeInBytes <= threshold
      })
      val exec =
        if (useBroadcast)
          BroadcastAsofJoinExec(planLater(l), planLater(r),
            lk, rk, lt, rt, dir, tol)
        else
          AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol)
      exec :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String, tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    // 0 = backward, 1 = forward, 2 = nearest (resolved once, not per row)
    val dirCode = direction match {
      case "backward" => 0
      case "forward" => 1
      case "nearest" => 2
    }
    val tol = tolerance
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rWidth = rOut.size
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val lp = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rp = UnsafeProjection.create(Seq(rk, rt), rOut)
      // right-side refs FORCED nullable: binding the output attrs
      // against the (non-nullable) child attrs would read the null
      // payload row as zeros — the classic outer-join pitfall
      val outProj = UnsafeProjection.create(
        (lOut.map(a => (a.dataType, a.nullable)) ++
          rOut.map(a => (a.dataType, true))).zipWithIndex.map {
          case ((dt, nullable), i) =>
            org.apache.spark.sql.catalyst.expressions
              .BoundReference(i, dt, nullable)
        })
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // one buffered right row (the next not-yet-consumed one) + the
      // newest right row already passed for the CURRENT key
      var rRow: InternalRow = null
      var rKey: Any = null
      var rTime: Any = null
      def advanceR(): Unit = {
        rRow = null
        while (rRow == null && ri.hasNext) {
          val raw = ri.next()
          val kv = rp(raw).copy() // stable copy of (key, time)
          val k = kv.get(0, keyType)
          val t = kv.get(1, timeType)
          if (k != null && t != null) { // null right keys/times match nothing
            rRow = raw.copy(); rKey = k; rTime = t
          }
        }
      }
      advanceR()
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null
      var lastMatchTime: Any = null
      // distance arithmetic for tolerance/nearest: every supported
      // time type's physical value is a Number (timestamp micros,
      // long, int, date days) — enforced by the apply() entry point
      def num(v: Any): Long = v.asInstanceOf[Number].longValue
      li.map { lRaw =>
        val lkv = lp(lRaw)
        val lKey = lkv.get(0, keyType)
        val lTime = lkv.get(1, timeType)
        if (lKey == null || lTime == null) {
          joined(lRaw, nullRight)
        } else {
          // consume right rows before (lKey, lTime); remember the
          // newest one PER KEY (an older key's match must not leak).
          // Forward keeps an equal-time right row BUFFERED (it is the
          // forward candidate); backward/nearest consume it (it is the
          // backward candidate, and nearest's distance-0 tie prefers
          // backward anyway).
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
          while (rRow != null && (cmp < 0 || (cmp == 0 && {
              val tc = timeOrd.compare(rTime, lTime)
              if (dirCode == 1) tc < 0 else tc <= 0
            }))) {
            if (cmp == 0) {
              lastMatch = rRow; lastMatchKey = rKey; lastMatchTime = rTime
            }
            advanceR()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lKey)
          }
          val backHit = dirCode != 1 && lastMatch != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0 &&
            tol.forall(t => num(lTime) - num(lastMatchTime) <= t)
          val fwdHit = dirCode != 0 && rRow != null &&
            keyOrd.compare(rKey, lKey) == 0 &&
            tol.forall(t => num(rTime) - num(lTime) <= t)
          val chosen =
            if (backHit && fwdHit) {
              // nearest: closer wins, ties prefer backward (pandas
              // merge_asof nearest contract)
              if (num(lTime) - num(lastMatchTime) <= num(rTime) - num(lTime))
                lastMatch
              else rRow
            } else if (backHit) lastMatch
            else if (fwdHit) rRow
            else nullRight
          joined(lRaw, chosen)
        }
        outProj(joined)
      }
    }
  }
}

/** Broadcast AS-OF join — the dimension-history enrichment shape at
  * 100 TB: when the versioned right side is broadcast-sized (rate
  * tables, policy histories, config timelines), the fact side should
  * be touched ONCE, map-side. The merge exec above still clusters +
  * sorts BOTH sides; this exec instead declares
  *   - left: `UnspecifiedDistribution` — the fact side keeps its
  *     upstream partitioning (NO exchange, NO sort on the 100-TB side),
  *   - right: `BroadcastDistribution(IdentityBroadcastMode)` — one
  *     broadcast of the raw rows,
  * and each task builds a per-key time-sorted index from the broadcast
  * once, then binary-searches every left row: O(|L| log |R_k|) with
  * zero shuffles. Same direction/tolerance contract as
  * [[AsofJoinExec]] (backward/forward/nearest, ties prefer backward,
  * null keys/times never match) — pinned against the composed operator
  * in `AsofJoinNativeSpec`.
  */
case class BroadcastAsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    direction: String, tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the headline property: the fact side's partitioning/ordering
  // survive the join, so downstream keyed ops reuse them
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val dirCode = direction match {
      case "backward" => 0
      case "forward" => 1
      case "nearest" => 2
    }
    val tol = tolerance
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rWidth = rOut.size
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ li =>
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val lp = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rp = UnsafeProjection.create(Seq(rk, rt), rOut)
      // per-key time-sorted candidate arrays, built once per task from
      // the broadcast (the array is broadcast-sized by contract)
      val index = new java.util.HashMap[Any, (Array[Any], Array[InternalRow])]
      locally {
        val byKey =
          new java.util.HashMap[Any, java.util.ArrayList[(Any, InternalRow)]]
        broadcastRows.value.foreach { raw =>
          val kv = rp(raw).copy()
          val k = kv.get(0, keyType)
          val t = kv.get(1, timeType)
          if (k != null && t != null) { // null right keys/times match nothing
            var lst = byKey.get(k)
            if (lst == null) {
              lst = new java.util.ArrayList[(Any, InternalRow)]
              byKey.put(k, lst)
            }
            lst.add((t, raw.copy()))
          }
        }
        byKey.forEach { (k, lst) =>
          val arr = lst.toArray(new Array[(Any, InternalRow)](lst.size))
          java.util.Arrays.sort(arr,
            (a: (Any, InternalRow), b: (Any, InternalRow)) =>
              timeOrd.compare(a._1, b._1))
          index.put(k, (arr.map(_._1), arr.map(_._2)))
        }
      }
      val outProj = UnsafeProjection.create(
        (lOut.map(a => (a.dataType, a.nullable)) ++
          rOut.map(a => (a.dataType, true))).zipWithIndex.map {
          case ((dt, nullable), i) =>
            org.apache.spark.sql.catalyst.expressions
              .BoundReference(i, dt, nullable)
        })
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      def num(v: Any): Long = v.asInstanceOf[Number].longValue
      li.map { lRaw =>
        val lkv = lp(lRaw)
        val lKey = lkv.get(0, keyType)
        val lTime = lkv.get(1, timeType)
        val cand = if (lKey == null || lTime == null) null else index.get(lKey)
        if (cand == null) {
          joined(lRaw, nullRight)
        } else {
          val (times, rows) = cand
          // two binary searches: lo = first index with time >= lTime
          // (the forward candidate — FIRST among equal times, matching
          // the merge exec's buffered-row contract), hi = first index
          // with time > lTime (so hi-1 is the backward candidate —
          // LAST among equal times, the merge exec's newest-consumed)
          var a = 0; var b = times.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (timeOrd.compare(times(m), lTime) < 0) a = m + 1 else b = m
          }
          val lo = a
          var b2 = times.length
          while (a < b2) {
            val m = (a + b2) >>> 1
            if (timeOrd.compare(times(m), lTime) <= 0) a = m + 1 else b2 = m
          }
          val hi = a
          val fwdIdx = lo
          val backHit = dirCode != 1 && hi > 0 &&
            tol.forall(t => num(lTime) - num(times(hi - 1)) <= t)
          val fwdHit = dirCode != 0 && fwdIdx < times.length &&
            tol.forall(t => num(times(fwdIdx)) - num(lTime) <= t)
          val chosen =
            if (backHit && fwdHit) {
              if (num(lTime) - num(times(hi - 1)) <=
                  num(times(fwdIdx)) - num(lTime)) rows(hi - 1)
              else rows(fwdIdx)
            } else if (backHit) rows(hi - 1)
            else if (fwdHit) rows(fwdIdx)
            else nullRight
          joined(lRaw, chosen)
        }
        outProj(joined)
      }
    }, preservesPartitioning = true)
  }
}

/** Filter pushdown through [[AsofJoinNode]] — Catalyst's own
  * PushDownPredicates cannot see through a custom node, so without
  * this rule a `WHERE` on fact columns evaluates ABOVE the join: the
  * full fact side is exchanged/sorted (merge mode) or probed
  * (broadcast mode) first, and scan-level pushdown (PushedFilters /
  * partition pruning — the difference between reading 100 TB and
  * reading a slice) never fires. The as-of join emits exactly one row
  * per left row (left-outer enrichment), so any deterministic
  * predicate over LEFT columns commutes with the join and MOVES below
  * the left side.
  *
  * Three RIGHT-side pushes are also sound — each only ever removes
  * right rows that cannot be the served candidate of any surviving
  * left row, so they are COPIES (derived constraints), with the
  * original predicate staying where it was:
  *
  *  1. Left-KEY predicates transpose to the right key: a match needs
  *     key equality, so a right row failing the transposed predicate
  *     could only match a left row that the left push already removed.
  *     Sound for ANY deterministic conjunct over the left key alone.
  *  2. Right-KEY predicates (from above the join) copy below when
  *     NULL-INTOLERANT (comparison/IN shapes): the match candidates of
  *     a left row share one key, so they all pass or all fail — a
  *     failing group's left rows got a null match before and keep a
  *     null match after, and the kept-above copy (evaluating to null)
  *     drops them both ways. A null-TOLERANT predicate (e.g.
  *     `r.key IS NULL OR …`) must NOT push: removing the failing
  *     candidates would turn a dropped row into a kept null-match row.
  *  3. Left-TIME bounds transpose with direction-aware widening: a
  *     backward match needs rt <= lt, so `lt <= U` implies the served
  *     row has `rt <= U`; the opposite bound needs the tolerance to
  *     close it (`lt >= T` implies `rt >= T - tol` only because rows
  *     further back than tol can't match). Forward is symmetric;
  *     nearest needs the tolerance for BOTH bounds; a strict bound
  *     stays strict only when unwidened. Time filters that don't fit
  *     a (attr cmp literal) shape are left alone — at 100 TB this
  *     bound is what prunes a time-partitioned right side.
  */
object AsofJoinPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, BinaryComparison, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  /** Conjuncts already sitting in the right child, for the idempotence
    * guard (this rule runs to fixed point: a COPY that is re-derived
    * every pass must detect it already landed). Looks through the
    * bare-attribute pruning Projects this rule's own column-pruning
    * case inserts — without that, a pruned right side would stack a
    * duplicate Filter above the Project on every pass. */
  private def existingConjuncts(p: LogicalPlan): Seq[Expression] = p match {
    case Filter(c, child) =>
      splitConjunctivePredicates(c) ++ existingConjuncts(child)
    case Project(ps, child)
      if ps.forall(_.isInstanceOf[org.apache.spark.sql.catalyst
        .expressions.AttributeReference]) => existingConjuncts(child)
    case _ => Nil
  }

  /** p with every occurrence of attribute `from` replaced by `to`. */
  private def transpose(p: Expression, from: Attribute,
                        to: Attribute): Expression = p.transform {
    case a: Attribute if a.semanticEquals(from) => to
  }

  /** Null-intolerant single-attribute shapes safe to copy below as a
    * right-key predicate: comparisons and IN over the attr with
    * foldable operands (each evaluates to null/false on a null key,
    * so a no-candidate left row is dropped identically above). */
  private def nullIntolerantKeyShape(p: Expression, key: Attribute): Boolean =
    p match {
      case b: BinaryComparison if !b.isInstanceOf[EqualNullSafe] =>
        (b.left.semanticEquals(key) && b.right.foldable) ||
          (b.right.semanticEquals(key) && b.left.foldable)
      case In(v, list) => v.semanticEquals(key) && list.forall(_.foldable)
      case InSet(v, _) => v.semanticEquals(key)
      case _ => false
    }

  /** Derived right-time bound from one left-time conjunct, or None.
    * `tol` is in the time column's own physical units (micros). */
  private def timeBound(p: Expression, lt: Attribute, rt: Attribute,
                        direction: String,
                        tol: Option[Long]): Option[Expression] = {
    // normalize to (isUpper, isStrict, literal) over the left time attr
    val norm: Option[(Boolean, Boolean, Literal)] = p match {
      case LessThan(a, l) if a.semanticEquals(lt) && l.foldable =>
        Some((true, true, Literal.create(l.eval(), l.dataType)))
      case LessThanOrEqual(a, l) if a.semanticEquals(lt) && l.foldable =>
        Some((true, false, Literal.create(l.eval(), l.dataType)))
      case GreaterThan(l, a) if a.semanticEquals(lt) && l.foldable =>
        Some((true, true, Literal.create(l.eval(), l.dataType)))
      case GreaterThanOrEqual(l, a) if a.semanticEquals(lt) && l.foldable =>
        Some((true, false, Literal.create(l.eval(), l.dataType)))
      case GreaterThan(a, l) if a.semanticEquals(lt) && l.foldable =>
        Some((false, true, Literal.create(l.eval(), l.dataType)))
      case GreaterThanOrEqual(a, l) if a.semanticEquals(lt) && l.foldable =>
        Some((false, false, Literal.create(l.eval(), l.dataType)))
      case LessThan(l, a) if a.semanticEquals(lt) && l.foldable =>
        Some((false, true, Literal.create(l.eval(), l.dataType)))
      case LessThanOrEqual(l, a) if a.semanticEquals(lt) && l.foldable =>
        Some((false, false, Literal.create(l.eval(), l.dataType)))
      case _ => None
    }
    def shifted(l: Literal, by: Long): Option[Literal] = l.value match {
      case v: Long => Some(Literal(v + by, l.dataType))
      case _ => None // tolerance implies a micros-physical (Long) column
    }
    norm.flatMap { case (isUpper, isStrict, lit0) =>
      if (lit0.value == null) None
      else {
        // which side of the bound closes WITHOUT tolerance?
        //   backward: rt <= lt  -> upper bound transposes directly
        //   forward:  rt >= lt  -> lower bound transposes directly
        // the other side (and both for nearest) needs tol widening
        val direct = (direction, isUpper) match {
          case ("backward", true) | ("forward", false) => Some(lit0)
          case _ => None
        }
        val viaTol = tol.flatMap(t =>
          shifted(lit0, if (isUpper) t else -t))
        direct.map((_, isStrict))
          .orElse(viaTol.map((_, false))) // widened bounds lose strictness
          .map { case (l, strict) =>
            if (isUpper) { if (strict) LessThan(rt, l) else LessThanOrEqual(rt, l) }
            else { if (strict) GreaterThan(rt, l) else GreaterThanOrEqual(rt, l) }
          }
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsofJoinNode) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (push, keep) = conjuncts
        .partition(p =>
          p.references.subsetOf(j.left.outputSet) && p.deterministic)
      // derived right-side constraints (COPIES — nothing leaves `keep`)
      def refsOnly(p: Expression, a: Attribute): Boolean =
        p.references.nonEmpty && p.references.subsetOf(AttributeSet(Seq(a)))
      val rightCopies: Seq[Expression] =
        (j.leftKey, j.rightKey, j.leftTime, j.rightTime) match {
          case (lk: Attribute, rk: Attribute, lt: Attribute, rt: Attribute) =>
            conjuncts.filter(_.deterministic).flatMap { p =>
              if (refsOnly(p, lk)) Some(transpose(p, lk, rk)) // class 1
              else if (refsOnly(p, rk) && nullIntolerantKeyShape(p, rk))
                Some(p) // class 2
              else if (refsOnly(p, lt))
                timeBound(p, lt, rt, j.direction, j.tolerance) // class 3
              else None
            }
          case _ => Nil
        }
      val already = existingConjuncts(j.right)
      val newCopies = rightCopies.filterNot(c =>
        already.exists(_.semanticEquals(c)))
      if (push.isEmpty && newCopies.isEmpty) f
      else {
        val newLeft = push.reduceOption(And)
          .map(Filter(_, j.left)).getOrElse(j.left)
        val newRight = newCopies.reduceOption(And)
          .map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
    // Column pruning — the other thing Catalyst can't do through a
    // custom node: a Project above the join keeps only some payload
    // columns, but without this rewrite BOTH scans still read every
    // column (ReadSchema stays wide). The node's output is defined
    // from its children, so inserting child Projects restricted to
    // (referenced ++ key/time) attributes shrinks the node output and
    // the scans in one move; the parent Project's attributes survive
    // untouched.
    case p @ Project(projList, j: AsofJoinNode) =>
      val needed = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.rightKey, j.leftTime, j.rightTime)
          .flatMap(_.references))
      def prune(side: LogicalPlan): LogicalPlan =
        if (side.output.forall(needed.contains)) side
        else Project(side.output.filter(needed.contains), side)
      val (nl, nr) = (prune(j.left), prune(j.right))
      if ((nl eq j.left) && (nr eq j.right)) p
      else Project(projList, j.copy(left = nl, right = nr))
  }
}

/** DataFrame-level entry point; registers the strategy on the session
  * (idempotent) so plain sessions work without a rebuild. */
object AsofJoinNative {
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsofJoinPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofJoinPushdown
  }

  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String,
            rightPayload: Seq[String],
            direction: String = "backward",
            toleranceSec: Option[Long] = None,
            mode: String = "merge"): DataFrame = {
    require(Set("merge", "broadcast", "auto")(mode), s"unknown mode '$mode'")
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side column '$n' not in ${p.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(lPlan, leftKey, "left"), attr(rPlan, rightKey, "right"))
    val (lt, rt) = (attr(lPlan, leftTime, "left"), attr(rPlan, rightTime, "right"))
    require(lk.dataType == rk.dataType,
      s"key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"time types differ: ${lt.dataType} vs ${rt.dataType} — cast first")
    // two slices of the SAME DataFrame share attribute exprIds; the
    // node output would then contain duplicates and the payload select
    // would silently resolve to the LEFT side's column — reject and
    // tell the caller to break the lineage
    val shared = lPlan.outputSet.intersect(rPlan.outputSet)
    require(shared.isEmpty,
      s"left and right share attribute ids (${shared.mkString(", ")}) — " +
        "re-alias one side (e.g. .select(cols.map(c => col(c).as(c)))) " +
        "or use toDF to break shared lineage")
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown direction '$direction'")
    val isTs = lt.dataType == org.apache.spark.sql.types.TimestampType ||
      lt.dataType == org.apache.spark.sql.types.TimestampNTZType
    require(toleranceSec.isEmpty || isTs,
      "toleranceSec needs a timestamp time column (micros) — cast first")
    val numericPhysical = isTs ||
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.DateType)(lt.dataType)
    require(direction != "nearest" || numericPhysical,
      "nearest needs a numeric-physical time column for distances")
    val node = AsofJoinNode(lPlan, rPlan, lk, rk, lt, rt,
      direction, toleranceSec.map(_ * 1000000L), mode)
    // select by resolved attribute (exprId), not by name — the raw
    // output keeps the whole right row and may repeat left names
    val keep = lPlan.output ++
      rightPayload.map(n => attr(rPlan, n, "payload").withNullability(true))
    GraftPlanBridge.ofRows(spark, node)
      .select(keep.map(a =>
        org.apache.spark.sql.GraftColumnBridge.column(a)): _*)
  }
}
