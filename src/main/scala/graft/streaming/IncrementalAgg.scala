package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cdc.Envelope

/** Incremental maintenance of grouped COUNT/SUM/MIN/MAX aggregates from
  * a CDC change stream — delta maintenance of a materialized view.
  *
  * Each change event contributes signed deltas derived from its images
  * (reference emits before-images in binlog row mode,
  * register-mysql-connector.json:4-12):
  *
  *   op c/r : +1 count, +after.vals   (insert / snapshot read)
  *   op u   : +after.vals AND -before.vals — if the update moves the
  *            row between groups this naturally emits -1 on the old
  *            group and +1 on the new one
  *   op d   : -1 count, -before.vals
  *
  * The per-batch deltas hash-aggregate to ONE row per touched group
  * (map-side combine), then merge into the running state keyed by
  * group. Per-batch cost is ∝ groups touched, NOT mirror size — at
  * 100 TB this is the difference between an O(batch) update and
  * re-scanning the whole mirror per trigger.
  *
  * Semantics and limits (classic view-maintenance theory):
  *   - COUNT/SUM (and read-time AVG = sum/count) are self-maintainable
  *     given before-images. MIN/MAX are NOT under deletes (a retracted
  *     extremum needs the runner-up) — [[merge]] handles them with a
  *     dirty-group recompute against the post-batch mirror.
  *   - Delta application is NOT idempotent: replaying a batch
  *     double-counts. Run it inside foreachBatch exactly-once (commit
  *     state transactionally with the batchId; skip already-applied
  *     ids on restart) — same discipline CdcPipeline uses for merges.
  *   - Tombstones (null value, no images) contribute nothing: the
  *     op='d' event that precedes them already carried the delete
  *     (Envelope.scala tombstone note).
  */
object IncrementalAgg {

  /** groupCols/sumCols/maxCols/minCols name fields of the row schema
    * carried in the envelope images. `maxCols`/`minCols` maintain
    * per-group extrema — the reference's own integrity probe is
    * `MAX(id)` per table (cdc_data_integrity_dynamic_dag.py:50), here
    * kept continuously instead of re-queried on a cron. Extrema are not
    * self-maintainable under deletes (a retracted max needs the
    * runner-up), so merging flags "dirty" groups — ones whose retracted
    * value could have been the extremum — and recomputes ONLY those
    * from the mirror: O(dirty groups' rows), never a full rescan.
    *
    * `distinctCols` maintain per-group distinct cardinalities as
    * mergeable HLL sketches (`hll_<c>` state columns, KBs per group —
    * see [[IncrementalDistinct]] for the standalone form). Semantics:
    * distinct values EVER WRITTEN (inserts + update after-images) — a
    * sketch cannot retract, so deletes don't decrement and a row that
    * moves groups is counted in both. That is the "users ever active
    * per status" monitor shape, not current-state distinct. */
  final case class Spec(groupCols: Seq[String], sumCols: Seq[String],
                        maxCols: Seq[String] = Nil,
                        minCols: Seq[String] = Nil,
                        distinctCols: Seq[String] = Nil)

  /** One maintained extremum: the column it tracks + its direction. */
  private final case class Bound(src: String, isMax: Boolean) {
    val kind: String = if (isMax) "max" else "min"
    val state: String = s"${kind}_$src"
    val ret: String = s"_ret_$state"
    val re: String = s"_re_$state"
    def agg(c: Column): Column = if (isMax) max(c) else min(c)
    /** could the retracted value have been the stored extremum? */
    def dirty: Column = col(ret).isNotNull && (col(state).isNull ||
      (if (isMax) col(ret) >= col(state) else col(ret) <= col(state)))
  }

  private def bounds(spec: Spec): Seq[Bound] =
    spec.maxCols.map(Bound(_, isMax = true)) ++
      spec.minCols.map(Bound(_, isMax = false))

  private def stateCols(spec: Spec): Seq[String] =
    "n_rows" +: (spec.sumCols.map(c => s"sum_$c") ++ bounds(spec).map(_.state) ++
      spec.distinctCols.map(c => s"hll_$c"))

  /** Signed, combined per-group deltas for one parsed envelope batch
    * (output: groupCols ++ n_rows ++ sum columns ++ extremum candidates
    * plus transient `_ret_*` retraction extrema; one row per touched
    * group). */
  def deltas(parsed: DataFrame, spec: Spec): DataFrame = {
    val ok = Envelope.wellFormed(parsed)
      .filter(col("env.payload.op").isNotNull)
    val boundSrcs = (spec.maxCols ++ spec.minCols ++ spec.distinctCols).distinct
    def side(img: String, sign: Int, ops: Seq[String]) =
      ok.filter(col("env.payload.op").isin(ops: _*) &&
          col(s"env.payload.$img").isNotNull)
        .select(
          spec.groupCols.map(g => col(s"env.payload.$img.$g").as(g)) ++
            (lit(sign.toLong).as("_n") +:
              (spec.sumCols.map(c =>
                (col(s"env.payload.$img.$c") * sign).as(s"_s_$c")) ++
                boundSrcs.map(c =>
                  col(s"env.payload.$img.$c").as(s"_m_$c")))): _*)
    val contributions =
      side("after", 1, Seq("c", "r", "u"))
        .unionByName(side("before", -1, Seq("u", "d")))
    val aggs = (sum(col("_n")).as("n_rows") +:
      spec.sumCols.map(c => sum(col(s"_s_$c")).as(s"sum_$c"))) ++
      // inserted-side extremum candidates and retracted-side extrema
      // (for the dirty test) ride the same hash agg — the sign column
      // plays the FILTER clause
      bounds(spec).flatMap(b => Seq(
        b.agg(when(col("_n") === 1, col(s"_m_${b.src}"))).as(b.state),
        b.agg(when(col("_n") === -1, col(s"_m_${b.src}"))).as(b.ret))) ++
      // written-side (sign +1) values sketch per group — deletes and
      // before-images contribute nothing (sketches can't retract)
      spec.distinctCols.map(c =>
        hll_sketch_agg(when(col("_n") === 1, col(s"_m_$c"))).as(s"hll_$c"))
    contributions.groupBy(spec.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta frame into the running state; groups whose row count
    * reaches zero are dropped (their sum residue is definitionally
    * stale). Cost: one shuffle keyed by group over state ∪ delta.
    *
    * With `maxCols`/`minCols`, a group is DIRTY when a retracted value
    * could have been its extremum (≥ the merged max candidate / ≤ the
    * merged min candidate): those groups — and only those — are
    * recomputed from `mirrorRows` (the table's post-batch live rows),
    * semi-joined so the recompute cost is ∝ dirty groups' rows. Passing
    * no mirror with a dirty retraction fails loudly rather than serving
    * a silently-stale extremum. The dirty probe is one driver-side
    * emptiness check on the (tiny, ≤ touched groups) delta frame. */
  def merge(state: DataFrame, delta: DataFrame, spec: Spec,
            mirrorRows: Option[() => DataFrame] = None): DataFrame = {
    val bs = bounds(spec)
    val retCols = bs.map(_.ret)
    def aligned(df: DataFrame) = {
      val withRet = retCols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast(delta.schema(c).dataType)))
      withRet.select((spec.groupCols ++ stateCols(spec) ++ retCols).map(col): _*)
    }
    val aggs = (sum(col("n_rows")).as("n_rows") +:
      spec.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))) ++
      bs.map(b => b.agg(col(b.state)).as(b.state)) ++
      bs.map(b => b.agg(col(b.ret)).as(b.ret)) ++
      // sketch union is register-wise max: associative and idempotent
      spec.distinctCols.map(c => hll_union_agg(col(s"hll_$c")).as(s"hll_$c"))
    val merged = aligned(state).unionByName(aligned(delta))
      .groupBy(spec.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_rows") > 0)
    if (bs.isEmpty) merged
    else {
      val dirty = merged.filter(bs.map(_.dirty).reduce(_ || _))
        .select(spec.groupCols.map(col): _*)
      if (dirty.isEmpty) merged.drop(retCols: _*)
      else {
        val mirror = mirrorRows.getOrElse(sys.error(
          "IncrementalAgg: extremum retraction needs mirrorRows to " +
            s"recompute dirty groups (${bs.map(_.state).mkString(",")})"))()
        val reAggs = bs.map(b => b.agg(col(b.src)).as(b.re))
        val recomputed = mirror
          .join(broadcast(dirty), spec.groupCols, "left_semi")
          .groupBy(spec.groupCols.map(col): _*)
          .agg(reAggs.head, reAggs.tail: _*)
        bs.foldLeft(merged.join(recomputed, spec.groupCols, "left"))((df, b) =>
            df.withColumn(b.state, coalesce(col(b.re), col(b.state)))
              .drop(b.re))
          .drop(retCols: _*)
      }
    }
  }

  /** Convenience: maintain state over a sequence of parsed batches.
    * The final filter keeps the state invariant merge() maintains
    * (no zero-count groups) even in the single-batch case, where a
    * same-batch insert+delete would otherwise leave a phantom group.
    * (Extremum specs need the mirror-backed [[merge]] path instead.) */
  def maintain(batches: Seq[DataFrame], spec: Spec): Option[DataFrame] =
    batches.map(b => deltas(b, spec)).reduceOption((s, d) => merge(s, d, spec))
      .map(_.filter(col("n_rows") > 0))

  /** Read-time derived averages: avg_<c> = sum_<c> / n_rows. */
  def withAverages(state: DataFrame, spec: Spec): DataFrame =
    spec.sumCols.foldLeft(state)((df, c) =>
      df.withColumn(s"avg_$c", col(s"sum_$c") / col("n_rows")))

  /** Read-time distinct estimates from the maintained sketches:
    * distinct_<c> = estimate(hll_<c>); the raw sketch binaries are
    * dropped (they exist to be merged, not read). A group whose every
    * written value was null carries a null sketch → null estimate. */
  def withDistinctEstimates(state: DataFrame, spec: Spec): DataFrame =
    spec.distinctCols.foldLeft(state)((df, c) =>
      df.withColumn(s"distinct_$c",
          when(col(s"hll_$c").isNotNull, hll_sketch_estimate(col(s"hll_$c"))))
        .drop(s"hll_$c"))
}
