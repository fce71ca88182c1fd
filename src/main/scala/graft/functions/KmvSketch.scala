package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values, a.k.a. bottom-k) distinct sketch as a
  * mergeable typed `Aggregator` (SURVEY §2.10 aggregate-UDF surface) —
  * the DETERMINISTIC member of the distinct-sketch family (HLL's
  * estimate is engine/implementation specific; the KMV sketch is a
  * pure function of the key set and the hash, so two engines agree
  * BITWISE on the sketch and therefore on the estimate).
  *
  * Contract (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007):
  * keep the k smallest distinct (hash, key) pairs of the key stream.
  * With hashes uniform on [0, 2^32), the unbiased estimate of the
  * distinct count is (k-1) * 2^32 / h_k where h_k is the k-th smallest
  * hash; when fewer than k distinct keys exist the sketch IS the key
  * set and the exact size is returned. Sketches are mergeable (union =
  * bottom-k of the concatenation), which unlocks the theta-sketch set
  * algebra: for sets A, B the union sketch's elements that lie in both
  * A's and B's sketches estimate |A∩B| as (c/k) * est(A∪B) — every
  * element of the union sketch below a member set's own threshold is
  * guaranteed present in that member's sketch, so the membership test
  * is exact on sketch elements.
  *
  * Why this beats `countDistinct` at 100 TB: exact distinct shuffles
  * the whole key domain per group; the KMV buffer is ≤ k (hash, key)
  * pairs per group per map partition — O(k) state, O(k) wire — and
  * the partials merge associatively, so one pass yields per-partition
  * sketches whose union answers ANY later rollup (union, intersection,
  * Jaccard) without re-scanning the data.
  *
  * Determinism: the buffer holds (hash, key) sorted by (hash, key)
  * ascending, deduplicated BY KEY (a re-observed key never occupies a
  * second slot; distinct keys that collide on the 32-bit hash both
  * stay, ordered by key). The result is a pure function of the
  * distinct key set — partitioning and arrival order cannot change it,
  * which is what lets a DuckDB oracle replay the sketch exactly.
  */
object KmvSketch {

  final case class HashedKey(h: Long, key: Long)

  /** Sorted-by-(h,key), deduped-by-key, length <= k. k is small so
    * O(k) insertion via sorted merge is fine. */
  final class KmvAggregator(k: Int)
      extends Aggregator[HashedKey, List[HashedKey], Seq[HashedKey]] {
    require(k > 0, "k must be positive")
    private val ord: Ordering[HashedKey] =
      Ordering.by((e: HashedKey) => (e.h, e.key))
    override def zero: List[HashedKey] = Nil
    override def reduce(b: List[HashedKey], a: HashedKey): List[HashedKey] =
      if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b
      else if (b.exists(_.key == a.key)) b
      else ((a :: b).sorted(ord)).take(k)
    override def merge(x: List[HashedKey], y: List[HashedKey]): List[HashedKey] =
      (x ++ y).distinctBy(_.key).sorted(ord).take(k)
    override def finish(b: List[HashedKey]): Seq[HashedKey] = b.sorted(ord)
    override def bufferEncoder: Encoder[List[HashedKey]] =
      ExpressionEncoder[List[HashedKey]]()
    override def outputEncoder: Encoder[Seq[HashedKey]] =
      ExpressionEncoder[Seq[HashedKey]]()
  }

  /** Column form: `kmv(64)(hashCol, keyCol)` in any `groupBy(...).agg`;
    * returns `array<struct<h,key>>` sorted ascending by (h, key). The
    * hash must already be the canonical 32-bit fingerprint (see
    * [[graft.operators.Reconcile.rowFingerprint]]) so oracles can
    * replay it. */
  def kmv(k: Int): (Column, Column) => Column = {
    val fn = udaf(new KmvAggregator(k), ExpressionEncoder[HashedKey]())
    (h, key) => fn.apply(h, key)
  }
}
