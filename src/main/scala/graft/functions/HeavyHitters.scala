package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a mergeable typed `Aggregator`
  * (SURVEY §2.10 aggregate-UDF surface; the frequent-items companion to
  * the HLL/bitmap distinct sketches).
  *
  * Contract (Misra-Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): a capacity-`c` sketch over a
  * stream of `n` items returns a candidate set of at most `c` keys
  * that is a SUPERSET of every key with true frequency > n/(c+1).
  * Candidate counts are undercounts (by at most n/(c+1)), so the
  * 100 TB pattern is two-pass: the sketch prunes an unbounded key
  * domain down to ≤ c candidates in one scan with O(c) state per
  * partition, then an exact count confirms candidates — a semi-join
  * against a ≤ c-element broadcast set, never a full GROUP BY over
  * the whole domain.
  *
  * Why not plain `groupBy(key).count()`: at 100 TB the key domain
  * (URLs, n-grams, user ids) can be billions — the full aggregation
  * shuffles the whole domain to find the handful of hot keys. The
  * sketch's shuffle volume is ≤ c (key, count) pairs per map
  * partition, independent of domain size.
  *
  * Determinism: the candidate SET is run-shape dependent (partitioning
  * changes which low-frequency keys survive), but the superset
  * guarantee is unconditional — so sketch→exact-confirm→threshold
  * produces exactly the keys with freq > n/(c+1), identical to a full
  * exact aggregation. `agg_heavy_hitters` hash-oracles that identity.
  */
object HeavyHitters {

  /** Buffer: key → decremented count, size ≤ capacity. */
  final class MisraGriesAgg(capacity: Int)
      extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
    require(capacity > 0, "capacity must be positive")

    override def zero: Map[Long, Long] = Map.empty

    override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < capacity => b.updated(key, 1L)
        case None =>
          // decrement-all: every tracked count -1, drop zeros. O(c).
          b.iterator.flatMap { case (k, c) =>
            if (c > 1) Some(k -> (c - 1)) else None
          }.toMap
      }

    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
      val combined = y.foldLeft(x) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (combined.size <= capacity) combined
      else {
        // subtract the (capacity+1)-th largest count from all, drop ≤0 —
        // the offset each survivor's error grows by, keeping the
        // n/(c+1) bound additive across merges.
        val d = combined.valuesIterator.toArray.sortBy(-_)(Ordering.Long)(capacity)
        combined.iterator.flatMap { case (k, c) =>
          if (c > d) Some(k -> (c - d)) else None
        }.toMap
      }
    }

    override def finish(b: Map[Long, Long]): Seq[Long] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[Long, Long]] =
      ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `heavyHitterCandidates(c)(col("key"))` → sorted
    * `array<bigint>` of ≤ c candidate keys (superset of all keys with
    * frequency > n/(c+1)). */
  def heavyHitterCandidates(capacity: Int): Column => Column =
    key => udaf(new MisraGriesAgg(capacity), ExpressionEncoder[Long]()).apply(key)
}
