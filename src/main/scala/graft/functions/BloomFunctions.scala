package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column-level Bloom-filter surface over Spark's native (codegen'd,
  * Tungsten-buffered) bloom aggregate — the same machinery the
  * optimizer injects for runtime join pruning (`RuntimeFilterSpec`),
  * exposed here as a USER operator for explicit membership pre-filters.
  *
  * The 100 TB pattern this enables: when a membership set is too large
  * to broadcast as a join build side, its bloom BITS (8 bits/item at
  * ~3% fp) still broadcast. A map-side `bloom_might_contain` probe then
  * prunes the big side BEFORE any shuffle, and only the surviving
  * candidates (true hits + the fp tail) pay the exact confirm join.
  * The final result is exactly the confirm join's — the bloom stage
  * can only shrink work, never change answers.
  */
object BloomFunctions {

  /** Aggregate: build a bloom filter over `c` (any type — hashed to
    * long internally). Returns the filter as a binary column. */
  def bloom_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** The bloom bits of [[bloom_agg]] over `df`, delivered as a SCALAR
    * SUBQUERY — the only non-foldable form `BloomFilterMightContain`
    * accepts (a cross-joined attribute fails its type check at
    * analysis). Spark plans the 1-row aggregate as a subquery whose
    * result ships to every probe task, the same mechanism its own
    * injected runtime filters use — the bits never ride a join. */
  def bloom_build(df: DataFrame, c: Column,
      expectedItems: Long, numBits: Long): Column =
    df.agg(bloom_agg(c, expectedItems, numBits)).scalar()

  /** Membership probe against bloom bits from [[bloom_build]] (or any
    * foldable/scalar-subquery binary column). False positives at the
    * configured rate; never false negatives. */
  def bloom_might_contain(bloom: Column, v: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      GraftColumnBridge.expression(bloom),
      GraftColumnBridge.expression(xxhash64(v))))
}
