package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — a single scan with a per-row
  * dot product (sequential fold, deterministic) + TakeOrderedAndProject.
  * Scale path: LSH (random-hyperplane) bucketing so candidate generation
  * is an equi-join on bucket signatures instead of an n² cross join.
  */
object SimilarityFunctions {

  /** Sequential dot product of two equal-length arrays, computed in
    * double — the codegen'd [[VecExpressions.vec_dot]] Catalyst
    * expression (tight primitive loop; bitwise-identical to a fold). */
  def dot(a: Column, b: Column): Column = VecExpressions.vec_dot(a, b)

  /** Reference fold formulation (kept for equivalence testing). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass fused cosine (VecCosine codegen expression); bitwise
    * equal to `dot(a,b)/(norm(a)*norm(b))` by construction. */
  def cosine(a: Column, b: Column): Column = VecExpressions.vec_cosine(a, b)

  /** Unfused reference formulation (kept for equivalence testing). */
  def cosineUnfused(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector.
    * Plan shape: broadcast the query vector (it rides inside the closure
    * as a literal array), scan embeddings once, TakeOrderedAndProject —
    * no shuffle of the full score set, only per-partition top-k. */
  def bruteForceTopK(embeddings: DataFrame, queryVec: Seq[Double], k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    embeddings
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Symmetric int8 quantization: q_i = round(x_i / (max|x|/127)) ∈
    * [-127, 127], stored as array<tinyint> — 4× smaller than float32 in
    * memory and on wire, the standard trick that keeps a 100 TB
    * embedding corpus scannable (and cosine is scale-invariant, so
    * quantized cosine needs no dequantization factor). */
  def quantize8(v: Column): Column = {
    // greatest(·, tiny) guards the all-zero vector: an unguarded scale
    // of 0 makes x/s NaN and the tinyint cast silently garbage — here a
    // zero vector quantizes to an explicit all-zero array instead.
    val s = greatest(
      array_max(transform(v, x => abs(x.cast("double")))) / lit(127d),
      lit(java.lang.Double.MIN_NORMAL))
    transform(v, x => round(x.cast("double") / s).cast("tinyint"))
  }

  /** Widen an int8-quantized vector for the double cosine kernel. */
  def dequantize(q: Column): Column = transform(q, x => x.cast("double"))

  /** Random-hyperplane LSH signature: bit j = sign(dot(v, r_j)) where
    * r_j is a deterministic pseudo-random ±1 hyperplane derived from
    * xxhash64(seed, bit, dimension-index) — reproducible across
    * executors with no broadcast state. */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: Int = 0): Column =
    (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            when(xxhash64(lit(seed), lit(j), i).bitwiseAND(lit(1L)) === 0L, 1d)
              .otherwise(-1d)),
        lit(0d), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)

  /** ANN top-k via MULTI-TABLE random-hyperplane LSH: `nTables`
    * independent signatures; a vector is a candidate if it lands in the
    * query's bucket (or a 1-bit-probe neighbor) in ANY table. Collision
    * probability per table is (1-θ/π)^nBits, so recall is tuned with
    * (nBits ↓ selectivity, nTables ↑ recall) — the standard trade.
    * One scan computes all table signatures; the probe filter is a
    * literal OR, so candidates never shuffle. */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, queryVec: Seq[Double],
              k: Int, nBits: Int = 8, nTables: Int = 4, multiProbe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    // query signatures, one driver-side row
    val qSigs = spark.range(1)
      .select((0 until nTables).map(t =>
        hyperplaneSignature(q, nBits, seed = t).as(s"s$t")): _*)
      .head()
    val anyTableMatches = (0 until nTables).map { t =>
      val sig = hyperplaneSignature(col(vecCol), nBits, seed = t)
      val base = qSigs.getLong(t)
      val probes: Seq[Long] =
        if (multiProbe) base +: (0 until nBits).map(b => base ^ (1L << b))
        else Seq(base)
      sig.isin(probes: _*)
    }.reduce(_ || _)
    embeddings.filter(anyTableMatches)
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: cosine above threshold among LSH
    * bucket collisions (the embedding-space analog of MinHash dedup).
    * True near-duplicates (cos ≈ 1) collide with probability
    * (1-θ/π)^nBits ≈ 1, while random pairs are pruned ~2^nBits-fold. */
  def nearDupPairs(embeddings: DataFrame, threshold: Double, nBits: Int = 12,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val sig = graft.core.Caching.persistOnce(
      embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
        hyperplaneSignature(col(vecCol), nBits).as("bucket"))
    ) // both self-join sides reuse one signature pass
    sig.as("l").join(sig.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        round(cosine(col("l.v"), col("r.v")), 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
