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

  /** Sequential-fold dot product of two equal-length arrays, computed in
    * double. Deterministic (array-order association). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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

  /** Random-hyperplane LSH signature: bit j = sign(dot(v, r_j)) where
    * r_j is a deterministic pseudo-random hyperplane derived from
    * xxhash64(seed=j, dimension-index) — reproducible across executors
    * with no broadcast state. */
  def hyperplaneSignature(vec: Column, nBits: Int): Column =
    (0 until nBits).map { j =>
      // pseudo-random ±1 hyperplane component per (bit, dim):
      // sign(xxhash64(j, i)) — derived on the fly, identical everywhere
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            when(xxhash64(lit(j), i).bitwiseAND(lit(1L)) === 0L, 1d).otherwise(-1d)),
        lit(0d), (acc, v) => acc + v)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)

  /** ANN top-k: bucket by hyperplane signature, search only the query's
    * bucket (plus optional multi-probe neighbors at 1-bit distance).
    * Recall/cost trade-off is nBits; candidate set shrinks ~2^nBits-fold.
    */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, queryVec: Seq[Double],
              k: Int, nBits: Int = 8, multiProbe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = array(queryVec.map(lit): _*)
    val bucketed = embeddings.withColumn("bucket",
      hyperplaneSignature(col(vecCol), nBits))
    // query signature, computed the same way on a 1-row frame
    val qSig = spark.range(1)
      .select(hyperplaneSignature(q, nBits).as("qb"))
      .head().getLong(0)
    val probes: Seq[Long] =
      if (multiProbe) qSig +: (0 until nBits).map(b => qSig ^ (1L << b))
      else Seq(qSig)
    bucketed.filter(col("bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: cosine above threshold among LSH
    * bucket collisions (the embedding-space analog of MinHash dedup). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double, nBits: Int = 12,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val sig = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(col(vecCol), nBits).as("bucket"))
    sig.as("l").join(sig.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        round(cosine(col("l.v"), col("r.v")), 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
