package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SimilarityFunctions.dot

/** Product quantization (PQ) — the ANN memory-scale path beside IVF
  * cells and hyperplane LSH: split each d-dim vector into `m`
  * subvectors, k-means each subspace into `ksub` centroids, and store a
  * vector as `m` one-byte codes. A 64-dim float32 embedding (256 B)
  * becomes 8 B — a 100 TB embedding corpus's codes fit in ~3 TB, i.e.
  * executor memory across a big cluster, while the float vectors stay
  * on disk for optional exact re-ranking.
  *
  * Search uses asymmetric distance computation (ADC): the query stays
  * un-quantized; a per-subspace lookup table of
  * `||q_j − c||² − ||q_j||² = ||c||² − 2·q_j·c` (the constant term
  * drops — ranking is unchanged) is rendered as m literal arrays, and a
  * row's distance is m `element_at` probes + a sum — all codegen'd
  * column ops, one corpus scan, TakeOrderedAndProject. No shuffle, no
  * UDF, no driver state beyond the m×ksub×(d/m) codebook.
  *
  * Because per-subspace encoding is an argmin over ALL centroids, a
  * vector identical to the query gets the query's own codes and the
  * global minimum ADC distance — exact duplicates are ranked on top by
  * construction, which is what makes `sim_topk_pq` deterministic and
  * hash-checkable against a brute-force SQL oracle even though the
  * codebook itself (double avgs over shuffled partitions) is not
  * bitwise stable.
  *
  * (Same operator class the reference's analytics marts lack entirely;
  * SURVEY §2.10 similarity-search scale path.)
  */
object PqIndex {

  /** codebook(j)(cell) = centroid of subspace j, length d/m. */
  final case class Codebook(m: Int, dsub: Int, ksub: Int,
                            centroids: Array[Array[Array[Double]]])

  // PQ codebooks are offline artifacts like IVF indexes: built once per
  // corpus, searched many times. Memoized per (session, corpus key,
  // m, ksub); evicted when the owning session's context stops.
  private val cache = new graft.core.SessionMemo[(String, Int, Int), Codebook]

  def buildCached(spark: SparkSession, corpusKey: String,
                  embeddings: => DataFrame, m: Int = 8, ksub: Int = 16,
                  iterations: Int = 2): Codebook =
    cache.getOrElseUpdate(spark, (corpusKey, m, ksub))(
      build(spark, embeddings, m, ksub, iterations))

  /** L2-normalize so ADC distance ranking == cosine ranking (same
    * normalization and zero-vector guard as IvfIndex). */
  private def withL2Normalized(df: DataFrame, vecCol: String,
                               out: String): DataFrame =
    df.withColumn("_l2norm", greatest(sqrt(dot(col(vecCol), col(vecCol))),
        lit(java.lang.Double.MIN_NORMAL)))
      .withColumn(out, transform(col(vecCol), x => x.cast("double") / col("_l2norm")))
      .drop("_l2norm")

  /** Argmin-distance cell id for subvector `sv` against one subspace's
    * centroids, as a pure column expression: minimize
    * `||c||² − 2·sv·c` (the ||sv||² term is constant per row). `least`
    * over (dist, cid) structs compares lexicographically, so exact
    * ties break toward the smaller cell id — deterministic. */
  private def nearestCell(sv: Column, cents: Array[Array[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, cid) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2d) * dot(sv, array(c.map(lit).toSeq: _*)))
        .as("d"), lit(cid).as("cid"))
    }
    least(scored.toSeq: _*).getField("cid")
  }

  /** Lloyd build, all subspaces trained in one DataFrame pass per
    * iteration: explode rows into (subspace j, subvector), assign each
    * to its nearest cell, re-average per (j, cell, dim). Seeds are the
    * first `ksub` vectors by id — deterministic. The stats collected
    * per iteration are m×ksub×(d/m) = d×ksub doubles (the full
    * codebook), never row data. */
  def build(spark: SparkSession, embeddings: DataFrame, m: Int = 8,
            ksub: Int = 16, iterations: Int = 2, idCol: String = "vec_id",
            vecCol: String = "embedding"): Codebook = {
    val d0 = embeddings.select(size(col(vecCol))).head().getInt(0)
    require(d0 % m == 0, s"dim $d0 not divisible by m=$m")
    val dsub = d0 / m

    val norm = graft.core.Caching.persistOnce(
      withL2Normalized(embeddings.select(col(idCol).as("id"), col(vecCol)),
        vecCol, "v").select(col("id"), col("v")))

    def sliceOf(v: Column, j: Int): Column = slice(v, j * dsub + 1, dsub)

    val seedRows = norm.orderBy("id").limit(ksub).collect()
    // a corpus smaller than ksub would seed short per-subspace centroid
    // arrays while Codebook.ksub still reports the requested value —
    // load() would then reconstruct a different codebook than the cache
    // key claims. Fail loudly, mirroring the d % m == 0 require.
    require(seedRows.length == ksub,
      s"corpus has ${seedRows.length} vectors; PQ seeding needs >= ksub=$ksub")
    var cb: Array[Array[Array[Double]]] =
      seedRows.zipWithIndex.map {
        case (r, c) => (c, r.getSeq[Double](1)) } match {
        case seeds => Array.tabulate(m) { j =>
          seeds.map { case (_, v) =>
            v.slice(j * dsub, j * dsub + dsub).toArray }
        }
      }

    val sub = norm.select(col("id"), explode(array((0 until m).map(j =>
      struct(lit(j).as("j"), sliceOf(col("v"), j).as("sv"))): _*)).as("e"))
      .select(col("e.j").as("j"), col("e.sv").as("sv"))

    for (_ <- 1 to iterations) {
      val cellExpr = (1 until m).foldLeft(
        when(col("j") === 0, nearestCell(col("sv"), cb(0)))) { (acc, j) =>
        acc.when(col("j") === j, nearestCell(col("sv"), cb(j)))
      }
      val updated = sub.withColumn("cell", cellExpr)
        .select(col("j"), col("cell"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("j", "cell", "dim").agg(avg("x").as("cx"))
        .groupBy("j", "cell")
        .agg(sort_array(collect_list(struct(col("dim"), col("cx")))).as("p"))
        .select(col("j"), col("cell"),
          transform(col("p"), e => e.getField("cx")).as("c"))
        .collect()
      val next = cb.map(_.map(identity)) // keep old centroid for empty cells
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
      }
      cb = next
    }
    Codebook(m, dsub, ksub, cb)
  }

  /** Append `out` = array<tinyint> of the row's m PQ codes. */
  def encode(df: DataFrame, cb: Codebook, vecCol: String = "embedding",
             out: String = "pq"): DataFrame = {
    val normed = withL2Normalized(df, vecCol, "_pqv")
    val codes = array((0 until cb.m).map { j =>
      nearestCell(slice(col("_pqv"), j * cb.dsub + 1, cb.dsub), cb.centroids(j))
        .cast("tinyint")
    }: _*)
    normed.withColumn(out, codes).drop("_pqv")
  }

  /** ADC top-k: smallest Σ_j lut_j(code_j) where lut_j(c) =
    * ||c||² − 2·q_j·c over the normalized query. One scan of the codes
    * column; each row costs m element_at probes. */
  def adcTopK(encoded: DataFrame, cb: Codebook, queryVec: Seq[Double],
              k: Int, idCol: String = "vec_id",
              codeCol: String = "pq"): DataFrame = {
    val qn = {
      val n = math.max(math.sqrt(queryVec.map(x => x * x).sum),
        java.lang.Double.MIN_NORMAL)
      queryVec.map(_ / n)
    }
    val dist = (0 until cb.m).map { j =>
      val qj = qn.slice(j * cb.dsub, j * cb.dsub + cb.dsub)
      val lut = cb.centroids(j).map { c =>
        c.map(x => x * x).sum - 2d * c.zip(qj).map { case (x, q) => x * q }.sum
      }
      element_at(array(lut.map(lit).toSeq: _*),
        col(codeCol).getItem(j).cast("int") + 1)
    }.reduce(_ + _)
    encoded.select(col(idCol), dist.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol))
      .limit(k)
  }
}
