package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SimilarityFunctions.dot

/** IVF-PQ: the composed ANN architecture a 100 TB embedding corpus
  * actually deploys — IVF cells prune WHICH vectors are scored
  * (partition pruning to `nprobe` cells), PQ codes shrink WHAT is
  * scored (8-byte codes, ADC lookup tables), and an optional exact
  * re-rank joins the float vectors back for the final top-k only.
  *
  * Cost model per query: read nprobe/k of the code files (directory
  * pruning when saved partitioned by cell), m `element_at` probes per
  * candidate, then an exact-cosine join over `oversample × k` rows —
  * |corpus| never appears in any term. Composes [[IvfIndex]] (routing)
  * and [[PqIndex]] (compression) without new kernels.
  */
object IvfPq {

  /** codes: (id, cell, pq); vectors stay in `ivf.assignments` for the
    * re-rank stage only. */
  final case class Index(codes: DataFrame, ivf: IvfIndex.Index,
                         cb: PqIndex.Codebook)

  private val cache = new graft.core.SessionMemo[(String, Int, Int, Int), Index]

  def buildCached(spark: SparkSession, corpusKey: String,
                  embeddings: => DataFrame, kCells: Int = 16, m: Int = 8,
                  ksub: Int = 16, iterations: Int = 2): Index = {
    val idx = cache.getOrElseUpdate(spark, (corpusKey, kCells, m, ksub))(
      build(spark, embeddings, kCells, m, ksub, iterations))
    // materialized heals (see Caching.persistMaterialized scaladoc)
    graft.core.Caching.persistMaterialized(idx.codes)
    graft.core.Caching.persistMaterialized(idx.ivf.assignments)
    idx
  }

  /** One IVF build (cell routing) + one PQ build (codebooks) + one
    * encode pass over the already-normalized assignments (PQ's own
    * normalization is idempotent on unit vectors). The codes frame is
    * persisted: it is the offline artifact searches scan. */
  def build(spark: SparkSession, embeddings: DataFrame, kCells: Int = 16,
            m: Int = 8, ksub: Int = 16, iterations: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): Index = {
    val ivf = IvfIndex.build(spark, embeddings, kCells, iterations, idCol, vecCol)
    val cb = PqIndex.build(spark, embeddings, m, ksub, iterations, idCol, vecCol)
    val codes = graft.core.Caching.persistOnce(
      PqIndex.encode(ivf.assignments.withColumnRenamed("v", "embedding"),
        cb, vecCol = "embedding", out = "pq")
        .select(col("id"), col("cell"), col("pq")))
    Index(codes, ivf, cb)
  }

  /** Probe cells nearest the query, computed driver-side over the
    * kCells×dim centroid table (same routing as [[IvfIndex.search]]). */
  private def probeCells(idx: Index, qn: Seq[Double], nprobe: Int): Seq[Int] =
    idx.ivf.centroids
      .map { case (cid, c) => (cid, c.zip(qn).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(nprobe).map(_._1).toSeq

  private def normalized(v: Seq[Double]): Seq[Double] = {
    val n = math.max(math.sqrt(v.map(x => x * x).sum),
      java.lang.Double.MIN_NORMAL)
    v.map(_ / n)
  }

  /** ADC top-k over the nprobe nearest cells' codes. */
  def search(idx: Index, queryVec: Seq[Double], topK: Int,
             nprobe: Int = 4): DataFrame = {
    val qn = normalized(queryVec)
    val cand = idx.codes.filter(col("cell")
      .isin(probeCells(idx, qn, nprobe): _*))
    PqIndex.adcTopK(cand, idx.cb, queryVec, topK, idCol = "id")
      .withColumnRenamed("id", "vec_id")
  }

  /** Persist as an offline artifact: codes written PARTITIONED BY cell
    * (search's probed-cell filter becomes directory-level pruning — a
    * query reads nprobe cells' code files out of a 100 TB index), the
    * float assignments via [[IvfIndex.save]] (same partitioning, read
    * only by the re-rank stage for the tiny candidate set), and the
    * codebook flattened to (j, cell, c) rows. */
  def save(idx: Index, path: String): Unit = {
    val spark = idx.codes.sparkSession
    idx.codes.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes")
    IvfIndex.save(idx.ivf, s"$path/ivf")
    import spark.implicits._
    (for {
      (perCell, j) <- idx.cb.centroids.zipWithIndex
      (c, cell) <- perCell.zipWithIndex
    } yield (j, cell, c.toSeq)).toSeq
      .toDF("j", "cell", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** Append new vectors to a [[save]]d index WITHOUT a rebuild: append
    * the float vectors to their IVF cell partitions
    * ([[IvfIndex.append]]), then encode them against the EXISTING
    * codebook and append the codes to the same cell's partition — the
    * next search sees them in both stages. Centroids and codebooks do
    * not move (Lloyd drift needs a periodic build+save), so append cost
    * is O(new vectors), never O(index). */
  def append(spark: SparkSession, path: String, vecs: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    IvfIndex.append(spark, s"$path/ivf", vecs, idCol, vecCol)
    val idx = load(spark, path)
    val assigned = vecs.select(col(idCol).as("id"), col(vecCol))
      .withColumn("cell", {
        // same routing as the saved assignments: nearest centroid of
        // the L2-normalized vector
        val n = greatest(sqrt(dot(col(vecCol), col(vecCol))),
          lit(java.lang.Double.MIN_NORMAL))
        val v = transform(col(vecCol), x => x.cast("double") / n)
        val scored = idx.ivf.centroids.map { case (cid, c) =>
          struct(dot(v, array(c.map(lit).toSeq: _*)).as("score"),
            lit(cid).as("cid"))
        }
        greatest(scored.toSeq: _*).getField("cid")
      })
    PqIndex.encode(assigned, idx.cb, vecCol = vecCol, out = "pq")
      .select(col("id"), col("cell"), col("pq"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Drift proxy, shared with the nested IVF artifact: the fraction of
    * vectors appended through the FROZEN centroids/codebooks since the
    * last build (floats and codes append together, so one counter
    * covers both). */
  def appendedFraction(spark: SparkSession, path: String): Double =
    IvfIndex.appendedFraction(spark, s"$path/ivf")

  /** [[append]], then REBUILD the whole artifact (cells AND codebooks)
    * when the appended fraction trips `threshold` — quantization error
    * drifts with the distribution exactly like cell routing does, so
    * both halves re-train together. Staged-dir swap: a crash
    * mid-rebuild leaves the old artifact intact. Returns true iff a
    * rebuild ran; amortized O(1) per appended vector at threshold 0.5
    * (one O(index) fold per doubling). */
  def appendOrRebuild(spark: SparkSession, path: String, vecs: DataFrame,
                      kCells: Int = 16, m: Int = 8, ksub: Int = 16,
                      threshold: Double = 0.5, iterations: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Boolean = {
    append(spark, path, vecs, idCol, vecCol)
    if (appendedFraction(spark, path) <= threshold) false
    else {
      val all = load(spark, path).ivf.assignments
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val rebuilt = build(spark, all, kCells, m, ksub, iterations)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = s"$path.rebuild"
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
      save(rebuilt, staging)
      val old = new org.apache.hadoop.fs.Path(s"$path.old")
      fs.delete(old, true)
      fs.rename(new org.apache.hadoop.fs.Path(path), old)
      fs.rename(new org.apache.hadoop.fs.Path(staging),
        new org.apache.hadoop.fs.Path(path))
      fs.delete(old, true)
      true
    }
  }

  /** Load a [[save]]d index; the codes frame stays lazy, so nothing is
    * scanned until a search prunes to its probed cells. */
  def load(spark: SparkSession, path: String): Index = {
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("id"), col("cell").cast("int").as("cell"), col("pq"))
    val ivf = IvfIndex.load(spark, s"$path/ivf")
    val rows = spark.read.parquet(s"$path/codebook").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val cents = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach { r =>
      cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    val dsub = cents(0)(0).length
    Index(codes, ivf, PqIndex.Codebook(m, dsub, ksub, cents))
  }

  /** Two-stage search: ADC ranks `oversample × topK` candidates from
    * the probed cells, then ONLY those rows join back to their float
    * vectors (broadcast of the tiny candidate set) for an exact cosine
    * top-k — PQ quantization error cannot reorder the final answer
    * among the candidates it surfaced. */
  def searchReranked(idx: Index, queryVec: Seq[Double], topK: Int,
                     nprobe: Int = 4, oversample: Int = 10): DataFrame = {
    val qn = normalized(queryVec)
    val cand = search(idx, queryVec, topK * oversample, nprobe)
      .select(col("vec_id"))
    val q = array(qn.map(lit): _*)
    idx.ivf.assignments
      .join(broadcast(cand), col("id") === cand("vec_id"))
      .select(col("id").as("vec_id"), round(dot(col("v"), q), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(topK)
  }
}
