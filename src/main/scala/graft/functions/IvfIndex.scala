package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SimilarityFunctions.dot

/** IVF (inverted-file) similarity index — the second ANN scale path
  * beside hyperplane LSH: partition vectors into k cells by nearest
  * centroid (Lloyd iterations, all DataFrame ops), then search only the
  * `nprobe` cells closest to the query.
  *
  * Scale shape: build = iterations × (one broadcast of k centroids +
  * one scan with a k-way argmin + one hash-agg keyed by cell); search =
  * scan pruned to probed cells (partition pruning if the index is
  * written partitioned by cell) + TakeOrderedAndProject. No driver-side
  * data beyond the k×dim centroid table.
  */
object IvfIndex {

  final case class Index(assignments: DataFrame, centroids: Array[(Int, Seq[Double])])

  /** Project `out` = L2-normalized `vecCol`. The norm is computed ONCE
    * per row into a temp column — embedded inside the transform lambda
    * it would re-evaluate the O(d) dot product for every element
    * (O(d²) per row). An all-zero vector stays all zeros (norm floored
    * at MIN_NORMAL — same guard as [[SimilarityFunctions.quantize8]])
    * instead of normalizing to null components, which would otherwise
    * sort null scores FIRST in the probe ranking and route the row to
    * arbitrary cells. */
  private def withL2Normalized(df: DataFrame, vecCol: String,
                               out: String): DataFrame =
    df.withColumn("_l2norm", greatest(sqrt(dot(col(vecCol), col(vecCol))),
        lit(java.lang.Double.MIN_NORMAL)))
      .withColumn(out, transform(col(vecCol), x => x.cast("double") / col("_l2norm")))
      .drop("_l2norm")

  // Session-scoped index memo: an IVF index is an OFFLINE artifact —
  // built once over the corpus, then searched many times (the whole
  // point of ANN). Rebuilding per query invocation would benchmark the
  // build, not the search (bench timings for ivf queries therefore
  // measure SEARCH ONLY — recorded in BASELINE.md). SessionMemo evicts
  // entries when the owning session's context stops.
  private val cache = new graft.core.SessionMemo[(String, Int, Int), Index]

  /** [[build]], memoized per (session, corpus key, k, iterations).
    * `corpusKey` must distinguish corpora, not just directories — e.g.
    * append a tag when the caller unions planted rows into the input. */
  def buildCached(spark: SparkSession, corpusKey: String, embeddings: => DataFrame,
                  k: Int, iterations: Int = 3): Index = {
    val idx = cache.getOrElseUpdate(spark, (corpusKey, k, iterations))(
      build(spark, embeddings, k, iterations))
    // a session clearCache() unpersists the artifact's assignments
    // frame behind the memo — re-assert on access (searches over an
    // unpersisted index are correct but rescan, and plan shapes drift).
    // Materialized heal: a persist-only heal leaves estimated stats,
    // which can flip downstream join strategies by suite order.
    graft.core.Caching.persistMaterialized(idx.assignments)
    idx
  }

  /** Nearest-centroid id for a vector column, given a small centroid
    * table rendered as literal arrays (broadcast-by-closure). */
  private def nearestCell(vec: org.apache.spark.sql.Column,
                          centroids: Array[(Int, Seq[Double])]) = {
    val scored = centroids.map { case (cid, c) =>
      struct(dot(vec, array(c.map(lit): _*)).as("score"), lit(cid).as("cid"))
    }
    greatest(scored.toSeq: _*).getField("cid")
  }

  /** Build with `iterations` Lloyd steps from deterministic seeds (the
    * first k vectors by id). Vectors are L2-normalized up front so dot
    * ordering == cosine ordering. */
  def build(spark: SparkSession, embeddings: DataFrame, k: Int,
            iterations: Int = 3, idCol: String = "vec_id",
            vecCol: String = "embedding"): Index = {
    val norm = graft.core.Caching.persistOnce(
      withL2Normalized(embeddings.select(col(idCol).as("id"), col(vecCol)),
        vecCol, "v").select(col("id"), col("v")))
    var centroids = norm.orderBy("id").limit(k).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iterations) {
      val assigned = norm.withColumn("cell", nearestCell(col("v"), centroids))
      val updated = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("cx"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("dim"), col("cx")))).as("p"))
        .select(col("cell"), transform(col("p"), e => e.getField("cx")).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      if (updated.nonEmpty) centroids = updated
    }
    val assignments = norm.withColumn("cell", nearestCell(col("v"), centroids))
    Index(assignments, centroids)
  }

  /** Batch KNN join routed through the IVF cells: each query vector is
    * assigned to its `nprobe` nearest cells (per-row algebra over the
    * broadcast-by-closure centroid literals — no shuffle), equi-joined
    * with the cell-keyed corpus assignments, and rank-limited to the
    * top-k per query. The scale shape a 100 TB batch KNN needs:
    * candidates per query ∝ nprobe × cell size, never |corpus| — the
    * join is a hash join on `cell`, not a nested-loop over all pairs.
    * Self-matches (same id on both sides) are excluded.
    *
    * A corpus vector lives in exactly ONE cell, so a (query, neighbor)
    * pair is produced at most once — no distinct needed (unlike LSH
    * band joins). Probe order ties break toward the higher cell id,
    * matching [[nearestCell]]'s `greatest`, so a vector's own cell is
    * always its first probe. */
  def knnJoin(index: Index, queries: DataFrame, topK: Int, nprobe: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val qn = withL2Normalized(queries.select(col(idCol).as("qid"), col(vecCol)),
      vecCol, "qv").select(col("qid"), col("qv"))
    val cellScores = array(index.centroids.map { case (cid, c) =>
      struct(dot(col("qv"), array(c.map(lit): _*)).as("score"), lit(cid).as("cid"))
    }.toSeq: _*)
    val probed = qn.withColumn("cell",
      explode(slice(reverse(array_sort(cellScores)), 1, nprobe).getField("cid")))
    // both sides are L2-normalized, so dot == cosine — and stays defined
    // (0.0, not 0/0 = NaN) when the query was the guarded zero vector
    val scored = probed.join(index.assignments, "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        round(dot(col("qv"), col("v")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("nid"), col("score"),
        col("rank").cast("long").as("rank"))
  }

  /** Persist the index as a true offline artifact: assignments written
    * PARTITIONED BY cell — [[search]]'s probed-cell `isin` filter then
    * becomes directory-level partition pruning, so a query reads only
    * its nprobe cells' files out of a 100 TB index — plus the k×dim
    * centroid table (one small file) and the `_STATS` drift sidecar. */
  def save(index: Index, path: String): Unit = {
    val spark = index.assignments.sparkSession
    index.assignments.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/assignments")
    import spark.implicits._
    index.centroids.toSeq.toDF("cell", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    IndexStats.reset(spark, path,
      spark.read.parquet(s"$path/assignments").count())
  }

  /** Append new vectors to a [[save]]d index WITHOUT a rebuild: each
    * vector is assigned to its nearest existing centroid (per-row
    * algebra over the broadcast-by-closure centroid literals — no
    * shuffle) and appended to that cell's partition dir, so the next
    * partition-pruned search sees it immediately. Centroids do NOT
    * move — so recall degrades as the live distribution drifts from the
    * build-time centroids. The `_STATS` sidecar tracks the appended
    * fraction as the drift proxy ([[appendedFraction]]); past a
    * threshold, [[appendOrRebuild]] folds everything into fresh
    * centroids. Append cost stays O(new vectors), never O(index). */
  def append(spark: SparkSession, path: String, vecs: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val idx = load(spark, path)
    val nn = graft.core.Caching.persistOnce(
      withL2Normalized(vecs.select(col(idCol).as("id"), col(vecCol)),
        vecCol, "v").select(col("id"), col("v")))
    val n = nn.count() // O(batch): drives the drift stats
    nn.withColumn("cell", nearestCell(col("v"), idx.centroids))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/assignments")
    IndexStats.recordAppend(spark, path, n)
  }

  /** Appended fraction of the saved index — the drift proxy: appends
    * route through FROZEN centroids, so the larger the appended share,
    * the further the centroid layout lags the live distribution. */
  def appendedFraction(spark: SparkSession, path: String): Double =
    IndexStats.read(spark, path) match {
      case Some((base, appended)) if base + appended > 0 =>
        appended.toDouble / (base + appended)
      case _ => 0.0
    }

  /** [[append]], then REBUILD when the appended fraction trips
    * `threshold`: all stored vectors (already normalized) re-cluster
    * into fresh centroids and the artifact is rewritten — recall
    * recovers because the new centroids cover the drifted distribution.
    * Returns true iff a rebuild ran. Amortized cost: at threshold 0.5 a
    * rebuild runs once per index doubling, so the O(index) fold
    * amortizes to O(1) per appended vector — the classic LSM/ANN
    * maintenance trade. Run it from the ingest path, or set a high
    * threshold and schedule [[build]]+[[save]] in a maintenance window. */
  def appendOrRebuild(spark: SparkSession, path: String, vecs: DataFrame,
                      k: Int, threshold: Double = 0.5, iterations: Int = 3,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Boolean = {
    append(spark, path, vecs, idCol, vecCol)
    if (appendedFraction(spark, path) <= threshold) false
    else {
      val all = load(spark, path).assignments
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val rebuilt = build(spark, all, k, iterations)
      // stage the rewrite next to the index, then swap dirs: a crash
      // mid-rebuild leaves the old artifact intact
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

  /** Load a [[save]]d index. The assignments frame stays lazy — nothing
    * is scanned until a search prunes to its probed cells. */
  def load(spark: SparkSession, path: String): Index = {
    val assignments = spark.read.parquet(s"$path/assignments")
      .select(col("id"), col("v"), col("cell").cast("int").as("cell"))
    val centroids = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    Index(assignments, centroids)
  }

  /** `_STATS` drift sidecar shared by the saved ANN artifacts
    * ([[IvfIndex]], [[IvfPq]]): base count at build time + cumulative
    * appended count, rewritten tmp+atomic-rename (single-writer, same
    * discipline as the mirror manifests). */
  private[functions] object IndexStats {
    import org.apache.hadoop.fs.Path

    private def write(spark: SparkSession, path: String, base: Long,
                      appended: Long): Unit = {
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new Path(s"$path/._STATS.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"base:$base\nappended:$appended\n".getBytes("UTF-8"))
      finally out.close()
      val dst = new Path(s"$path/_STATS")
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst)) sys.error(s"stats commit failed for $path")
    }

    /** (base, appended); None for a pre-stats artifact. */
    def read(spark: SparkSession, path: String): Option[(Long, Long)] = {
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new Path(s"$path/_STATS")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        val kv = txt.linesIterator.filter(_.contains(':')).map { l =>
          val Array(k, v) = l.split(':'); k -> v.toLong
        }.toMap
        Some((kv.getOrElse("base", 0L), kv.getOrElse("appended", 0L)))
      }
    }

    def reset(spark: SparkSession, path: String, base: Long): Unit =
      write(spark, path, base, 0L)

    def recordAppend(spark: SparkSession, path: String, n: Long): Unit = {
      val (base, appended) = read(spark, path).getOrElse((0L, 0L))
      write(spark, path, base, appended + n)
    }
  }

  /** Top-k by cosine among the `nprobe` cells nearest the query. */
  def search(index: Index, queryVec: Seq[Double], topK: Int,
             nprobe: Int = 3): DataFrame = {
    val qn = {
      val n = math.max(math.sqrt(queryVec.map(x => x * x).sum),
        java.lang.Double.MIN_NORMAL) // zero query stays zero, not NaN
      queryVec.map(_ / n)
    }
    val probeCells = index.centroids
      .map { case (cid, c) => (cid, c.zip(qn).map { case (a, b) => a * b }.sum) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    val q = array(qn.map(lit): _*)
    index.assignments // normalized × normalized: dot == cosine, NaN-free
      .filter(col("cell").isin(probeCells.toSeq: _*))
      .select(col("id").as("vec_id"), round(dot(col("v"), q), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(topK)
  }
}
