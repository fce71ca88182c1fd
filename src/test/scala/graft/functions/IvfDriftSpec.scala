package graft.functions

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Drift-triggered IVF rebuild: appends route through FROZEN centroids,
  * so recall degrades as the live distribution drifts away from the
  * build-time layout — the `_STATS` appended-fraction proxy trips a
  * rebuild and recall recovers. Geometry is engineered so the failure
  * is structural, not statistical: a drifted cluster sits midway
  * between the two stale centroids with members alternating cells, so
  * nprobe=1 finds only half of each vector's true neighbors until the
  * rebuild gives the cluster its own centroid. */
class IvfDriftSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  // base corpus: 100 vectors near e1 (ids 0..99), 100 near e2 (100..199)
  private val cluster1 = (0L until 100L).map(i =>
    i -> normalize(Seq(1.0, 0.001 * (i % 10), 0.0, 0.0)))
  private val cluster2 = (100L until 200L).map(i =>
    i -> normalize(Seq(0.001 * (i % 10), 1.0, 0.0, 0.0)))

  // drifted vectors (drift index i, id 200+i): midway between e1 and
  // e2, ±0.02 asymmetry alternating by parity (even → nearer e1's
  // stale centroid, odd → e2's) and a slowly-advancing third dimension
  // so each vector's true neighbor set mixes BOTH parities
  private def drifted(i: Long): (Long, Seq[Double]) = {
    val s = if (i % 2 == 0) 1.0 else -1.0
    val t = (i / 2).toDouble
    (200L + i) -> normalize(Seq(1.0 + 0.02 * s, 1.0 - 0.02 * s, 0.05 * t, 0.0))
  }
  private val batchA = (0L until 20L).map(drifted) // first drift wave
  private val batchB = (20L until 40L).map(drifted) // trips the rebuild

  private def toVecs(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "embedding")

  private def bruteTop4(corpus: Seq[(Long, Seq[Double])],
                        q: (Long, Seq[Double])): Set[Long] =
    corpus.filterNot(_._1 == q._1)
      .map { case (id, v) =>
        (id, math.BigDecimal(v.zip(q._2).map(p => p._1 * p._2).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1).toSet

  private def ivfTop4(path: String, q: (Long, Seq[Double])): Set[Long] = {
    val idx = IvfIndex.load(spark, path)
    IvfIndex.search(idx, q._2, topK = 5, nprobe = 1)
      .collect().map(_.getLong(0)).filterNot(_ == q._1).take(4).toSet
  }

  private def recall(path: String, corpus: Seq[(Long, Seq[Double])],
                     queries: Seq[(Long, Seq[Double])]): Double =
    queries.map { q =>
      val truth = bruteTop4(corpus, q)
      (ivfTop4(path, q) & truth).size.toDouble / truth.size
    }.sum / queries.size

  test("appends degrade recall under drift; the appended-fraction " +
    "threshold trips an auto-rebuild and recall recovers; append stays " +
    "O(new)") {
    val path = Files.createTempDirectory("ivf-drift").toString + "/idx"
    // hand-built base index: centroids exactly e1/e2, so the drift
    // geometry is deterministic (no Lloyd variance in the premise)
    val centroids = Array(0 -> Seq(1.0, 0.0, 0.0, 0.0),
      1 -> Seq(0.0, 1.0, 0.0, 0.0))
    val assignments = (cluster1.map { case (id, v) => (id, v, 0) } ++
      cluster2.map { case (id, v) => (id, v, 1) }).toDF("id", "v", "cell")
    IvfIndex.save(IvfIndex.Index(assignments, centroids), path)
    assert(IvfIndex.appendedFraction(spark, path) == 0.0)

    // first drift wave appends through the frozen centroids
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles: Map[String, Long] = {
      val it = fs.listFiles(new Path(s"$path/assignments"), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.toString -> f.getModificationTime
      }
      b.result()
    }
    val before = dataFiles
    IvfIndex.append(spark, path, toVecs(batchA))
    val after = dataFiles
    // O(new): every pre-existing file untouched, new files only added
    assert(before.forall { case (f, t) => after.get(f).contains(t) },
      "append must not rewrite existing cell files")
    assert(after.size > before.size)
    val fracA = IvfIndex.appendedFraction(spark, path)
    assert(math.abs(fracA - 20.0 / 220.0) < 1e-9, s"fraction $fracA")

    // drifted queries (interior of wave A): recall through the STALE
    // centroids is structurally broken — each query's cell holds only
    // its own parity, half the true neighbor set
    val corpusPre = cluster1 ++ cluster2 ++ batchA
    val queries = batchA.filter { case (id, _) =>
      val i = id - 200; i >= 6 && i <= 13
    }
    val pre = recall(path, corpusPre, queries)
    assert(pre <= 0.7, s"drift should break nprobe=1 recall, got $pre")

    // second wave trips the threshold: 40/240 = 0.1667 > 0.15
    val rebuilt = IvfIndex.appendOrRebuild(spark, path, toVecs(batchB),
      k = 3, threshold = 0.15, iterations = 4)
    assert(rebuilt, "appended fraction past threshold must rebuild")
    assert(IvfIndex.appendedFraction(spark, path) == 0.0,
      "rebuild resets the drift counter")

    val corpusPost = corpusPre ++ batchB
    val post = recall(path, corpusPost, queries)
    assert(post > pre, s"rebuild must improve recall: $pre -> $post")
    assert(post >= 0.9, s"fresh centroids should restore recall, got $post")
  }

  test("ivf-pq appendOrRebuild shares the drift counter and re-trains " +
    "both cells and codebooks") {
    val path = Files.createTempDirectory("ivfpq-drift").toString + "/idx"
    val base = toVecs(cluster1 ++ cluster2)
    IvfPq.save(IvfPq.build(spark, base, kCells = 2, m = 2, ksub = 16,
      iterations = 2), path)
    assert(IvfPq.appendedFraction(spark, path) == 0.0)

    // below threshold: plain append, no rebuild
    assert(!IvfPq.appendOrRebuild(spark, path, toVecs(batchA),
      kCells = 3, m = 2, ksub = 16, threshold = 0.15))
    val frac = IvfPq.appendedFraction(spark, path)
    assert(math.abs(frac - 20.0 / 220.0) < 1e-9)

    // past threshold: the whole artifact rebuilds and the counter resets
    assert(IvfPq.appendOrRebuild(spark, path, toVecs(batchB),
      kCells = 3, m = 2, ksub = 16, threshold = 0.15))
    assert(IvfPq.appendedFraction(spark, path) == 0.0)
    // rebuilt artifact serves searches over ALL vectors (base + drift)
    val q = drifted(10L)._2
    val hits = IvfPq.searchReranked(IvfPq.load(spark, path), q, topK = 5,
      nprobe = 3).collect().map(_.getLong(0)).toSet
    assert(hits.contains(210L), s"drifted vector must be findable: $hits")
  }
}
