package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunker: overlapping windows with stride; short docs get one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),  // 10 tokens
      (2L, (1 to 5).map(i => s"t$i").mkString(" ")))   // 5 tokens
      .toDF("doc_id", "text")
    val chunks = Chunker.chunk(docs, "doc_id", "text", size = 6, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    // starts: 1, 4 (lastStart = 10-5=5 -> starts 1,4)
    assert(d1.map(_.getInt(2)).toSeq == Seq(1, 4))
    assert(d1.head.getString(3) == "w1 w2 w3 w4 w5 w6")
    assert(d1.map(_.getInt(4)).toSeq == Seq(6, 6))
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1)
    assert(d2.head.getString(3) == "t1 t2 t3 t4 t5")
    assert(d2.head.getInt(4) == 5)
  }

  test("IVF search finds a planted duplicate and ranks self first") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0)
    val all = emb.unionByName(
      Seq((9000L, q0, -1)).toDF("vec_id", "embedding", "label"))
    val idx = IvfIndex.build(spark, all, k = 8, iterations = 2)
    val got = IvfIndex.search(idx, q0.map(_.toDouble), topK = 5, nprobe = 2)
      .as[(Long, Double)].collect()
    val ids = got.map(_._1).toSet
    assert(ids.contains(0L) && ids.contains(9000L),
      s"IVF missed query/planted dup: $ids")
    assert(math.abs(got.head._2 - 1.0) < 1e-6)
  }

  test("a zero query vector gets deterministic top-k, not null-score " +
    "probes or NaNs") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val idx = IvfIndex.build(spark, emb, k = 8, iterations = 2)
    val dim = emb.select($"embedding").head().getSeq[Float](0).length

    // batch path: all scores defined (cosine 0 against everything),
    // exactly topK rows — a null-score probe ranking would have routed
    // the row to arbitrary cells or dropped it
    val zq = Seq((999999L, Seq.fill(dim)(0f), -1))
      .toDF("vec_id", "embedding", "label")
    val got = IvfIndex.knnJoin(idx, zq, topK = 3, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect()
    assert(got.length == 3, s"expected 3 neighbors, got ${got.length}")
    assert(got.forall(r => !r._3.isNaN && r._3 == 0.0), got.mkString(","))

    // single-query path: same guarantee
    val single = IvfIndex.search(idx, Seq.fill(dim)(0.0), topK = 3, nprobe = 2)
      .as[(Long, Double)].collect()
    assert(single.length == 3 && single.forall(r => !r._2.isNaN && r._2 == 0.0))
  }

  test("IVF cells are non-degenerate (more than one cell used)") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val idx = IvfIndex.build(spark, emb, k = 8, iterations = 2)
    val nCells = idx.assignments.select("cell").distinct().count()
    assert(nCells > 1, s"k-means collapsed to $nCells cell(s)")
  }

  test("append adds vectors to a saved index without a rebuild; " +
    "searches see them immediately") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString
    IvfIndex.save(IvfIndex.build(spark, emb, k = 8, iterations = 2), dir)

    val before = IvfIndex.search(IvfIndex.load(spark, dir),
      q0.map(_.toDouble), topK = 3, nprobe = 2)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(!before.contains(777777L))

    // append an exact copy of the query vector under a fresh id: it
    // must land in the query's own cell and dominate the next search
    IvfIndex.append(spark, dir,
      Seq((777777L, q0, -1)).toDF("vec_id", "embedding", "label"))
    val after = IvfIndex.search(IvfIndex.load(spark, dir),
      q0.map(_.toDouble), topK = 3, nprobe = 2)
      .as[(Long, Double)].collect()
    assert(after.map(_._1).toSet.contains(777777L),
      s"appended vector invisible to search: ${after.mkString(",")}")
    assert(math.abs(after.head._2 - 1.0) < 1e-6)
    // the original entries are untouched (append, not rewrite)
    assert(after.map(_._1).toSet.intersect(before).nonEmpty)
  }

  test("saved index reloads to identical searches with partition-pruned " +
    "probes") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val built = IvfIndex.build(spark, emb, k = 8, iterations = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    IvfIndex.save(built, dir)
    val loaded = IvfIndex.load(spark, dir)

    assert(loaded.centroids.map(_._1).toSeq == built.centroids.map(_._1).toSeq)
    def run(idx: IvfIndex.Index) =
      IvfIndex.search(idx, q0, topK = 10, nprobe = 3)
        .as[(Long, Double)].collect().toSeq
    assert(run(loaded) == run(built))
    def runJoin(idx: IvfIndex.Index) =
      IvfIndex.knnJoin(idx, emb.filter($"vec_id" < 5), topK = 3, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    assert(runJoin(loaded) == runJoin(built))

    // the offline artifact's payoff: the probed-cell filter prunes to
    // nprobe PARTITION DIRECTORIES — only those cells' files are read
    val plan = IvfIndex.search(loaded, q0, topK = 10, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(1200))
  }
}
