package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "another unrelated sentence mentioning kafka topics and debezium envelopes"))
    .toDF("doc_id", "text")

  private val shingled = docs.select($"doc_id",
    array_distinct(TextFunctions.wordShingles($"text", 3)).as("sh"))

  test("exact dedup groups exact duplicates only") {
    val groups = DedupFunctions.exactDupGroups(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 0L)
    assert(groups.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH surfaces the near-dup pair, not unrelated docs") {
    val pairs = DedupFunctions.lshCandidatePairs(shingled, "doc_id", "sh")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 3L)),
      s"expected near/exact dup pair among $pairs")
    assert(!pairs.contains((2L, 4L)), "unrelated docs must not collide")
  }

  test("simhash: identical docs share signature; near-dups within few bits") {
    val sigs = DedupFunctions.simhashSignatures(shingled, "doc_id", "sh")
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L), "exact dups must have equal simhash")
    val hammingNear = java.lang.Long.bitCount(sigs(0L) ^ sigs(1L))
    val hammingFar = java.lang.Long.bitCount(sigs(0L) ^ sigs(2L))
    assert(hammingNear < hammingFar,
      s"near-dup hamming $hammingNear should be < unrelated $hammingFar")
  }

  test("simhash block keys guarantee recall for hamming <= nBlocks-1") {
    // Adversarial placement: the pair differs ONLY inside the TOP 16-bit
    // block (bits 61..63), which defeats a fixed top-16-bit blocking —
    // the 4-rotation scheme must still produce a shared key (pigeonhole
    // over the other three blocks).
    val sigA = 0x0123456789ABCDEFL
    val sigB = sigA ^ (7L << 61) // hamming 3, all in the top block
    val sigs = Seq((0L, sigA), (1L, sigB)).toDF("doc_id", "sig")
    val keys = sigs.select($"doc_id",
      explode(DedupFunctions.simhashBlockKeys($"sig", 4)).as("bk"))
    val candidates = keys.as("l").join(keys.as("r"),
        $"l.bk" === $"r.bk" && $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id", $"r.doc_id").distinct().count()
    assert(candidates == 1, "hamming-3 pair must share a block key")
    assert(sigA >>> 48 != sigB >>> 48, "top-16 blocking alone would miss it")
  }

  test("connected components propagate across chains, not just cliques") {
    // 1-2, 2-3, 3-4 is a diameter-3 chain (multi-round propagation);
    // 7-8 is a separate component
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("a", "b")
    val comp = DedupFunctions.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L))
  }

  test("jaccard of identical shingle sets is 1, disjoint is 0") {
    val j = shingled.as("l").join(shingled.as("r"),
        $"l.doc_id" === 0 && $"r.doc_id".isin(3, 2))
      .select($"r.doc_id",
        DedupFunctions.jaccard($"l.sh", $"r.sh").as("j"))
      .as[(Long, Double)].collect().toMap
    assert(j(3L) == 1.0)
    assert(j(2L) == 0.0)
  }

  test("brute-force cosine top-k: self is rank 1 with score 1") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val top = SimilarityFunctions.bruteForceTopK(emb, q0, 5)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 0L && math.abs(top.head._2 - 1.0) < 1e-9)
    assert(top.map(_._2).sliding(2).forall(p => p(0) >= p(1)), "scores descending")
  }

  test("LSH ANN finds planted near-duplicates of the query vector") {
    // testdata embeddings are ~random (top cosine ≈ 0.33), so recall vs
    // brute force is not a meaningful metric; plant true near-neighbors
    // (a copy and a slightly perturbed copy of vec 0) — the regime LSH
    // is actually built for.
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0).map(_.toDouble)
    val planted = Seq(
      (9000L, q0.map(_.toFloat), -1),
      (9001L, q0.zipWithIndex.map { case (x, i) =>
        (x + (if (i % 16 == 0) 0.01 else 0.0)).toFloat }, -1))
      .toDF("vec_id", "embedding", "label")
    val all = emb.unionByName(planted)
    val ann = SimilarityFunctions.lshTopK(spark, all, q0, 5)
      .as[(Long, Double)].collect()
    val ids = ann.map(_._1).toSet
    assert(ids.contains(0L), "ANN must find the query vector itself")
    assert(ids.contains(9000L) && ids.contains(9001L),
      s"ANN missed planted near-dups: $ids")
    assert(ann.map(_._2).max <= 1.0 + 1e-9)
  }

  test("int8 quantization: range bound and small cosine error") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q = emb.select($"vec_id",
      SimilarityFunctions.quantize8($"embedding").as("qv"), $"embedding")
    // every component in [-127, 127], extremes hit ±127 (max maps to 127)
    val bounds = q.select(
      array_max(transform($"qv", _.cast("int"))).as("hi"),
      array_min(transform($"qv", _.cast("int"))).as("lo"))
      .agg(max($"hi"), min($"lo")).head()
    assert(bounds.getInt(0) <= 127 && bounds.getInt(1) >= -127)
    // quantized cosine tracks full-precision cosine within 2% absolute
    val qv0 = q.filter($"vec_id" === 0).head()
    val err = q.select(
      abs(SimilarityFunctions.cosine(
        SimilarityFunctions.dequantize($"qv"),
        SimilarityFunctions.dequantize(typedLit(qv0.getSeq[Byte](1)))) -
        SimilarityFunctions.cosine($"embedding",
          typedLit(qv0.getSeq[Float](2).map(_.toDouble)))).as("e"))
      .agg(max($"e")).head().getDouble(0)
    assert(err < 0.02, s"quantization cosine error too large: $err")
  }

  test("int8 quantization: all-zero vector maps to zeros, not NaN garbage") {
    val z = Seq((1L, Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(SimilarityFunctions.quantize8($"embedding").as("qv"))
      .head().getSeq[Byte](0)
    assert(z == Seq[Byte](0, 0, 0, 0))
  }

  test("embedding near-dup pairs: planted duplicate found by bucket join") {
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    val q0 = emb.filter($"vec_id" === 0).select($"embedding").head()
      .getSeq[Float](0)
    val all = emb.unionByName(
      Seq((9000L, q0, -1)).toDF("vec_id", "embedding", "label"))
    val pairs = SimilarityFunctions.nearDupPairs(all, threshold = 0.99)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9000L)), s"missed planted dup: $pairs")
  }

  test("IVF knnJoin recovers PERTURBED planted neighbors for every query") {
    // the catalog query oracles exact copies; here the planted
    // neighbors are slightly perturbed (cosine ≈ 0.9999, vs ~0.33 for
    // random pairs), so recovery additionally requires near — not just
    // identical — vectors to route into a probed cell
    val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
      .filter($"vec_id" < 300)
    val queries = emb.filter($"vec_id" < 5)
    val planted = queries.as[(Long, Seq[Float], Int)].collect().flatMap {
      case (qid, v, _) => (1 to 2).map { j =>
        (9000L + qid * 10 + j,
          v.zipWithIndex.map { case (x, i) =>
            x + (if (i % 8 == j % 8) 0.01f else 0.0f) }, -1)
      }
    }.toSeq.toDF("vec_id", "embedding", "label")
    val idx = IvfIndex.build(spark, emb.unionByName(planted),
      k = 12, iterations = 2)
    val top = IvfIndex.knnJoin(idx, queries, topK = 2, nprobe = 3)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 5L).foreach { qid =>
      val expect = Set(9000L + qid * 10 + 1, 9000L + qid * 10 + 2)
      assert(top(qid) == expect,
        s"query $qid: expected planted $expect, got ${top(qid)}")
    }
  }
}
