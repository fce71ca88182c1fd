package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", $"embedding")

  private lazy val q0 = emb.filter($"vec_id" === 0).select($"embedding")
    .head().getSeq[Float](0)

  test("planted exact duplicate survives cell pruning + ADC and ranks top-2") {
    val all = emb.unionByName(Seq((900000L, q0)).toDF("vec_id", "embedding"))
    val idx = IvfPq.build(spark, all, kCells = 8, m = 8, ksub = 16)
    val top = IvfPq.search(idx, q0.map(_.toDouble), 2)
      .select($"vec_id").as[Long].collect().toSet
    assert(top == Set(0L, 900000L), s"dup lost in routing/ADC: $top")
  }

  test("re-rank restores exact cosine scores over the candidates") {
    val all = emb.unionByName(Seq((900000L, q0)).toDF("vec_id", "embedding"))
    val idx = IvfPq.build(spark, all, kCells = 8, m = 8, ksub = 16)
    val got = IvfPq.searchReranked(idx, q0.map(_.toDouble), 5)
      .as[(Long, Double)].collect()
    assert(got.take(2).map(_._1).toSet == Set(0L, 900000L))
    got.take(2).foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-6) }
    // strictly decreasing after the tied duplicates, ids break ties
    assert(got.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("re-rank recall on perturbed neighbors >= plain ADC recall") {
    val rnd = new scala.util.Random(13)
    val planted = (1 to 10).map { i =>
      (900000L + i, q0.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }.toDF("vec_id", "embedding")
    val all = emb.filter($"vec_id" =!= 0).unionByName(planted)
    val idx = IvfPq.build(spark, all, kCells = 8, m = 8, ksub = 16)
    def recall(df: org.apache.spark.sql.DataFrame): Int =
      df.select($"vec_id").as[Long].collect().count(_ > 900000L)
    val adc = recall(IvfPq.search(idx, q0.map(_.toDouble), 10, nprobe = 4))
    val rr = recall(IvfPq.searchReranked(idx, q0.map(_.toDouble), 10, nprobe = 4))
    assert(rr >= adc, s"re-rank lost recall: adc=$adc reranked=$rr")
    assert(rr >= 6, s"re-rank recall too low: $rr/10")
  }

  test("saved index reloads to identical results; probes prune code partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    try {
      val built = IvfPq.build(spark, emb, kCells = 8, m = 8, ksub = 16)
      IvfPq.save(built, dir)
      val loaded = IvfPq.load(spark, dir)
      val q = q0.map(_.toDouble)
      val a = IvfPq.searchReranked(built, q, 10).as[(Long, Double)].collect().toSeq
      val b = IvfPq.searchReranked(loaded, q, 10).as[(Long, Double)].collect().toSeq
      assert(a == b, s"loaded search diverged:\n$a\n$b")
      // the ADC stage over the loaded index reads only probed cells:
      // the cell filter must reach the scan as a partition filter
      val p = IvfPq.search(loaded, q, 10, nprobe = 2)
        .queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
        p.take(1200))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("append adds vectors to a saved index; both stages see them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_ap").toString
    try {
      IvfPq.save(IvfPq.build(spark, emb, kCells = 8, m = 8, ksub = 16), dir)
      // append an exact duplicate of the query vector post-build
      IvfPq.append(spark, dir,
        Seq((900000L, q0)).toDF("vec_id", "embedding"))
      val idx = IvfPq.load(spark, dir)
      val q = q0.map(_.toDouble)
      val adc = IvfPq.search(idx, q, 2).select($"vec_id").as[Long].collect().toSet
      assert(adc == Set(0L, 900000L), s"appended dup invisible to ADC: $adc")
      val rr = IvfPq.searchReranked(idx, q, 2).as[(Long, Double)].collect()
      assert(rr.map(_._1).toSet == Set(0L, 900000L))
      rr.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-6) }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("streaming vectors ingest into a saved index per micro-batch") {
    // the streaming half of the ANN artifact lifecycle: vectors arrive
    // on a stream, each micro-batch appends to the saved index (O(new)
    // routing + encode), and the next search sees them — no rebuild,
    // no restart
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_st").toString
    implicit val sqlCtx = spark.sqlContext
    try {
      IvfPq.save(IvfPq.build(spark, emb, kCells = 8, m = 8, ksub = 16), dir)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])]
      val q = ms.toDF().toDF("vec_id", "embedding")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IvfPq.append(spark, dir, batch)
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try {
        ms.addData((900000L, q0.toSeq))
        q.processAllAvailable()
      } finally q.stop()
      val idx = IvfPq.load(spark, dir)
      val top = IvfPq.search(idx, q0.map(_.toDouble), 2)
        .select($"vec_id").as[Long].collect().toSet
      assert(top == Set(0L, 900000L), s"streamed vector not searchable: $top")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("re-rank joins candidates broadcast, final top-k via TakeOrderedAndProject") {
    val idx = IvfPq.build(spark, emb, kCells = 8, m = 8, ksub = 16)
    val p = IvfPq.searchReranked(idx, q0.map(_.toDouble), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }
}
