package graft.functions

import graft.SparkSpec

/** The property content-defined chunking exists for: an edit early in
  * a document perturbs only the chunks up to the next surviving
  * boundary — every later chunk hash is identical across revisions,
  * so chunk-grain dedup recognizes the shared tail. A fixed-stride
  * chunker shifts every downstream window instead (zero shared
  * chunks after an insertion). */
class ChunkerCdcSpec extends SparkSpec {
  import spark.implicits._

  // deterministic "document": pseudo-random words from a fixed seed
  private def words(n: Int, seed: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)("w" + r.nextInt(5000))
  }

  private def chunkHashes(text: String): Seq[(Long, String)] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Chunker.contentDefinedChunks(df, "doc_id", "text")
      .select("chunk_id", "chunk_hash")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
  }

  test("an early insertion leaves every post-resync chunk hash unchanged") {
    val base = words(600, seed = 7)
    val edited = base.take(10) ++ Seq("INSERTED") ++ base.drop(10)
    val a = chunkHashes(base.mkString(" ")).map(_._2)
    val b = chunkHashes(edited.mkString(" ")).map(_._2)
    // the tails must re-align: compare hash MULTISETS — all but the
    // chunk(s) containing the edit are shared
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.size >= a.size - 3,
      s"CDC chunking lost re-sync: ${shared.size} of ${a.size} shared")
    // and the very last chunks are literally identical
    assert(a.takeRight(3) == b.takeRight(3))
  }

  test("fixed-stride chunking shares nothing after the edit (the contrast)") {
    val base = words(600, seed = 7)
    val edited = base.take(10) ++ Seq("INSERTED") ++ base.drop(10)
    def fixed(text: String): Seq[String] = {
      val df = Seq((1L, text)).toDF("doc_id", "text")
      Chunker.chunk(df, "doc_id", "text", size = 16, stride = 16)
        .select("chunk_id", "chunk_text")
        .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    }
    val a = fixed(base.mkString(" "))
    val b = fixed(edited.mkString(" "))
    // after the insertion point every window is shifted by one token
    val sharedTail = a.toSet.intersect(b.toSet)
      .count(t => a.indexOf(t) > 1)
    assert(sharedTail == 0,
      s"stride chunks unexpectedly re-aligned: $sharedTail")
  }

  test("chunks reassemble the document exactly (partition property)") {
    val base = words(300, seed = 11).mkString(" ")
    val df = Seq((1L, base)).toDF("doc_id", "text")
    val chunks = Chunker.contentDefinedChunks(df, "doc_id", "text")
      .select("start_token", "n_tokens")
      .as[(Int, Long)].collect().sortBy(_._1)
    val toks = base.split(" ")
    // spans tile [1, n] with no gaps or overlaps
    assert(chunks.head._1 == 1)
    chunks.sliding(2).foreach {
      case Array((s1, n1), (s2, _)) => assert(s1 + n1 == s2)
      case _ =>
    }
    assert(chunks.last._1 + chunks.last._2 - 1 == toks.length)
  }
}
