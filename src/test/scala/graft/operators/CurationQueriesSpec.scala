package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Packing
import graft.functions.TextFunctions.maxSortedRunLength

class CurationQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("maxSortedRunLength: highest multiplicity, any input order") {
    val df = Seq(
      (1, Seq("b", "a", "b", "c", "b")), // b×3
      (2, Seq("x")),                     // singleton
      (3, Seq[String]()),                // empty
      (4, Seq("a", "a", "a", "a"))       // all equal
    ).toDF("id", "arr")
      .select($"id", maxSortedRunLength($"arr").as("r"))
    val m = df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(m == Map(1 -> 3, 2 -> 1, 3 -> 0, 4 -> 4))
  }

  test("text_repetition metrics on a crafted document") {
    Seq((0L, "a a a b")).toDF("doc_id", "text")
      .createOrReplaceTempView("rep_doc")
    val ws = split($"text", " ")
    val r = Seq((0L, "a a a b")).toDF("doc_id", "text").select(
      (lit(1d) - size(array_distinct(ws)).cast("double") / size(ws))
        .as("dup"),
      maxSortedRunLength(graft.functions.TextFunctions
        .wordShingles($"text", 2)).as("top")).head()
    assert(r.getDouble(0) == 0.5) // 2 distinct of 4 tokens
    assert(r.getInt(1) == 2)      // bigrams: "a a"×2, "a b"
  }

  test("text_pii_redact removes every synthesized PII instance") {
    val out = QueryCatalog.byName("text_pii_redact").fn(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(red.contains("[EMAIL]") && red.contains("[IP]") &&
        red.contains("[PHONE]"), red)
      assert(!red.contains("@shop.example.com"), red)
      assert(!red.matches(".*\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}.*"), red)
      assert(r.getAs[Int]("n_emails") == 1 && r.getAs[Int]("n_ips") == 1 &&
        r.getAs[Int]("n_phones") == 1)
    }
  }

  test("packGreedy: first-fit-sequential bins, oversize doc isolated") {
    val docs = Seq(
      ("en", 1L, 50L), ("en", 2L, 60L), ("en", 3L, 30L),
      ("en", 4L, 200L), ("en", 5L, 10L))
      .toDF("lang", "doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs, "lang", "doc_id", "n_tokens", 128)
      .collect().map(p => p.doc_id -> p.bin_id).toMap
    // 50+60=110 fits; +30 would be 140 → new bin; 200 oversize alone;
    // 10 starts fresh after the oversize bin
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("packGreedy: bins never cross group boundaries") {
    val docs = Seq(
      ("en", 1L, 100L), ("en", 2L, 100L),
      ("de", 3L, 10L), ("de", 4L, 10L))
      .toDF("lang", "doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs, "lang", "doc_id", "n_tokens", 128)
      .collect()
    val byDoc = packed.map(p => p.doc_id -> p).toMap
    // de docs share bin 0 of group de — independent of en's bins
    assert(byDoc(3L).bin_id == 0L && byDoc(4L).bin_id == 0L &&
      byDoc(4L).fill_after == 20L)
    assert(byDoc(1L).bin_id == 0L && byDoc(2L).bin_id == 1L)
    // every bin's final fill respects ctx (no oversize docs here)
    packed.foreach(p => assert(p.fill_after <= 128L))
  }

  test("dedup_decontaminate flags a planted eval overlap") {
    val out = QueryCatalog.byName("dedup_decontaminate").fn(spark, sf0001)
    // training docs only (never an eval id), and contamination is real:
    // every flagged doc shares >= 1 distinct 3-gram with >= 1 eval doc
    val rows = out.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 0)
      assert(r.getAs[Long]("n_shared_grams") >= 1)
      assert(r.getAs[Long]("n_eval_docs") >= 1)
    }
  }

  test("dedup_decontaminate broadcasts the eval side") {
    val p = QueryCatalog.byName("dedup_decontaminate").fn(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("sample_temperature weights normalize to 1") {
    val rows = QueryCatalog.byName("sample_temperature").fn(spark, sf0001)
      .collect()
    assert(rows.length >= 2)
    val total = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - 1.0) < 1e-3, total)
    // temperature flattens: every weight strictly between min and max
    // raw proportions iff group sizes differ
    rows.foreach(r => assert(r.getAs[Double]("weight") > 0))
  }
}
