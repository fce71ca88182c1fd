package graft

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        "        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("topk_scored UDAF callable from SQL after registration") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT g, topk_scored(s, id) AS tk FROM VALUES " +
        "(1, 5.0, 10L), (1, 7.0, 11L), (1, 7.0, 9L), (2, 1.0, 12L) " +
        "AS t(g, s, id) GROUP BY g ORDER BY g").collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
    // best-first, tie on score broken by ascending id
    assert(g1.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((7.0, 9L), (7.0, 11L), (5.0, 10L)))
    assert(rows(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }

  test("zorder_key callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT zorder_key(3L, 5L) AS z").head().getLong(0)
    // a=3 -> bits 0,1 at even positions = 0b0101; b=5 -> bits 0,2 at odd
    // positions = 0b100010; together 0b100111 = 39
    assert(r == graft.functions.ZOrder.interleave16(3, 5) && r == 39L)
  }

  test("kmv_sketch UDAF callable from SQL after registration") {
    GraftExtensions.register(spark)
    val sk = spark.sql(
      """SELECT kmv_sketch(
        |  CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10)
        |    AS BIGINT), id) AS sk
        |FROM range(500)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(sk.size == 64)
    assert(sk.map(_.getLong(0)) == sk.map(_.getLong(0)).sorted)
  }

  test("hilbert_key callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT hilbert_key(3L, 5L) AS h").head().getLong(0)
    assert(r == graft.functions.Hilbert.xy2d(16, 3, 5))
  }

  test("wrong arity surfaces as an analysis error, not an index crash") {
    GraftExtensions.register(spark)
    for (bad <- Seq("SELECT nfc_normalize()", "SELECT zorder_key(1L)",
        "SELECT hilbert_key(1L)",
        "SELECT vec_dot(array(1.0))", "SELECT vec_cosine(array(1.0))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(bad).collect())
      assert(e.getMessage.contains("requires"), s"$bad: ${e.getMessage}")
    }
  }

  test("vec_dot over a SQL view of the embeddings table") {
    GraftExtensions.register(spark)
    graft.core.Tables.load(spark, sf0001, "embeddings")
      .createOrReplaceTempView("emb_v")
    val self = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS n2 FROM emb_v LIMIT 5")
      .collect()
    assert(self.forall(_.getDouble(1) > 0))
  }
}
