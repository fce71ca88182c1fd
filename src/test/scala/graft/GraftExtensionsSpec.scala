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
