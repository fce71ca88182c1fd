package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class JdbcUpsertSinkSpec extends AnyFunSuite {
  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("total", DoubleType)))

  test("upsert statement shape matches the reference sink's Postgres dialect") {
    val sql = JdbcUpsertSink.upsertSql("ventas", schema, Seq("id"))
    assert(sql.contains("""INSERT INTO "ventas" ("id", "name", "total")"""))
    assert(sql.contains("VALUES (?, ?, ?)"))
    assert(sql.contains("""ON CONFLICT ("id") DO UPDATE SET"""))
    assert(sql.contains(""""name" = EXCLUDED."name""""))
    assert(sql.contains(""""total" = EXCLUDED."total""""))
    // key columns are never in the update list
    assert(!sql.contains(""""id" = EXCLUDED."id""""))
  }

  test("composite keys supported in conflict target and delete predicate") {
    val s2 = StructType(schema.fields :+ StructField("part", IntegerType))
    val sql = JdbcUpsertSink.upsertSql("t", s2, Seq("id", "part"))
    assert(sql.contains("""ON CONFLICT ("id", "part")"""))
    val del = JdbcUpsertSink.deleteSql("t", Seq("id", "part"))
    assert(del == """DELETE FROM "t" WHERE "id" = ? AND "part" = ?""")
  }

  test("MERGE dialect casts every placeholder to the column's SQL type") {
    val sql = JdbcUpsertSink.MergeDialect.upsertSql("t", schema, Seq("id"))
    assert(sql.contains("MERGE INTO \"t\" AS tgt"))
    assert(sql.contains("""ON tgt."id" = CAST(? AS BIGINT)"""))
    assert(sql.contains(
      """WHEN MATCHED THEN UPDATE SET "name" = CAST(? AS VARCHAR(32672)), "total" = CAST(? AS DOUBLE)"""))
    assert(sql.contains("""INSERT ("id", "name", "total")"""))
    // key columns never updated; bind order covers every clause
    assert(!sql.contains(""""id" = CAST(? AS BIGINT),"""))
    assert(JdbcUpsertSink.MergeDialect.bindOrder(schema, Seq("id")) ===
      Seq("id", "name", "total", "id", "name", "total"))
  }
}

/** End-to-end dialect execution against the embedded Derby that ships
  * with Spark: the generated upsert/delete batches round-trip
  * insert → update → delete through a LIVE connection, matching the
  * reference sink's semantics (register-postgres-sink.json:14-17 —
  * insert.mode=upsert, delete.enabled=true, batch.size). */
class JdbcUpsertSinkDerbySpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def target(batchSize: Int) = JdbcUpsertSink.Target(
    url, "mirror", Seq("id"), user = "", password = "",
    batchSize = batchSize, dialect = JdbcUpsertSink.MergeDialect)

  private def withTable[A](f: => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("""DROP TABLE "mirror"""") catch { case _: Throwable => }
      st.execute(
        """CREATE TABLE "mirror" (
          |  "id" BIGINT PRIMARY KEY,
          |  "name" VARCHAR(100),
          |  "total" DOUBLE)""".stripMargin)
      st.close()
    } finally conn.close()
    f
  }

  private val rowSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("total", DoubleType),
    StructField("_v_deleted", BooleanType)))

  private def batch(rows: (Long, String, Double, Boolean)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, n, t, d) => Row(i, n, t, d) }, 2),
      rowSchema)

  private def tableState(): Map[Long, (String, Double)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("""SELECT "id", "name", "total" FROM "mirror"""")
      val b = Map.newBuilder[Long, (String, Double)]
      while (rs.next()) b += rs.getLong(1) -> (rs.getString(2), rs.getDouble(3))
      b.result()
    } finally conn.close()
  }

  test("insert -> update -> delete round-trips through a live Derby connection") {
    withTable {
      // batchSize 2 with 3+ rows per phase exercises the mid-stream
      // executeBatch flush, not just the final one
      val t = target(batchSize = 2)

      JdbcUpsertSink.writeBatch(
        batch((1L, "a", 1.0, false), (2L, "b", 2.0, false),
          (3L, "c", 3.0, false), (4L, "d", 4.0, false)), t)
      assert(tableState() === Map(
        1L -> ("a", 1.0), 2L -> ("b", 2.0), 3L -> ("c", 3.0), 4L -> ("d", 4.0)))

      // mixed batch: update two live keys, insert a new one, delete one
      JdbcUpsertSink.writeBatch(
        batch((1L, "a2", 10.0, false), (3L, "c2", 30.0, false),
          (5L, "e", 5.0, false), (2L, null, 0.0, true)), t)
      assert(tableState() === Map(
        1L -> ("a2", 10.0), 3L -> ("c2", 30.0), 4L -> ("d", 4.0),
        5L -> ("e", 5.0)))
    }
  }

  test("replaying the same batch is idempotent (effectively-once, ST1)") {
    withTable {
      val t = target(batchSize = 3000)
      val b = batch((1L, "x", 1.5, false), (2L, "y", 2.5, false),
        (9L, null, 0.0, true))
      JdbcUpsertSink.writeBatch(b, t)
      val first = tableState()
      JdbcUpsertSink.writeBatch(b, t) // at-least-once redelivery
      assert(tableState() === first)
      assert(first === Map(1L -> ("x", 1.5), 2L -> ("y", 2.5)))
    }
  }
}
