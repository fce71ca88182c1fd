package graft.sinks

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

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
}
