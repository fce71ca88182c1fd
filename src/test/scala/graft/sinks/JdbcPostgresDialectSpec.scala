package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Executes the POSTGRES branch of [[JdbcUpsertSink]] end-to-end — not
  * just statement generation. No Postgres (or H2) driver exists in this
  * sandbox, so the spec drives the real `writeBatch` execution path
  * (foreachPartition, bind order, batch-flush cadence, commit) through
  * a recording JDBC connection, then REPLAYS the captured
  * `INSERT .. ON CONFLICT` / `DELETE` statement stream through a strict
  * interpreter of exactly those two statement shapes (any parse drift
  * throws). Equivalence gate: the replayed Postgres state must equal
  * the state the MergeDialect produces for the SAME logical batches on
  * a LIVE embedded Derby — the two dialect branches are semantically
  * interchangeable, which is the sink's contract
  * (register-postgres-sink.json:14-17). */
class JdbcPostgresDialectSpec extends SparkSpec {

  // ---- strict interpreter for the two generated statement shapes ----

  private val insertRe =
    ("""INSERT INTO "(\w+)" \(([^)]*)\) VALUES \(([^)]*)\)\s*""" +
      """ON CONFLICT \(([^)]*)\) DO UPDATE SET (.*)""").r
  private val deleteRe = """DELETE FROM "(\w+)" WHERE (.*)""".r

  private def cols(quoted: String): Seq[String] =
    quoted.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq

  /** state: key tuple -> full row (by column name). */
  private def replay(stream: Seq[(String, Seq[Any])])
      : Map[Seq[Any], Map[String, Any]] = {
    val state = mutable.Map[Seq[Any], Map[String, Any]]()
    stream.foreach {
      case (insertRe(_, colList, placeholders, conflictList, setList), params) =>
        val columns = cols(colList)
        assert(placeholders.split(",").length == columns.size)
        assert(params.size == columns.size, s"bind order drift: $params")
        val row = columns.zip(params).toMap
        val keyCols = cols(conflictList)
        val key = keyCols.map(row)
        val updates = setList.split(",").map(_.trim).map {
          case s =>
            val Array(l, r) = s.split("=").map(_.trim)
            val c = l.stripPrefix("\"").stripSuffix("\"")
            assert(r == s"""EXCLUDED."$c"""", s"update clause drift: $s")
            c
        }.toSeq
        assert(updates.intersect(keyCols).isEmpty, "keys must not update")
        state(key) = state.get(key) match {
          case None => row
          case Some(old) => old ++ updates.map(c => c -> row(c))
        }
      case (deleteRe(_, whereList), params) =>
        val keyCols = whereList.split(" AND ").map(_.trim).map { w =>
          val Array(l, r) = w.split("=").map(_.trim)
          assert(r == "?", s"delete predicate drift: $w")
          l.stripPrefix("\"").stripSuffix("\"")
        }.toSeq
        assert(params.size == keyCols.size)
        state.remove(params)
      case (sql, _) => fail(s"unrecognized statement shape: $sql")
    }
    state.toMap
  }

  // ---- fixture shared with the Derby path ----

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

  private val batches = Seq(
    Seq((1L, "a", 1.0, false), (2L, "b", 2.0, false),
      (3L, "c", 3.0, false), (4L, "d", 4.0, false)),
    Seq((1L, "a2", 10.0, false), (3L, "c2", 30.0, false),
      (5L, "e", 5.0, false), (2L, null: String, 0.0, true)),
    // redelivery of the previous batch: idempotence under the PG dialect
    Seq((1L, "a2", 10.0, false), (3L, "c2", 30.0, false),
      (5L, "e", 5.0, false), (2L, null: String, 0.0, true)))

  private val derbyUrl = "jdbc:derby:memory:graftpgeq;create=true"

  private def derbyState(): Map[Seq[Any], Map[String, Any]] = {
    val conn = DriverManager.getConnection(derbyUrl)
    try {
      val rs = conn.createStatement()
        .executeQuery("""SELECT "id", "name", "total" FROM "mirror"""")
      val b = Map.newBuilder[Seq[Any], Map[String, Any]]
      while (rs.next()) {
        val id = rs.getLong(1)
        b += Seq[Any](id) -> Map[String, Any](
          "id" -> id, "name" -> rs.getString(2), "total" -> rs.getDouble(3))
      }
      b.result()
    } finally conn.close()
  }

  test("the executed Postgres statement stream replays to the exact " +
    "state the MergeDialect produces on live Derby") {
    // Derby side: real connection, real MERGE execution
    val conn = DriverManager.getConnection(derbyUrl)
    try {
      val st = conn.createStatement()
      try st.execute("""DROP TABLE "mirror"""") catch { case _: Throwable => }
      st.execute("""CREATE TABLE "mirror" (
        |  "id" BIGINT PRIMARY KEY, "name" VARCHAR(100), "total" DOUBLE)"""
        .stripMargin)
    } finally conn.close()
    val derbyTarget = JdbcUpsertSink.Target(derbyUrl, "mirror", Seq("id"),
      user = "", password = "", batchSize = 2,
      dialect = JdbcUpsertSink.MergeDialect)
    batches.foreach(b => JdbcUpsertSink.writeBatch(batch(b: _*), derbyTarget))

    // Postgres side: the same writeBatch code path, PostgresDialect,
    // batchSize 2 forces the mid-stream executeBatch flush
    JdbcPostgresDialectSpec.log.clear()
    val pgTarget = JdbcUpsertSink.Target("jdbc:postgresql:unused", "mirror",
      Seq("id"), user = "", password = "", batchSize = 2,
      dialect = JdbcUpsertSink.PostgresDialect)
    batches.foreach(b => JdbcUpsertSink.writeBatch(batch(b: _*), pgTarget,
      connect = _ => JdbcPostgresDialectSpec.recordingConnection()))

    val stream = JdbcPostgresDialectSpec.log.asScala.toSeq
    assert(stream.nonEmpty)
    // every executed upsert is the ON CONFLICT shape (no silent fallthrough)
    assert(stream.count(_._1.contains("ON CONFLICT")) == 10) // 4+3+3 live rows
    assert(stream.count(_._1.startsWith("DELETE")) == 2)

    val pgState = replay(stream)
    val expected = Map(
      Seq[Any](1L) -> Map[String, Any]("id" -> 1L, "name" -> "a2", "total" -> 10.0),
      Seq[Any](3L) -> Map[String, Any]("id" -> 3L, "name" -> "c2", "total" -> 30.0),
      Seq[Any](4L) -> Map[String, Any]("id" -> 4L, "name" -> "d", "total" -> 4.0),
      Seq[Any](5L) -> Map[String, Any]("id" -> 5L, "name" -> "e", "total" -> 5.0))
    assert(pgState === expected)
    assert(derbyState() === expected)
  }
}

object JdbcPostgresDialectSpec {
  /** Captured (sql, bound params) in execution order — executor threads
    * share the JVM in local mode, so a static queue sees every batch. */
  val log = new ConcurrentLinkedQueue[(String, Seq[Any])]()

  // ---- recording JDBC layer (shared across executor threads) ----

  private def proxyDefault(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => java.lang.Integer.valueOf(0)
    case t if t == classOf[Array[Int]] => Array.empty[Int]
    case _ => null
  }

  private def recordingPs(sql: String): PreparedStatement = {
    val params = mutable.Map[Int, Any]()
    val pending = mutable.ArrayBuffer[Seq[Any]]()
    val h = new InvocationHandler {
      def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "setObject" | "setTimestamp" | "setLong" | "setString" |
               "setDouble" | "setInt" | "setBoolean" =>
            params(args(0).asInstanceOf[Int]) = args(1); null
          case "addBatch" =>
            val n = if (params.isEmpty) 0 else params.keys.max
            pending += (1 to n).map(params.get(_).orNull)
            null
          case "executeBatch" =>
            val r = new Array[Int](pending.size)
            pending.foreach(p => JdbcPostgresDialectSpec.log.add(sql -> p))
            pending.clear()
            r
          case _ => proxyDefault(m)
        }
    }
    Proxy.newProxyInstance(classOf[JdbcPostgresDialectSpec].getClassLoader,
      Array(classOf[PreparedStatement]), h).asInstanceOf[PreparedStatement]
  }

  private def recordingConnection(): Connection = {
    val h = new InvocationHandler {
      def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "prepareStatement" => recordingPs(args(0).asInstanceOf[String])
          case _ => proxyDefault(m)
        }
    }
    Proxy.newProxyInstance(classOf[JdbcPostgresDialectSpec].getClassLoader,
      Array(classOf[Connection]), h).asInstanceOf[Connection]
  }


}
