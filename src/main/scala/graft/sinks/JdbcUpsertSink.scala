package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** JDBC upsert/delete sink — the true-parity sink of the reference
  * (register-postgres-sink.json: insert.mode=upsert, pk.mode=record_key,
  * delete.enabled=true, batch.size=3000).
  *
  * Executes on the EXECUTORS via foreachPartition: each partition opens
  * one connection and applies keyed-upsert batches of `batchSize`, plus
  * `DELETE` batches for tombstones — exactly the statement shape Kafka
  * Connect's JDBC sink generates. Combined with
  * [[graft.cdc.Materialize.latestPerKey]] pre-dedup (one row per key per
  * batch) and per-key versions, replays are idempotent: at-least-once
  * delivery + idempotent write = effectively-once (ST1).
  *
  * The upsert statement is dialect-pluggable:
  *   - [[JdbcUpsertSink.PostgresDialect]] — `INSERT .. ON CONFLICT (pk)
  *     DO UPDATE`, the reference's target database.
  *   - [[JdbcUpsertSink.MergeDialect]] — standard-SQL `MERGE INTO ..
  *     USING (VALUES ..)`, runnable by Derby/DB2/Oracle/SQL Server.
  *     Exercised END-TO-END in `JdbcUpsertSinkSpec` against the
  *     embedded Derby that ships with Spark (insert → update → delete
  *     round-trip through a live connection).
  */
object JdbcUpsertSink {

  final case class Target(url: String, table: String, keyCols: Seq[String],
                          user: String, password: String,
                          batchSize: Int = 3000,
                          dialect: Dialect = PostgresDialect)

  /** Upsert-statement dialect. The delete statement is standard SQL and
    * shared. */
  sealed trait Dialect extends Serializable {
    def upsertSql(table: String, schema: StructType, keyCols: Seq[String]): String
    /** Column order the upsert's `?` placeholders bind in (a dialect may
      * reference a column in several clauses). */
    def bindOrder(schema: StructType, keyCols: Seq[String]): Seq[String] =
      schema.fieldNames.toSeq
  }

  /** Postgres-dialect upsert (the reference sink's target). */
  case object PostgresDialect extends Dialect {
    def upsertSql(table: String, schema: StructType, keyCols: Seq[String]): String = {
      val cols = schema.fieldNames
      val placeholders = cols.map(_ => "?").mkString(", ")
      val updates = cols.filterNot(keyCols.contains)
        .map(c => s""""$c" = EXCLUDED."$c"""").mkString(", ")
      val conflict = keyCols.map(c => s""""$c"""").mkString(", ")
      val quoted = cols.map(c => s""""$c"""").mkString(", ")
      s"""INSERT INTO "$table" ($quoted) VALUES ($placeholders)
         |ON CONFLICT ($conflict) DO UPDATE SET $updates""".stripMargin
    }
  }

  /** Standard-SQL MERGE upsert, Derby/DB2-flavored: the source is the
    * one-row base table SYSIBM.SYSDUMMY1 (Derby rejects `USING (VALUES
    * ..)` — the MERGE source must be a base table or table function) and
    * every `?` is CAST to the column's SQL type (Derby rejects untyped
    * parameters in MERGE clauses). A column therefore binds once per
    * clause it appears in: keys (ON), then non-keys (UPDATE SET), then
    * all columns (INSERT VALUES) — see [[bindOrder]]. */
  case object MergeDialect extends Dialect {
    private def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case StringType => "VARCHAR(32672)"
      case BinaryType => "BLOB"
      case other => sys.error(s"MergeDialect: unmapped Spark type $other")
    }

    private def cast(schema: StructType)(c: String): String =
      s"CAST(? AS ${sqlType(schema(c).dataType)})"

    override def bindOrder(schema: StructType, keyCols: Seq[String]): Seq[String] = {
      val nonKeys = schema.fieldNames.toSeq.filterNot(keyCols.contains)
      keyCols ++ nonKeys ++ schema.fieldNames.toSeq
    }

    def upsertSql(table: String, schema: StructType, keyCols: Seq[String]): String = {
      val cols = schema.fieldNames.toSeq
      val nonKeys = cols.filterNot(keyCols.contains)
      val p = cast(schema) _
      val on = keyCols.map(c => s"""tgt."$c" = ${p(c)}""").mkString(" AND ")
      val updates = nonKeys.map(c => s""""$c" = ${p(c)}""").mkString(", ")
      val insertCols = cols.map(c => s""""$c"""").mkString(", ")
      val insertVals = cols.map(p).mkString(", ")
      s"""MERGE INTO "$table" AS tgt
         |USING SYSIBM.SYSDUMMY1
         |ON $on
         |WHEN MATCHED THEN UPDATE SET $updates
         |WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin
    }
  }

  /** Postgres-dialect upsert statement for a row schema (compat shim —
    * prefer `Target.dialect`). */
  def upsertSql(table: String, schema: StructType, keyCols: Seq[String]): String =
    PostgresDialect.upsertSql(table, schema, keyCols)

  def deleteSql(table: String, keyCols: Seq[String]): String =
    s"""DELETE FROM "$table" WHERE """ +
      keyCols.map(c => s""""$c" = ?""").mkString(" AND ")

  private def bind(ps: java.sql.PreparedStatement, row: Row,
                   schema: StructType, cols: Seq[String]): Unit =
    cols.zipWithIndex.foreach { case (c, i) =>
      val idx = schema.fieldIndex(c)
      val v = if (row.isNullAt(idx)) null else row.get(idx)
      v match {
        case null => ps.setObject(i + 1, null)
        case t: java.sql.Timestamp => ps.setTimestamp(i + 1, t)
        case other => ps.setObject(i + 1, other)
      }
    }

  /** Apply one deduped change batch: upserts for live rows, deletes for
    * tombstones. `changes` must carry `_v_deleted` (from
    * Materialize.versionedState) or be pre-split by the caller. */
  def writeBatch(changes: DataFrame, target: Target,
                 connect: Target => Connection = defaultConnect): Unit = {
    val schema = StructType(changes.schema.fields.filterNot(f =>
      f.name.startsWith("_v_")))
    val hasFlag = changes.columns.contains("_v_deleted")
    val payloadCols = target.dialect.bindOrder(schema, target.keyCols)
    val upSql = target.dialect.upsertSql(target.table, schema, target.keyCols)
    val delSql = deleteSql(target.table, target.keyCols)
    changes.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = connect(target)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(upSql)
          val del = conn.prepareStatement(delSql)
          var nUp = 0
          var nDel = 0
          it.foreach { row =>
            val deleted = hasFlag &&
              row.getBoolean(row.fieldIndex("_v_deleted"))
            if (deleted) {
              bind(del, row, row.schema, target.keyCols)
              del.addBatch(); nDel += 1
              if (nDel % target.batchSize == 0) del.executeBatch()
            } else {
              bind(up, row, row.schema, payloadCols)
              up.addBatch(); nUp += 1
              if (nUp % target.batchSize == 0) up.executeBatch()
            }
          }
          // upserts first, then deletes — matches reference apply order
          up.executeBatch()
          del.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  private def defaultConnect(t: Target): Connection = {
    val props = new java.util.Properties()
    props.setProperty("user", t.user)
    props.setProperty("password", t.password)
    java.sql.DriverManager.getConnection(t.url, props)
  }
}
