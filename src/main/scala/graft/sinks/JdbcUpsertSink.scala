package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StructType, TimestampType}

/** JDBC upsert/delete sink — the true-parity sink of the reference
  * (register-postgres-sink.json: insert.mode=upsert, pk.mode=record_key,
  * delete.enabled=true, batch.size=3000).
  *
  * Executes on the EXECUTORS via foreachPartition: each partition opens
  * one connection and applies `INSERT ... ON CONFLICT (pk) DO UPDATE`
  * batches of `batchSize`, plus `DELETE` batches for tombstones —
  * exactly the statement shape Kafka Connect's JDBC sink generates for
  * Postgres. Combined with [[graft.cdc.Materialize.latestPerKey]]
  * pre-dedup (one row per key per batch) and per-key versions, replays
  * are idempotent: at-least-once delivery + idempotent write =
  * effectively-once (ST1).
  *
  * NOTE: exercised structurally (SQL generation is unit-testable) but
  * not end-to-end in this container — no database is available; the
  * parquet mirror path in CdcPipeline is the tested stand-in.
  */
object JdbcUpsertSink {

  final case class Target(url: String, table: String, keyCols: Seq[String],
                          user: String, password: String,
                          batchSize: Int = 3000)

  /** Postgres-dialect upsert statement for a row schema. */
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
    val payloadCols = schema.fieldNames.toSeq
    val upSql = upsertSql(target.table, schema, target.keyCols)
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
