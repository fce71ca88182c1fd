package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table consistent snapshots over a group of [[LogMirror]]s —
  * the transaction boundary the per-table manifests don't give: each
  * table's merge commits independently, so between table A's commit and
  * table B's a plain reader sees batch N in A joined against batch N-1
  * in B (a torn batch; the reference's JDBC sink has the same window
  * between per-table upserts). A snapshot pins the whole group to one
  * consistent cut.
  *
  * Layout: `<groupRoot>/snapshots/SNAP-<id>`, one `table:version` line
  * per table, committed tmp-file + atomic rename AFTER every table's
  * merge for the logical batch completed. Readers resolve the newest
  * SNAP and read each table via [[LogMirror.readAsOf]] at its pinned
  * version — a crash between merges leaves the previous SNAP, so
  * readers fall back to the complete older cut, never a torn one.
  * Tables untouched by a batch carry their previous version forward.
  *
  * Cost: a snapshot is one tiny file per batch (no data copy — the
  * mirror's segment history IS the snapshot storage), and reading at
  * the pinned version costs the same as a live read (it filters the
  * delta list, it does not re-read history). Retention follows
  * [[LogMirror.readAsOf]]: the newest snapshot always resolves (its
  * versions are current); older snapshots resolve until compaction
  * folds past them ([[LogMirror.RetentionLostException]]).
  */
object SnapshotCatalog {

  private def snapDir(groupRoot: String) = s"$groupRoot/snapshots"

  private def snapId(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("SNAP-")) n.stripPrefix("SNAP-").toLongOption else None
  }

  private def fsOf(spark: SparkSession, groupRoot: String): FileSystem =
    new Path(groupRoot).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parse(fs: FileSystem, p: Path): Map[String, Long] = {
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf(':')
      line.take(i) -> line.drop(i + 1).toLong
    }.toMap
  }

  /** Commit snapshot `id`: the given tables pinned at their CURRENT
    * committed versions, tables from the previous snapshot not in
    * `touched` carried forward. Call AFTER every touched table's merge
    * for the batch has committed. Recommitting the same id (a batch
    * replay) atomically overwrites with identical content.
    *
    * Retention: snapshots older than the newest `keep` are swept on
    * commit — at a 500 ms trigger cadence an unbounded snapshot dir
    * grows by ~170k files/day, a metadata-listing problem long before
    * a storage one. `keep` bounds BOTH the file count and how far back
    * [[at]] can travel; the mirrors' own `maxDeltas` retention is the
    * second (usually tighter) bound on old pins staying resolvable. */
  def commit(spark: SparkSession, groupRoot: String, id: Long,
             touched: Seq[String], keep: Int = 32): Map[String, Long] = {
    require(keep >= 1, "keep must be >= 1")
    val fs = fsOf(spark, groupRoot)
    val carried = latest(spark, groupRoot).map(_._2).getOrElse(Map.empty)
    val pinned = carried ++ touched.flatMap { t =>
      LogMirror.currentVersion(spark, s"$groupRoot/$t").map(t -> _)
    }.toMap
    val dir = new Path(snapDir(groupRoot))
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(s"${snapDir(groupRoot)}/.SNAP-$id.tmp")
    graft.core.LocalFs.writeSmall(fs, tmp, pinned.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t:$v" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    val dst = new Path(s"${snapDir(groupRoot)}/SNAP-$id")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) sys.error(s"snapshot commit failed for $groupRoot")
    // sweep: keep the newest `keep` snapshot files. Readers resolve a
    // snapshot by its immutable file, so sweeping never changes what a
    // reader already holds — it only narrows how far back [[at]] goes.
    val ids = fs.listStatus(dir).map(_.getPath).flatMap(snapId).sorted
    ids.dropRight(keep).foreach(old =>
      fs.delete(new Path(s"${snapDir(groupRoot)}/SNAP-$old"), false))
    pinned
  }

  /** Newest committed snapshot: (id, table → pinned version). */
  def latest(spark: SparkSession, groupRoot: String): Option[(Long, Map[String, Long])] = {
    val fs = fsOf(spark, groupRoot)
    val dir = new Path(snapDir(groupRoot))
    if (!fs.exists(dir)) return None
    fs.listStatus(dir).map(_.getPath)
      .flatMap(p => snapId(p).map(_ -> p)).sortBy(-_._1).headOption
      .map { case (id, p) => id -> parse(fs, p) }
  }

  /** A specific retained snapshot's pins (None if swept or never
    * committed) — snapshot-grain time travel: every table read at the
    * SAME returned cut is mutually consistent. */
  def at(spark: SparkSession, groupRoot: String, id: Long): Option[Map[String, Long]] = {
    val fs = fsOf(spark, groupRoot)
    val p = new Path(s"${snapDir(groupRoot)}/SNAP-$id")
    if (!fs.exists(p)) None else Some(parse(fs, p))
  }

  /** Read `table` at the newest snapshot's pinned version — consistent
    * with every other table read through the same snapshot, regardless
    * of merges committed since. Falls back to the live read for a
    * group with no snapshot yet. */
  def readTable(spark: SparkSession, groupRoot: String, table: String): DataFrame =
    latest(spark, groupRoot) match {
      case Some((_, pins)) if pins.contains(table) =>
        LogMirror.readAsOf(spark, s"$groupRoot/$table", pins(table))
      case _ => LogMirror.read(spark, s"$groupRoot/$table")
    }

  /** Read `table` at a RETAINED historical snapshot — the cross-table
    * generalization of [[LogMirror.readAsOf]]: a group-consistent
    * as-of-batch read. Throws if the snapshot was swept (raise `keep`)
    * or the table wasn't part of the group at that snapshot; resolves
    * only while the table's own segment retention covers the pin. */
  def readTableAt(spark: SparkSession, groupRoot: String, table: String,
                  id: Long): DataFrame =
    at(spark, groupRoot, id) match {
      case None => throw new LogMirror.RetentionLostException(
        s"snapshot $id of $groupRoot was swept or never committed " +
          "(snapshot retention = keep)")
      case Some(pins) if !pins.contains(table) =>
        sys.error(s"table $table was not part of snapshot $id of $groupRoot")
      case Some(pins) =>
        LogMirror.readAsOf(spark, s"$groupRoot/$table", pins(table))
    }
}
