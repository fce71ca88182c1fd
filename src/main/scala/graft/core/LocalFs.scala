package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Fast path for driver-side CONTROL-PLANE file writes (markers,
  * manifests, _SUCCESS) on local filesystems.
  *
  * Hadoop's LocalFileSystem without the native library forks a `chmod`
  * per `create` and per `mkdirs` (~12 ms / ~4 ms each, measured in
  * this sandbox) — a real tax on paths that write one small file per
  * TABLE per TRIGGER (log-mirror manifests, swap batch markers,
  * agg-view watermarks): ~0.1 s of a 9-table batch's swap loop was
  * exactly these forks. For `file:` filesystems the write goes through
  * java.nio directly (no fork, same bytes, same visibility semantics —
  * local rename/delete already use the Java APIs); any other scheme
  * falls through to `fs.create` unchanged, so HDFS/S3 semantics are
  * untouched.
  *
  * Checksum hygiene: LocalFileSystem keeps `.name.crc` siblings. A
  * bypassed overwrite must remove a stale sibling, or a later
  * checksummed open of the same path would fail verification.
  */
object LocalFs {

  private def isLocal(fs: FileSystem): Boolean = fs.getScheme == "file"

  private def localPath(fs: FileSystem, p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)

  /** Create-or-overwrite `path` with `bytes`. */
  def writeSmall(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit =
    if (isLocal(fs)) {
      val p = localPath(fs, path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, bytes)
      // drop a stale checksum sibling from a previous fs.create
      val crc = p.resolveSibling("." + p.getFileName.toString + ".crc")
      java.nio.file.Files.deleteIfExists(crc)
      ()
    } else {
      val out = fs.create(path, true)
      try out.write(bytes) finally out.close()
    }

  /** Create-or-overwrite an empty file (e.g. _SUCCESS). */
  def touch(fs: FileSystem, path: Path): Unit =
    writeSmall(fs, path, Array.emptyByteArray)

  /** mkdirs without the local shell-exec permission fork. */
  def mkdirs(fs: FileSystem, path: Path): Unit =
    if (isLocal(fs)) {
      java.nio.file.Files.createDirectories(localPath(fs, path))
      ()
    } else {
      fs.mkdirs(path)
      ()
    }
}
