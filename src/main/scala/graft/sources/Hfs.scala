package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** The ONE filesystem seam for the store maintenance plane (ClaimStore
  * folds, TailCounter, the CURRENT marker swap): every list/stat/read/
  * delete goes through `org.apache.hadoop.fs.FileSystem`, resolved per
  * path — so the generational stores run unchanged wherever 100 TB
  * actually lives (HDFS, S3A, local `file://` in tests). The local
  * filesystem resolves to the checksummed LocalFileSystem, so deletes
  * take the `.crc` sidecars with them (the small-file-accretion trap a
  * raw nio delete leaves behind).
  *
  * Reference analog: the loaders/publishers write through a staging
  * directory abstraction, not raw OS files
  * (amundsendatabuilder loader/file_system_csv_loader.py:30-44). */
private[graft] object Hfs {

  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(path: Path): FileSystem = path.getFileSystem(conf)

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fs(p).exists(p)
  }

  def isDir(path: String): Boolean = {
    val p = new Path(path)
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  /** Immediate children whose NAME satisfies `keep`. */
  def children(dir: String)(keep: String => Boolean): Seq[Path] = {
    val p = new Path(dir)
    val f = fs(p)
    if (!f.exists(p) || !f.getFileStatus(p).isDirectory) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath).filter(c => keep(c.getName))
  }

  /** Total bytes of `.parquet` payload under `path` (recursive) —
    * fold-cost accounting and the tier/major size triggers. Plain
    * `listStatus` recursion, NOT `listFiles(recursive)`: the located-
    * status iterator resolves block locations per file, which on a
    * partitioned generation (hundreds of key directories) costs seconds
    * where a status walk costs milliseconds. */
  def parquetBytes(path: Path): Long = {
    val f = fs(path)
    if (!f.exists(path)) 0L
    else {
      def walk(st: org.apache.hadoop.fs.FileStatus): Long =
        if (st.isDirectory) f.listStatus(st.getPath).map(walk).sum
        else if (st.getPath.getName.endsWith(".parquet")) st.getLen
        else 0L
      walk(f.getFileStatus(path))
    }
  }

  /** Does any `.parquet` file live under `path` (recursive)? Early-exit
    * `listStatus` recursion (see [[parquetBytes]] on why not
    * `listFiles(recursive)`). */
  def hasParquet(path: String): Boolean = {
    val p = new Path(path)
    val f = fs(p)
    def walk(st: org.apache.hadoop.fs.FileStatus): Boolean =
      if (st.isDirectory) f.listStatus(st.getPath).exists(walk)
      else st.getPath.getName.endsWith(".parquet")
    f.exists(p) && f.getFileStatus(p).isDirectory &&
      f.listStatus(p).exists(walk)
  }

  def delete(path: Path, recursive: Boolean = true): Boolean = {
    val f = fs(path)
    try f.delete(path, recursive) catch { case _: Exception => false }
  }

  /** Read a small marker/manifest file. Retries a handful of times on
    * ChecksumException: on the local (Checksum)FileSystem a concurrent
    * [[writeStringAtomic]] swap renames the data file and its `.crc`
    * sidecar in two steps, so a reader landing between them verifies new
    * bytes against the stale checksum — a microsecond window that a
    * bounded retry rides out without weakening the old-or-new contract. */
  def readString(path: Path): String = {
    var attempt = 0
    while (true) {
      try {
        val in = fs(path).open(path)
        try return new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          attempt += 1
          if (attempt >= 5) throw e
          Thread.sleep(10L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write `content` at `path` in one shot (create-or-truncate). */
  def writeString(path: Path, content: String): Unit = {
    val out = fs(path).create(path, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** ATOMIC single-file swap: write `<path>.tmp`, then rename ONTO
    * `path` with overwrite — the blue/green commit primitive. Plain
    * `FileSystem.rename` refuses an existing destination, so the swap
    * goes through `FileContext` rename(OVERWRITE), which is atomic on
    * HDFS and on the local filesystem. A scheme with no
    * AbstractFileSystem binding (raw object stores) falls back to
    * delete+rename — not atomic, but neither is anything else on a
    * store without atomic rename; readers there must tolerate a missing
    * marker for the instant between the two calls (every consumer
    * treats an absent CURRENT as "no committed target yet"). */
  def writeStringAtomic(path: Path, content: String): Unit = {
    val f = fs(path)
    f.mkdirs(path.getParent)
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    writeString(tmp, content)
    try {
      val fc = FileContext.getFileContext(f.getUri, conf)
      fc.rename(f.makeQualified(tmp), f.makeQualified(path),
        Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // every step is CHECKED: a marker swap that half-happens must
        // throw, never return with the marker destroyed — a silently
        // missing CURRENT would make the next fold rebuild without the
        // base and then delete it
        if (f.exists(path) && !f.delete(path, false))
          throw new java.io.IOException(
            s"marker swap could not remove the old $path")
        if (!f.rename(tmp, path)) {
          // a concurrent currentTarget reader may have ROLLED THE SWAP
          // FORWARD (renamed our tmp onto the marker) while this writer
          // stalled in the delete-rename window — if the marker now
          // holds exactly the content we were committing, the swap
          // committed and must not be reported as failed
          val healed =
            try readString(path).trim == content.trim
            catch { case _: Exception => false }
          if (!healed)
            throw new java.io.IOException(
              s"marker swap could not move $tmp onto $path")
        }
    }
  }
}
