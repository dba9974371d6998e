package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only Hadoop filesystem: the local filesystem under a `failfs://`
  * scheme whose `delete()` can be toggled to FAIL (return false, delete
  * nothing) for paths whose name contains a needle — the injection seam
  * for the consumed-manifest cleanup discipline, and a live check that
  * the claim stores really do speak any `org.apache.hadoop.fs.FileSystem`
  * (they never see `java.nio` paths). Registered per test via
  * `fs.failfs.impl`; no AbstractFileSystem binding exists, so the CURRENT
  * marker swap also exercises [[graft.sources.Hfs.writeStringAtomic]]'s
  * non-atomic fallback path on this scheme. */
class FailingDeleteFs extends RawLocalFileSystem {
  override def getScheme: String = "failfs"
  override def getUri: URI = URI.create("failfs:///")
  override def delete(p: Path, recursive: Boolean): Boolean =
    if (FailingDeleteFs.failing.get() && p.getName.contains(FailingDeleteFs.needle))
      false
    else super.delete(p, recursive)
}

object FailingDeleteFs {
  val failing = new java.util.concurrent.atomic.AtomicBoolean(false)
  @volatile var needle: String = ".parquet"
}
