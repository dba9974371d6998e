package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** pid-scoped tmp stores with JVM-exit cleanup — the one shared home for
  * the walk-and-delete loop and the `<tmpdir>/<prefix>-<pid>` root
  * pattern every staging operator uses (staged IVF, pipeline publish,
  * stream publish, quality-filter stream). pid scoping isolates
  * concurrent graft JVMs (Verify while Bench runs); the exit hook keeps
  * tmp from accumulating across runs.
  */
private[graft] object TmpStores {

  def deleteRecursively(path: Path): Unit =
    if (Files.exists(path)) {
      val walk = Files.walk(path)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { try Files.delete(p) catch { case _: Exception => () } })
      finally walk.close()
    }

  /** `<tmpdir>/<prefix>-<pid>`, created now, deleted on JVM exit. */
  def pidScopedRoot(prefix: String): Path = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"$prefix-${ProcessHandle.current().pid()}")
    Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p)))
    p
  }
}
