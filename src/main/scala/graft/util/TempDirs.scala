package graft.util

import java.nio.file.{Files, Path}

/** Temp directories whose lifetime is "until this JVM exits".
  *
  * Several graded queries materialize scratch state (an LSH index
  * warehouse, a streaming checkpoint, a copy-on-write table) whose
  * consumers run AFTER the query builder returns — the returned
  * DataFrame is lazy, so the builder has no after-the-final-action
  * hook to clean at. Deleting eagerly would break the read; never
  * deleting (the r10 state) accumulated /tmp garbage across gate
  * runs. The JVM-exit hook is the correct scope: the dir outlives
  * every consumer in the session and nothing survives the process.
  * Deletion is best-effort — a hook must never turn a clean exit
  * into a failed one. */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  @volatile private var hookInstalled = false

  private def ensureHook(): Unit = if (!hookInstalled) synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        registered.forEach(p => deleteRecursively(p.toFile))))
      hookInstalled = true
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Create a temp directory removed (recursively, best-effort) at
    * JVM exit. Drop-in for `Files.createTempDirectory(prefix)` at
    * call sites whose dir must outlive the calling scope. */
  def create(prefix: String): String = {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }
}
