package graft.core

import java.nio.file.{Files, Path}

/** Process-lifetime temp directories for queries that must materialize an
  * intermediate (iterative plans, format round-trips). Bench/Verify re-run
  * each query several times per session, so per-call directories that are
  * never reclaimed leak a full data copy per run until /tmp fills; every
  * dir handed out here is recursively deleted by one JVM shutdown hook.
  */
object Tmp {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(p => deleteRec(p.toFile))
    }))

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(); ()
  }

  /** Create a temp dir cleaned up at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Eagerly delete a dir previously returned by [[dir]] (for callers that
    * know the intermediate is dead, e.g. per-merge-round snapshots).
    */
  def release(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    created.remove(p)
    deleteRec(p.toFile)
  }
}
