package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Single-flight run guard for the batch pipeline — the reference treats a
  * 409 Conflict from its trigger as "another instance is already running"
  * and stops cleanly (app/cloud-sql-exporter/main.py:87-92); here the
  * mutual exclusion is an ATOMIC lock-file create under the work root
  * (CREATE_NEW is atomic on POSIX and on object stores that back
  * checkpoint dirs), so two concurrently scheduled runs over the same
  * warehouse can never interleave loads. The streaming path doesn't need
  * this (checkpointing serializes it, FileChain.scala:19); this covers
  * the cron-kicked [[PipelineMain]] path.
  */
object RunLock {

  /** A held lock; releasing deletes the lock file. AutoCloseable so a
    * `Using`/try-finally releases on the failure path too.
    */
  final class Held private[RunLock] (val path: Path) extends AutoCloseable {
    def close(): Unit = { Files.deleteIfExists(path); () }
  }

  private def lockPath(workRoot: String): Path = Paths.get(workRoot, ".graft-run.lock")

  /** Try to take the lock. None = another run holds it — the caller should
    * exit cleanly (the reference's 409 path). A lock older than
    * `staleAfterMillis` (default 6h — well past the reference's 72-min max
    * run envelope) is presumed crashed and taken over. The takeover is a
    * RENAME of the stale file to a unique tombstone, not a delete: rename
    * has one winner (the source vanishes for every rival), so a racer can
    * never delete the lock a takeover winner just re-created — with a
    * blind deleteIfExists two racers could both end up holding. The
    * rename winner then retries CREATE_NEW once; if yet another fresh
    * acquirer beat it to the create, it still yields — never two holders.
    */
  def tryAcquire(workRoot: String, staleAfterMillis: Long = 6L * 3600 * 1000): Option[Held] = {
    val path = lockPath(workRoot)
    Files.createDirectories(path.getParent)
    val content =
      s"pid=${ProcessHandle.current().pid()}\nacquired=${java.time.Instant.now()}\n"
    def create(): Option[Held] =
      try {
        Files.write(path, content.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        Some(new Held(path))
      } catch { case _: java.nio.file.FileAlreadyExistsException => None }
    create().orElse {
      val stale =
        try {
          val age = System.currentTimeMillis() - Files.getLastModifiedTime(path).toMillis
          age > staleAfterMillis
        } catch { case _: java.io.IOException => false } // holder just released → retry below
      if (stale) {
        val tombstone = path.resolveSibling(
          s".graft-run.lock.stale-${ProcessHandle.current().pid()}-${System.nanoTime()}")
        val wonTakeover =
          try { Files.move(path, tombstone); Files.deleteIfExists(tombstone); true }
          catch { case _: java.io.IOException => false } // a rival moved it first
        if (wonTakeover) create() else None
      } else if (!Files.exists(path)) create()
      else None
    }
  }

  /** Run `body` iff the lock is free; Some(result) when this run executed,
    * None when it yielded to a concurrent holder. The lock is released on
    * BOTH the success and failure path — a crashed body must not wedge the
    * next scheduled run (the stale TTL is only the backstop for a killed
    * JVM that never reached the finally).
    */
  def singleFlight[A](workRoot: String, staleAfterMillis: Long = 6L * 3600 * 1000)(body: => A): Option[A] =
    tryAcquire(workRoot, staleAfterMillis).map { held =>
      try body
      finally held.close()
    }
}
