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

  /** Test-only interleaving hook, called at the named race points
    * ("close-moved-aside", "takeover-observed", "takeover-moved-aside")
    * so specs can force a rival's action INSIDE the otherwise
    * nanosecond-wide windows. No-op in production.
    */
  @volatile private[pipeline] var interleaveHook: (String, Path) => Unit = (_, _) => ()

  /** Overlap markers under `workRoot` — each records a REPAIR FAILURE
    * (the two loud-log paths below rename their tombstone to
    * `.graft-run.lock.overlap-*`), i.e. a window where two runs may have
    * overlapped. Operators/monitors poll this instead of scraping logs;
    * the affected loads should be audited (they are idempotent
    * truncate-overwrites, so re-running the table is the fix). Transient
    * `closing-`/`stale-` tombstones from in-flight or killed-mid-close
    * releases are deliberately EXCLUDED — a holder killed between its
    * move-aside and delete leaves one without any second run existing,
    * and the stale TTL already covers that case.
    */
  def overlapAudit(workRoot: String): Seq[Path] = {
    val dir = Paths.get(workRoot)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith(".graft-run.lock.overlap-"))
          .toSeq
      } finally s.close()
    }
  }

  /** Best-effort promotion of a failed-repair tombstone to an overlap
    * marker (what [[overlapAudit]] reports). Falls back to leaving the
    * original tombstone if the rename fails — the loud log line is then
    * the only signal.
    */
  private def markOverlap(tomb: Path, kind: String): Path = {
    val marker = tomb.resolveSibling(
      s".graft-run.lock.overlap-$kind-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    try { Files.move(tomb, marker); marker }
    catch { case _: java.io.IOException => tomb }
  }

  /** A held lock; releasing deletes the lock file — but ONLY if the file
    * still carries this holder's unique token. A holder that legitimately
    * outlives the stale TTL and gets usurped must not delete the usurper's
    * lock on exit (which would let a third run start concurrently). The
    * ownership re-check is ATOMIC, same rename-verify shape as takeover:
    * rename the lock aside, verify the moved content is ours, then delete.
    * Rename has one winner, so a takeover racing this close() either moved
    * the file first (our move throws → nothing left to release) or loses
    * its own move — a plain read-then-delete had a window where close()
    * could delete a usurper's fresh lock right at the staleness boundary.
    * AutoCloseable so a `Using`/try-finally releases on the failure path.
    */
  final class Held private[RunLock] (val path: Path, token: String) extends AutoCloseable {
    def close(): Unit = {
      val tomb = path.resolveSibling(
        s".graft-run.lock.closing-${ProcessHandle.current().pid()}-${System.nanoTime()}")
      try {
        Files.move(path, tomb)
        interleaveHook("close-moved-aside", path)
        val content = new String(Files.readAllBytes(tomb), "UTF-8")
        if (content == token) Files.deleteIfExists(tomb)
        else {
          // We were usurped and just moved the usurper's live lock aside:
          // put it back. If a rival created a new lock in the gap the
          // move-back fails — leave the tombstone in place as an audit
          // marker (see the takeover comment for the same tradeoff).
          try { Files.move(tomb, path); () }
          catch {
            case _: java.io.IOException =>
              val marker = markOverlap(tomb, "close")
              System.err.println(
                s"[RunLock] close(): usurped lock could not be restored; " +
                  s"possible run overlap — marker at $marker")
          }
        }
      } catch { case _: java.io.IOException => () } // already gone/usurped — nothing to release
      ()
    }
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
    // pid + nonce: a unique token per acquire attempt, so ownership is
    // VERIFIABLE — takeover checks it stole the lock it observed stale
    // (not a fresh one created in the age-check→move window), and close()
    // deletes only a file still carrying this token.
    val token =
      s"pid=${ProcessHandle.current().pid()}\nnonce=${java.util.UUID.randomUUID()}\n" +
        s"acquired=${java.time.Instant.now()}\n"
    def create(): Option[Held] =
      try {
        Files.write(path, token.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
        Some(new Held(path, token))
      } catch { case _: java.nio.file.FileAlreadyExistsException => None }
    create().orElse {
      // Snapshot content + age together: the takeover below must prove it
      // moved THIS observed-stale lock, not a newer one.
      val observed: Option[String] =
        try {
          val age = System.currentTimeMillis() - Files.getLastModifiedTime(path).toMillis
          if (age > staleAfterMillis) Some(new String(Files.readAllBytes(path), "UTF-8"))
          else None
        } catch { case _: java.io.IOException => None } // holder just released → retry below
      observed.foreach(_ => interleaveHook("takeover-observed", path))
      observed match {
        case Some(staleContent) =>
          val tombstone = path.resolveSibling(
            s".graft-run.lock.stale-${ProcessHandle.current().pid()}-${System.nanoTime()}")
          val wonTakeover =
            try {
              Files.move(path, tombstone)
              interleaveHook("takeover-moved-aside", path)
              // Verify the victim: if the moved file's content differs from
              // the observed-stale snapshot, the presumed-dead holder
              // released and a FRESH acquirer re-created the lock inside
              // the age-check→move window — we just stole a live lock.
              // Repair by moving it back (path can't have been re-created:
              // rename made us the only one who thinks it's free, and a
              // rival create() in the gap makes the move-back fail, which
              // still yields) and stand down.
              val victim = new String(Files.readAllBytes(tombstone), "UTF-8")
              if (victim == staleContent) { Files.deleteIfExists(tombstone); true }
              else {
                try { Files.move(tombstone, path); () }
                catch {
                  case _: java.io.IOException =>
                    // RESIDUAL WINDOW (known, narrow): we stole a LIVE lock
                    // and a rival create() beat the move-back, so the fresh
                    // holder runs without a lock file while the rival also
                    // holds one — a brief possible overlap. Deleting the
                    // tombstone here would make that overlap invisible;
                    // promote it to an overlapAudit marker and log loudly.
                    val marker = markOverlap(tombstone, "steal")
                    System.err.println(
                      s"[RunLock] takeover repair failed: stole a live lock and a rival " +
                        s"re-created $path before move-back; possible run overlap — " +
                        s"victim content preserved at $marker")
                }
                false
              }
            }
            catch { case _: java.io.IOException => false } // a rival moved it first
          if (wonTakeover) create() else None
        case None if !Files.exists(path) => create()
        case None => None
      }
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
