package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.core.SchemaColumn

/** Single-flight run-lock semantics (reference 409-conflict path):
  * interleaved runs — one executes, one yields; crash release; stale
  * takeover; and table state identical to exactly one run.
  */
class RunLockSpec extends SparkSpec {

  private def tmpRoot = Files.createTempDirectory("runlock").toString

  test("two interleaved runs: second yields, table state = one run") {
    import spark.implicits._
    val root = tmpRoot
    val layout = Pipeline.Layout(root, "2024-03-03")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val cols = Seq(SchemaColumn("id", "bigint"), SchemaColumn("v", "varchar(8)"))
    var secondRan = false
    val first = RunLock.singleFlight(root) {
      // while the first run is mid-flight, a concurrently scheduled run
      // arrives and must yield without touching the warehouse
      val second = RunLock.singleFlight(root) { secondRan = true; "second" }
      assert(second.isEmpty)
      Pipeline.runTable(spark, df, cols, layout, "items").count()
    }
    assert(first.contains(2L) && !secondRan)
    // exactly one run's worth of state, and the lock is released
    assert(spark.read.parquet(layout.warehouse("items")).count() == 2)
    assert(!Files.exists(java.nio.file.Paths.get(root, ".graft-run.lock")))
  }

  test("lock releases on the failure path too") {
    val root = tmpRoot
    intercept[RuntimeException] {
      RunLock.singleFlight(root) { throw new RuntimeException("boom") }
    }
    assert(RunLock.singleFlight(root)(41 + 1).contains(42))
  }

  test("fresh lock blocks; stale lock (crashed holder) is taken over") {
    val root = tmpRoot
    val held = RunLock.tryAcquire(root)
    assert(held.isDefined)
    // fresh lock from a live holder: not stealable even with a tiny TTL
    // guarding a different scheduler — age is 0ms here
    assert(RunLock.tryAcquire(root, staleAfterMillis = 60000).isEmpty)
    // simulate a crashed holder: lock file mtime far in the past
    Files.setLastModifiedTime(
      held.get.path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 100000))
    val takeover = RunLock.tryAcquire(root, staleAfterMillis = 60000)
    assert(takeover.isDefined)
    takeover.get.close()
  }

  test("usurped holder's close() restores the usurper's lock, not deletes it") {
    val root = tmpRoot
    val held = RunLock.tryAcquire(root).get
    Files.setLastModifiedTime(
      held.path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 100000))
    val usurper = RunLock.tryAcquire(root, staleAfterMillis = 60000)
    assert(usurper.isDefined)
    // the original holder exits late: its close() must atomically detect
    // the foreign token and put the usurper's lock back in place
    held.close()
    assert(Files.exists(held.path))
    // the usurper still holds — a third scheduled run yields
    assert(RunLock.tryAcquire(root, staleAfterMillis = 60000).isEmpty)
    usurper.get.close()
    assert(!Files.exists(held.path))
    // no stray closing tombstones left behind on either path
    val strays = Files.list(java.nio.file.Paths.get(root)).toArray.map(_.toString)
    assert(!strays.exists(_.contains(".graft-run.lock")))
    assert(RunLock.overlapAudit(root).isEmpty)
  }

  test("a closing tombstone from a holder killed mid-close is NOT reported as an overlap") {
    val root = tmpRoot
    // a holder killed between close()'s move-aside and delete leaves a
    // closing-* tombstone with no second run in existence — overlapAudit
    // must not raise a false alarm for it (the stale TTL covers recovery)
    Files.writeString(
      java.nio.file.Paths.get(root, ".graft-run.lock.closing-99-1"), "pid=99\n")
    Files.writeString(
      java.nio.file.Paths.get(root, ".graft-run.lock.stale-99-2"), "pid=99\n")
    assert(RunLock.overlapAudit(root).isEmpty)
  }

  test("forced interleaving: rival create inside close()'s move-back window leaves an audit tombstone") {
    val root = tmpRoot
    val held = RunLock.tryAcquire(root).get
    Files.setLastModifiedTime(
      held.path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 100000))
    val usurper = RunLock.tryAcquire(root, staleAfterMillis = 60000)
    assert(usurper.isDefined)
    // force a rival's CREATE_NEW exactly between close()'s move-aside and
    // its move-back — the nanosecond window a wall-clock test can't hit
    try {
      RunLock.interleaveHook = (stage, path) =>
        if (stage == "close-moved-aside")
          Files.write(path, "rival\n".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
      held.close()
    } finally RunLock.interleaveHook = (_, _) => ()
    // the rival's fresh lock must be intact (not deleted, not overwritten)
    assert(new String(Files.readAllBytes(held.path), "UTF-8") == "rival\n")
    // and the failed repair is OBSERVABLE: the usurper's lock content is
    // preserved in a tombstone surfaced by overlapAudit
    val audit = RunLock.overlapAudit(root)
    assert(audit.nonEmpty, "failed move-back left no audit tombstone")
    assert(audit.exists(p => new String(Files.readAllBytes(p), "UTF-8").contains("pid=")))
  }

  test("forced interleaving: takeover that stole a live lock stands down and leaves an audit tombstone") {
    val root = tmpRoot
    val held = RunLock.tryAcquire(root).get
    Files.setLastModifiedTime(
      held.path,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 100000))
    // stage 1 (after the stale snapshot): the presumed-dead holder
    // releases and a FRESH acquirer re-creates the lock;
    // stage 2 (after the takeover's move-aside): yet another rival
    // re-creates the path, so the repair move-back must fail
    try {
      RunLock.interleaveHook = (stage, path) => stage match {
        case "takeover-observed" =>
          Files.delete(path)
          Files.write(path, "fresh-holder\n".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
        case "takeover-moved-aside" =>
          Files.write(path, "rival\n".getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
        case _ => ()
      }
      // the takeover must detect the live steal (content mismatch) and
      // yield — never become a second holder
      assert(RunLock.tryAcquire(root, staleAfterMillis = 60000).isEmpty)
    } finally RunLock.interleaveHook = (_, _) => ()
    // rival's lock intact, stolen live lock preserved for audit
    assert(new String(Files.readAllBytes(held.path), "UTF-8") == "rival\n")
    val audit = RunLock.overlapAudit(root)
    assert(audit.nonEmpty, "failed takeover repair left no audit tombstone")
    assert(audit.exists(p => new String(Files.readAllBytes(p), "UTF-8") == "fresh-holder\n"))
  }
}
