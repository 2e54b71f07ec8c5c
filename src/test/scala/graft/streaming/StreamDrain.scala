package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** THE bounded-drain implementation for every streaming twin spec —
  * factored from CdcAgeSpec's round-15 TTL-hang fix (round-15 verdict
  * #6: eleven specs hand-rolled drain/stop logic, and the TTL hang
  * showed the failure class lives exactly there).
  *
  * Two sound drain shapes exist, and every test must use one of them:
  *
  *   - [[boundedAwait]] for FINITE passes (`Trigger.AvailableNow`):
  *     the engine terminates on its own once the input is consumed —
  *     but a bare `awaitTermination()` turns any regression into a
  *     wedged suite (the round-14 forensics: a ProcessingTime-timer
  *     operator under AvailableNow spun empty micro-batches for 22-65
  *     minutes, because wall-clock timers always promise more work).
  *     The bounded form converts that hang class into a FAILING TEST
  *     with a diagnosis, stopping the query so the suite keeps running.
  *
  *   - [[untilSink]] for streams NO engine signal can terminate
  *     (ProcessingTime timers, deliberate continuous triggers): run the
  *     stream as the continuous query it is, poll the exactly-once
  *     parquet SINK until the caller's expected state appears, then
  *     stop externally. `processAllAvailable()` is NEVER sound there —
  *     the forced timer batches keep the engine from latching its
  *     no-new-data flag (CdcStream.ttlAgedView scaladoc has the full
  *     root-cause).
  */
object StreamDrain {

  /** Generous for a quiet box, small next to the suite budget — a pass
    * that takes this long IS the failure being diagnosed.
    */
  val DefaultTimeoutMs: Long = 180000L

  /** Drain a finite (AvailableNow) pass: await up to `timeoutMs`, and on
    * timeout stop the query and FAIL the test instead of wedging the
    * suite. Query errors (StreamingQueryException) propagate as before.
    */
  def boundedAwait(q: StreamingQuery, timeoutMs: Long = DefaultTimeoutMs): Unit = {
    val finished =
      try q.awaitTermination(timeoutMs)
      catch {
        case e: Throwable =>
          if (q.isActive) { q.stop(); q.awaitTermination() }
          throw e
      }
    if (!finished) {
      q.stop()
      q.awaitTermination()
      throw new AssertionError(
        s"stream did not terminate within $timeoutMs ms under AvailableNow — " +
          "the hang class CdcStream.ttlAgedView documents (a wall-clock-timer " +
          "operator can never satisfy the engine's completion check); drain " +
          "such streams with untilSink instead")
    }
  }

  /** Sink-conditioned drain for streams the engine cannot terminate:
    * poll the exactly-once parquet sink at `out` until `done` holds,
    * then stop the query externally; a hard failure at the deadline
    * instead of a wedged suite. The sink's metadata log makes its
    * counts exact conditions.
    */
  def untilSink(
      spark: SparkSession,
      q: StreamingQuery,
      out: String,
      timeoutMs: Long = 90000L)(done: DataFrame => Boolean): Unit =
    untilCondition(q, timeoutMs)(() =>
      scala.util.Try(spark.read.parquet(out)).toOption.exists(done))

  /** The general external-condition drain `untilSink` builds on — for
    * memory sinks, side-effect observers, or anything else a parquet
    * read does not express. Polls `ok` until it holds or the deadline
    * passes, then stops the query either way; failure is a thrown
    * diagnosis, never a wedged suite.
    */
  def untilCondition(q: StreamingQuery, timeoutMs: Long = 90000L)(ok: () => Boolean): Unit = {
    try {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!ok() && System.currentTimeMillis() < deadline) Thread.sleep(250L)
      if (!ok())
        throw new AssertionError(
          s"sink-conditioned drain did not reach its expected state within $timeoutMs ms")
    } finally {
      q.stop()
      q.awaitTermination()
    }
  }
}
