package graft.streaming

/** Driver-side retry with exponential backoff — the exporter's poll loop
  * (reference: app/cloud-sql-exporter/export_table.py:28-34:
  * `sleep((2 ** n) + randint(0, 1000) / 1000)`, 8 rounds).
  *
  * Jitter comes from a seeded PRNG so tests are deterministic; pass a real
  * seed in production use. This is orchestration-side only (external API
  * polling) — task-level retries inside queries are Spark's own
  * `spark.task.maxFailures`.
  */
object Retry {

  /** Backoff delays in seconds for attempts 0..n-1: 2^i + jitter∈[0,1). */
  def backoffSchedule(attempts: Int, seed: Long = 42L): Seq[Double] = {
    val rnd = new scala.util.Random(seed)
    (0 until attempts).map(i => math.pow(2, i) + rnd.nextInt(1000) / 1000.0)
  }

  /** Run `op` until it succeeds or `maxAttempts` exhaust; `sleeper` is
    * injectable for tests. Returns Right(result) or Left(last error).
    */
  def withBackoff[A](
      maxAttempts: Int = 8,
      seed: Long = 42L,
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong))(
      op: () => A): Either[Throwable, A] = {
    val delays = backoffSchedule(maxAttempts, seed)
    var last: Throwable = null
    var i = 0
    while (i < maxAttempts) {
      try return Right(op())
      catch {
        case e: Throwable =>
          last = e
          if (i < maxAttempts - 1) sleeper(delays(i))
      }
      i += 1
    }
    Left(last)
  }
}
