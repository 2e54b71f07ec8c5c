package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * emits ONE clean JSON line on stdout (plus BENCH_LOCAL.json on disk as a
  * belt-and-braces copy). Each query is forced end-to-end through the
  * `noop` sink — unlike count(), that materializes every column without
  * collecting to the driver. Failures are reported per-query under
  * "errors", never as fake timings.
  *
  * Each query is sampled SAMPLES times in the same JVM and the per-query
  * MIN is reported (total = sum of mins). A single sample under transient
  * box load once recorded a 31× phantom slowdown on the heaviest query;
  * the min over a few same-JVM runs is the only statistic that tracks the
  * code, not the neighbours. The JSON carries "samples" so readers know
  * the protocol.
  */
object Bench {
  private val Samples = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")
    val targets = Registry.headline match {
      case Nil => Registry.all
      case hs  => hs
    }
    // Warm the session (JVM/codegen/FileSourceStrategy) outside the timings.
    // Best-effort: a missing dir must still produce the JSON error report.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    targets.foreach { q =>
      var best = Double.MaxValue
      var i = 0
      while (i < Samples && !errors.contains(q.name)) {
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        i += 1
      }
      // A query that succeeded on an earlier sample but threw on a later
      // one (transient/flaky failure) keeps its valid minimum timing AND
      // the error — silently dropping the timing would shrink "total" and
      // read as a speedup when comparing BENCH jsons across rounds.
      if (best < Double.MaxValue) times(q.name) = best
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Locale.ROOT (via Timing): comma-decimal locales would emit invalid JSON.
    def num(v: Double): String = Timing.fmt3(v)
    val qs = times.map { case (k, v) => s"${jstr(k)}:${num(v)}" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.values.sum
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","samples":$Samples,"queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}"""
    println(line)
    Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    spark.stop()
  }
}
