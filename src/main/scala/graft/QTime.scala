package graft

/** Ad-hoc single-query timer: runs named registered queries end-to-end
  * through the noop sink (same measurement as Bench) N times each and
  * prints per-run seconds — for comparing plan variants without editing
  * the headline set. Usage: runMain graft.QTime <sfDir> <reps> <name...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = Sessions.build("graft-qtime")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    names.foreach { n =>
      val q = Registry.byName(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n%-24s ${ts.map(t => f"$t%.2f").mkString(" ")}  min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
