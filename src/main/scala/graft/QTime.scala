package graft

/** Ad-hoc single-query timer: runs named registered queries end-to-end
  * through the shared [[Timing]] harness N times each and prints per-run
  * seconds — for comparing plan variants without editing the headline
  * set. Usage: runMain graft.QTime <sfDir> <reps> <name...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
    val spark = Sessions.build("graft-qtime")
    Timing.warm(spark, sfDir)
    names.foreach { n =>
      val ts = (1 to reps).map(_ => Timing.timeQuery(spark, n, sfDir))
      println(s"QTIME ${n.padTo(24, ' ')} ${ts.map(Timing.fmt).mkString(" ")}  min=${Timing.fmt(ts.min)}")
    }
    spark.stop()
  }
}
