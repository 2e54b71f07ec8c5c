package graft

/** Plan-audit main: dumps `explain("formatted")` for the headline queries
  * (or names given as args) so shuffle/pushdown/broadcast decisions can be
  * reviewed. Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = Sessions.build("graft-explain")
    val targets =
      if (names.nonEmpty) Registry.all.filter(q => names.contains(q.name))
      else Registry.headline
    targets.foreach { q =>
      println(s"\n================ ${q.name} ================")
      try {
        val df = q.run(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"explain failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
