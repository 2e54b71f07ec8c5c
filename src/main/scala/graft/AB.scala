package graft

/** In-JVM A/B of a boolean session conf over named queries: interleaves
  * A/B runs so JIT/GC drift hits both arms equally. Usage:
  * runMain graft.AB <sfDir> <confKey> <reps> <name...>
  */
object AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val key = args(1); val reps = args(2).toInt
    val names = args.drop(3)
    val spark = Sessions.build("graft-ab")
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    names.foreach { n =>
      val q = Registry.byName(n)
      def time(v: String): Double = {
        spark.conf.set(key, v)
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      time("true"); time("false") // warm both arms
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ => a += time("true"); b += time("false") }
      println(f"AB $n%-24s $key=true  ${a.map(t => f"$t%.2f").mkString(" ")}  min=${a.min}%.2f")
      println(f"AB $n%-24s $key=false ${b.map(t => f"$t%.2f").mkString(" ")}  min=${b.min}%.2f")
    }
    spark.stop()
  }
}
