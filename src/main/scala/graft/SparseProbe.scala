package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage budget for the champion-list sparse-cosine chain
  * (q_sparse_cosine, the ext-tier max): times the signature relation's
  * two formulations (df via count-over-window vs groupBy+join) and the
  * downstream stages, so any optimization targets the measured bottleneck.
  */
object SparseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-sparse-probe")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    t("tf.count") { tf.count() }
    val n = docs.agg(count(lit(1)).as("n"))
    val sigW = Window.partitionBy(col("doc_id")).orderBy(col("w").desc, col("term"))
    t("sig window-df ckpt") {
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), expr("tf * ((n * 1000000) div df)").as("w"))
        .withColumn("rnk", row_number().over(sigW))
        .filter(col("rnk") <= 5)
        .select(col("doc_id"), col("term"), col("w"))
        .localCheckpoint(true)
    }
    t("sig join-df ckpt") {
      val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      tf.join(dfRel, Seq("term"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), expr("tf * ((n * 1000000) div df)").as("w"))
        .withColumn("rnk", row_number().over(sigW))
        .filter(col("rnk") <= 5)
        .select(col("doc_id"), col("term"), col("w"))
        .localCheckpoint(true)
    }
    t("full query (1st)") {
      Registry.byName("q_sparse_cosine").run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    t("full query (2nd)") {
      Registry.byName("q_sparse_cosine").run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
