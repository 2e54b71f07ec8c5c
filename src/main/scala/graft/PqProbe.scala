package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage budget for the compressed late-interaction path (round-15
  * verdict #2 follow-through): times each stage of q_late_interaction_pq
  * in isolation so the serving-cost work targets the real bottleneck
  * instead of the assumed one (round-14 assumed the TRAINER dominated;
  * the v8 bench measured it at 2.1 s of a 15.3 s query).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-pq-probe")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = graft.core.Tables(spark, sfDir, "documents")
    docs.count()
    val books = t("train(cold)") { graft.ext.SearchQueries.pqTokenBooks(spark, sfDir) }
    t("train(warm)") { graft.ext.SearchQueries.pqTokenBooks(spark, sfDir) }
    // replicate the query's internal stages
    val vecs = graft.ext.SearchQueries.tokenVecs(docs)
    t("tokenVecs.count") { vecs.count() }
    val enc = t("codes(cold)") { graft.ext.SearchQueries.pqTokenCodes(spark, sfDir) }
    t("codes(warm)") { graft.ext.SearchQueries.pqTokenCodes(spark, sfDir) }
    val rec = t("decode+ckpt") {
      graft.ext.Pq.decode(enc, books)
        .select(expr("vec_id div 16").as("n_id"), col("embedding").as("cv"))
        .withColumn("cn2", graft.ext.Similarity.dot(col("cv"), col("cv")))
        .localCheckpoint(true)
    }
    t("compressed-scan") {
      val q = vecs.filter(col("doc_id") < 3 && col("pos") < 4)
        .select(col("doc_id").as("q_id"), col("pos").as("qi"),
          col("tv").as("qv"), col("tn2").as("qn2"))
      q.join(rec, col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"), col("qi"),
          (graft.ext.Similarity.dot(col("qv"), col("cv")) /
            (sqrt(col("qn2")) * sqrt(col("cn2")))).as("sim"))
        .groupBy(col("q_id"), col("n_id"), col("qi"))
        .agg(max(col("sim")).as("ms"))
        .count()
    }
    t("full-query(warm, 1st)") {
      Registry.byName("q_late_interaction_pq").run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    t("full-query(warm, 2nd)") {
      Registry.byName("q_late_interaction_pq").run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    t("mv-baseline") {
      Registry.byName("q_late_interaction_mv").run(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
