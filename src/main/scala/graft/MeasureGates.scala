package graft.ext

import org.apache.spark.sql.functions._

/** Dev measurement main: prints the RAW numbers behind the
  * fixture-calibrated gate booleans (minhash/simhash candidate volume
  * and recall, PQ/ADC recall) so a driver-side fixture regeneration is
  * re-calibrated from measurements, not guesses.
  * Usage: runMain graft.ext.MeasureGates <sfDir>
  */
object MeasureGates {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.build("graft-measure")
    val docs = graft.core.Tables(spark, d, "documents")
    val nDocs = docs.count()
    val truth = DedupQueries.truthPairsOf(docs).localCheckpoint(true)
    val nTrue = truth.count()
    def rawGate(found: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val f = found.select(col("a_id"), col("b_id")).localCheckpoint(true)
      val nFound = f.count()
      val nHit = truth.join(f, Seq("a_id", "b_id"), "left_semi").count()
      println(s"MEASURE $label: n_docs=$nDocs n_true=$nTrue n_found=$nFound " +
        s"perDoc=${"%.2f".format(nFound.toDouble / nDocs)} " +
        s"recall=${"%.3f".format(nHit.toDouble / math.max(1L, nTrue))}")
    }
    rawGate(Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.3), "minhash")
    val fp = docs.select(col("doc_id"), expr("simhash64(text)").as("fp"))
    val chunks = fp.select(
      col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(i => expr(s"(fp >> ${i * 16}) & 65535")): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("doc_id").as("a_id"), col("fp").as("a_fp"), col("chunk_idx"), col("chunk"))
    val b = chunks.select(col("doc_id").as("b_id"), col("fp").as("b_fp"), col("chunk_idx"), col("chunk"))
    val simFound = a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), expr("bit_count(a_fp ^ b_fp)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 12)
    rawGate(simFound, "simhash")

    // q_pq_adc raw recall at both the registered shortlist and 128
    val emb = graft.core.Tables(spark, d, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val books = Pq.shared(
      s"$d|${graft.core.Tables.fingerprint(d, "embeddings")}|raw|m=8|k=16|iters=6")(
      Pq.train(spark, emb, m = 8, k = 16, iters = 6))
    val enc = Pq.encode(emb, books).select(col("vec_id"), col("m"), col("code"))
    val v = col("embedding").cast("array<double>")
    val q = queries.select(col("vec_id").as("q_id"), v.as("qv"))
    val c = emb.select(col("vec_id").as("n_id"), v.as("cv"))
    val d2 =
      Similarity.dot(col("qv"), col("qv")) + Similarity.dot(col("cv"), col("cv")) -
        lit(2.0) * Similarity.dot(col("qv"), col("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2").asc, col("n_id").asc)
    val exact = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("n_id"))
      .localCheckpoint(true)
    val nEx = exact.count()
    Seq(64, 128, 192).foreach { sl =>
      val approx = Pq.adcRerankTopK(queries, enc, books, emb, k = 10, shortlist = sl)
        .select(col("q_id"), col("vec_id").as("n_id"))
      val hit = exact.join(approx, Seq("q_id", "n_id"), "left_semi").count()
      println(s"MEASURE pq_adc shortlist=$sl: recall=${"%.3f".format(hit.toDouble / nEx)}")
    }
    spark.stop()
  }
}
// threshold sweep main: minhash est-Jaccard + simhash hamming knobs
object MeasureGates2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.build("graft-measure2")
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables(spark, d, "documents")
    val nDocs = docs.count()
    val truth = DedupQueries.truthPairsOf(docs).localCheckpoint(true)
    val nTrue = truth.count()
    Seq(0.3, 0.4, 0.5).foreach { mj =>
      val f = Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = mj)
        .select(col("a_id"), col("b_id")).localCheckpoint(true)
      val nF = f.count()
      val hit = truth.join(f, Seq("a_id", "b_id"), "left_semi").count()
      println(s"MEASURE2 minhash mj=$mj: n_found=$nF perDoc=${"%.2f".format(nF.toDouble / nDocs)} recall=${"%.3f".format(hit.toDouble / math.max(1L, nTrue))}")
    }
    val fp = docs.select(col("doc_id"), expr("simhash64(text)").as("fp"))
    val chunks = fp.select(
      col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(i => expr(s"(fp >> ${i * 16}) & 65535")): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunks.select(col("doc_id").as("a_id"), col("fp").as("a_fp"), col("chunk_idx"), col("chunk"))
    val b = chunks.select(col("doc_id").as("b_id"), col("fp").as("b_fp"), col("chunk_idx"), col("chunk"))
    val pairs0 = a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), expr("bit_count(a_fp ^ b_fp)").as("hamming"))
      .distinct().localCheckpoint(true)
    Seq(12, 8, 6, 4).foreach { h =>
      val f = pairs0.filter(col("hamming") <= h)
      val nF = f.count()
      val hit = truth.join(f.select(col("a_id"), col("b_id")), Seq("a_id", "b_id"), "left_semi").count()
      println(s"MEASURE2 simhash h<=$h: n_found=$nF perDoc=${"%.2f".format(nF.toDouble / nDocs)} recall=${"%.3f".format(hit.toDouble / math.max(1L, nTrue))}")
    }
    spark.stop()
  }
}
