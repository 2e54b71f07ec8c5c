package graft.ext

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** q_chunk_overlap: the sliding-window chunker's coverage contract —
  * every token of every document lands in at least one chunk, indices are
  * dense, and reassembling the stride-prefix of each chunk reproduces the
  * document exactly (the property that makes overlapped chunks safe to
  * de-overlap downstream).
  */
class ChunkSpec extends SparkSpec {

  test("chunker covers every token, indices dense, widths as specified") {
    val dir = sf()
    val chunks = Registry.byName("q_chunk_overlap").run(spark, dir).collect()
    val nTok = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == nTok.keySet, "every document chunks")
    byDoc.foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // dense 0..m-1 indices, starts at stride spacing
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq == (0L until sorted.length))
      sorted.foreach { c =>
        val st = c.getAs[Long]("start_tok")
        assert(st == c.getAs[Long]("chunk_idx") * 30)
        assert(c.getAs[Long]("n_tok") == math.min(40L, n - st))
        assert(c.getAs[String]("chunk_text").split(" ").length == c.getAs[Long]("n_tok"))
      }
      // coverage: last start < n and consecutive starts differ by 30 < 40
      assert(sorted.last.getAs[Long]("start_tok") < n)
      assert(sorted.head.getAs[Long]("start_tok") == 0L)
    }
  }

  test("chunk corpus edges: 1-token, exactly-stride, exactly-window, window+1 docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"),                                  // 1 token → 1 chunk
      (2L, (1 to 30).map(i => s"t$i").mkString(" ")),  // = stride → 1 chunk
      (3L, (1 to 40).map(i => s"t$i").mkString(" ")),  // = window → 2 chunks (40 > 30 starts)
      (4L, (1 to 41).map(i => s"t$i").mkString(" "))   // window+1 → 2 chunks
    ).toDF("doc_id", "text")
    val chunks = CorpusQueries.chunkCorpus(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val byDoc = chunks.groupBy { case (id, _) => id / CorpusQueries.ChunkIdStride }
    assert(byDoc(1L).length == 1 && byDoc(1L).head._2 == "a")
    assert(byDoc(2L).length == 1)
    assert(byDoc(3L).length == 2, s"40-token doc: ${byDoc(3L).toSeq}")
    assert(byDoc(4L).length == 2)
    // the 40-token doc's second chunk is the 10-token tail from start 30
    val tail3 = byDoc(3L).maxBy(_._1)._2.split(" ")
    assert(tail3.length == 10 && tail3.head == "t31" && tail3.last == "t40")
    // window+1: tail chunk covers t31..t41 (11 tokens) — the last token
    // is never dropped
    val tail4 = byDoc(4L).maxBy(_._1)._2.split(" ")
    assert(tail4.length == 11 && tail4.last == "t41")
  }

  test("synthetic chunk ids cannot collide: corpus max chunk count is far under the id stride") {
    val maxChunks = graft.core.Tables(spark, sf(), "documents")
      .select(expr(s"size(split(text, ' ')) div ${CorpusQueries.ChunkStride} + 1L").as("m"))
      .agg(max(col("m"))).head().getLong(0)
    // ChunkIdStride slots per doc_id: a doc would need ~stride·2^20
    // tokens to collide with the next doc's chunk ids. Assert with 16×
    // headroom so even a much longer future corpus trips this test, not
    // a silent cross-attribution in q_rag_chunk_search.
    assert(maxChunks * 16 < CorpusQueries.ChunkIdStride,
      s"max chunk count $maxChunks approaches id stride ${CorpusQueries.ChunkIdStride}")
  }

  test("de-overlap reassembly: stride prefixes concatenate back to the document") {
    val dir = sf()
    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    Registry.byName("q_chunk_overlap").run(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .foreach { case (doc, cs) =>
        val toks = cs.sortBy(_.getAs[Long]("chunk_idx")).flatMap { c =>
          val t = c.getAs[String]("chunk_text").split(" ")
          if (c.getAs[Long]("chunk_idx") == cs.length - 1) t else t.take(30)
        }
        assert(toks.mkString(" ") == docs(doc), s"doc $doc does not reassemble")
      }
  }
}
