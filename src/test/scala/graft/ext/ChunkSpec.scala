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
