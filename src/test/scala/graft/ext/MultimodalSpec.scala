package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: deterministic stub decode, resize geometry, frame
  * sampling bounds — the Spark-side structure that stays when a real
  * decoder replaces the stub.
  */
class MultimodalSpec extends SparkSpec {

  private def feats = {
    val media = Multimodal.mediaTable(spark, graft.core.Tables(spark, sf(), "documents"))
    Multimodal.extractFeatures(spark, media).toDF()
  }

  test("decode stub is deterministic and total over the corpus") {
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = feats.orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.size == 500) // sf0.001 documents
    assert(a.forall(r => r.getAs[Int]("width") >= 16 && r.getAs[Int]("n_frames") >= 1))
  }

  test("payload bytes round the real binary column path") {
    val media = Multimodal.mediaTable(spark, graft.core.Tables(spark, sf(), "documents"))
    val row = media.filter(col("doc_id") === 0).collect().head
    val text = graft.core.Tables(spark, sf(), "documents")
      .filter(col("doc_id") === 0).collect().head.getAs[String]("text")
    assert(new String(row.payload, "UTF-8") == text)
    assert(Set("image", "audio", "video").contains(row.kind))
  }

  test("resize geometry fits the target box preserving aspect") {
    val plans = Multimodal.resizePlan(feats).collect()
    plans.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(ow <= 224 && oh <= 224, s"$w x $h -> $ow x $oh")
      assert(math.max(ow, oh) == 224, "long side must hit the target")
    }
  }

  test("frame sampling emits at most maxFrames frames per item") {
    val sampled = Multimodal.sampleFrames(feats)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(sampled <= 8, s"max sampled per item: $sampled")
  }
}
