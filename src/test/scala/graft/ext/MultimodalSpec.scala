package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal decode: real container round-trips (hand-pinned BMP/WAV/Y4M
  * geometry), stub fallback for foreign payloads, resize geometry, frame
  * sampling bounds.
  */
class MultimodalSpec extends SparkSpec {

  private def feats = {
    val media = Multimodal.mediaTable(spark, graft.core.Tables(spark, sf(), "documents"))
    Multimodal.extractFeatures(spark, media).toDF()
  }

  test("hand-built 2x2 BMP: exact bytes and parsed geometry") {
    val bmp = MediaCodec.buildBmp(2, 2, seed = 99L)
    // 54-byte header + 2 rows of 2*3=6 px bytes padded to 8
    assert(bmp.length == 54 + 2 * 8)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    assert((bmp(2) & 0xff) == 70) // little-endian file size, low byte
    assert(MediaCodec.decode(bmp).contains(MediaCodec.Decoded("image", 2, 2, 1)))
  }

  test("hand-built WAV: canonical header, sample-frame count from chunks") {
    val wav = MediaCodec.buildWav(nSamples = 100, sampleRate = 8000, seed = 1L)
    assert(wav.length == 44 + 200)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(MediaCodec.decode(wav).contains(MediaCodec.Decoded("audio", 0, 0, 100)))
  }

  test("hand-built Y4M: header geometry + counted FRAME markers") {
    val y4m = MediaCodec.buildY4m(width = 4, height = 2, nFrames = 3, seed = 7L)
    val header = "YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n"
    assert(new String(y4m.slice(0, header.length), "US-ASCII") == header)
    assert(y4m.length == header.length + 3 * (6 + 4 * 2 * 3 / 2))
    assert(MediaCodec.decode(y4m).contains(MediaCodec.Decoded("video", 4, 2, 3)))
  }

  test("foreign/truncated payloads fall back to the stub, never throw") {
    assert(MediaCodec.decode("just some text".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decode(Array[Byte]('B', 'M', 1)).isEmpty) // truncated BMP
    val m = Multimodal.MediaIn(5L, "image", "not a container".getBytes("UTF-8"))
    val f = Multimodal.decode(m)
    assert(f.doc_id == 5L && f.width >= 16 && f.n_frames == 1) // stub shape
  }

  test("decode is deterministic and kind matches the container sniff") {
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = feats.orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.size == 500) // sf0.001 documents
    a.foreach { r =>
      val (kind, w, fr) = (r.getAs[String]("kind"), r.getAs[Int]("width"), r.getAs[Int]("n_frames"))
      val id = r.getAs[Long]("doc_id")
      assert(kind == Seq("image", "audio", "video")((id % 3).toInt)) // sniffed == declared
      if (kind == "audio") assert(w == 0 && fr >= 800)
      else assert(w >= 16 && fr >= 1)
    }
  }

  test("resize geometry fits the target box preserving aspect (visual kinds)") {
    val plans = Multimodal.resizePlan(feats).collect()
    assert(plans.nonEmpty)
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

  test("phash: pixel decode round-trips the exact BMP bytes (resize factor 1 is identity)") {
    for (id <- Seq(0L, 7L, 123L)) {
      val bmp = Phash.buildSmoothBmp(16 + (id % 48).toInt, 16 + (id % 27).toInt, id)
      assert(MediaCodec.decode(bmp).exists(_.kind == "image"), "smooth builder must emit a real BMP")
      assert(Phash.resizeBmp(bmp, 1).get.sameElements(bmp),
        "pixels -> writeBmp did not reproduce the payload byte-for-byte")
    }
    // foreign payloads fall back to None, never throw
    assert(Phash.dHash("not a bmp".getBytes).isEmpty)
    assert(Phash.dHash(MediaCodec.buildWav(100, 8000, 1L)).isEmpty)
  }

  test("phash: resized and brightness-shifted variants hash near the base; unrelated images far") {
    val stats = (0L until 600L by 3L).map { id =>
      val base = Phash.buildSmoothBmp(16 + (id % 48).toInt, 16 + (id % 27).toInt, id)
      val hb = Phash.dHash(base).get
      (Phash.hamming(hb, Phash.dHash(Phash.resizeBmp(base, 2).get).get),
        Phash.hamming(hb, Phash.dHash(Phash.brightenBmp(base, 32).get).get),
        hb)
    }
    // the verify threshold the registered query uses is 8; at least 90% of
    // resize variants and ALL brightness variants must clear it
    val okResize = stats.count(_._1 <= 8)
    assert(okResize.toDouble / stats.size >= 0.9,
      s"resize variants within hamming 8: $okResize/${stats.size}")
    assert(stats.forall(_._2 <= 8), s"brightness variant exceeded hamming 8: ${stats.map(_._2).max}")
    // unrelated smooth images sit in the fair-coin regime, far from the
    // verify threshold
    val hashes = stats.map(_._3)
    val cross = for (i <- hashes.indices; j <- i + 1 until hashes.size)
      yield Phash.hamming(hashes(i), hashes(j))
    assert(cross.min > 8, s"two unrelated images collided at hamming ${cross.min}")
  }

  test("phash gate: planted variants recovered through banding, candidates bounded (sf0.001)") {
    val row = graft.Registry.byName("q_dedup_phash").run(spark, sf()).head()
    assert(row.getAs[Long]("n_true_pairs") > 0)
    assert(row.getAs[Boolean]("recall_ge_floor"), "banding lost the planted near-dup images")
    assert(row.getAs[Boolean]("candidates_subquadratic"), "band join produced a quadratic candidate set")
  }
}
