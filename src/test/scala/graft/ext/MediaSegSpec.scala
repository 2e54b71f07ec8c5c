package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the temporal-segmentation fixtures and kernels behind
  * q_scene_cuts / q_audio_activity: the detection margins the queries'
  * exact oracles rely on are MEASURED here on the real built-and-parsed
  * bytes — within-shot hamming must be exactly 0 (dHash brightness
  * invariance, with the jitter proven live at the byte level so the
  * invariance claim isn't vacuous) and cross-shot exactly 64 (the ramp
  * direction flip inverts every pooled comparison); audio window peaks
  * must equal the planted amplitudes bit-for-bit through the PCM codec.
  */
class MediaSegSpec extends SparkSpec {

  test("shot fixture: within-shot hamming 0 (live jitter), cross-shot hamming 64") {
    for (id <- Seq(2L, 5L, 8L, 11L, 20L, 47L)) {
      val w = 16 + (id % 4).toInt * 8
      val h = 8 + (id % 2).toInt * 8
      val nShots = 2 + (id % 4).toInt
      val lens = (0 until nShots).map(sh => 2 + ((id + sh) % 3).toInt)
      val (pw, ph, frames) =
        MediaCodec.lumaFrames(MediaCodec.buildShotY4m(w, h, lens, id)).get
      assert(pw == w && ph == h && frames.length == lens.sum)
      val hashes = frames.map(Phash.dHashLuma(pw, ph, _))
      val bounds = lens.scanLeft(0)(_ + _) // shot start frames + total
      for (f <- 1 until frames.length) {
        val ham = java.lang.Long.bitCount(hashes(f) ^ hashes(f - 1))
        if (bounds.contains(f)) assert(ham == 64, s"id=$id boundary at $f: hamming $ham")
        else {
          assert(ham == 0, s"id=$id within-shot at $f: hamming $ham")
          // the invariance is load-bearing, not vacuous: the frames DIFFER
          assert(!java.util.Arrays.equals(frames(f), frames(f - 1)),
            s"id=$id frames $f-1,$f are byte-identical — jitter is dead")
        }
      }
    }
  }

  test("repeated shot patterns (the Stress media axis) keep the exact 0/64 margins") {
    // the Stress tier grows frames-per-item by repeating the shot pattern
    // (lens index folded by sh % nShots) — every block seam is still a
    // consecutive-index direction flip, so the margins must not soften
    for (id <- Seq(7L, 12L)) {
      val w = 16 + (id % 4).toInt * 8
      val h = 8 + (id % 2).toInt * 8
      val nShots = 2 + (id % 4).toInt
      val lens = (0 until nShots * 3).map(sh => 2 + ((id + sh % nShots) % 3).toInt)
      val (pw, ph, frames) =
        MediaCodec.lumaFrames(MediaCodec.buildShotY4m(w, h, lens, id)).get
      val hashes = frames.map(Phash.dHashLuma(pw, ph, _))
      val bounds = lens.scanLeft(0)(_ + _)
      for (f <- 1 until frames.length) {
        val ham = java.lang.Long.bitCount(hashes(f) ^ hashes(f - 1))
        assert(ham == (if (bounds.contains(f)) 64 else 0), s"id=$id frame $f: hamming $ham")
      }
    }
  }

  test("luma parser is strict: truncated frame and foreign payload reject to None") {
    val ok = MediaCodec.buildShotY4m(16, 8, Seq(2, 2), id = 3L)
    assert(MediaCodec.lumaFrames(ok).isDefined)
    assert(MediaCodec.lumaFrames(ok.dropRight(5)).isEmpty)
    assert(MediaCodec.lumaFrames(MediaCodec.buildBmp(4, 4, 1L)).isEmpty)
  }

  test("activity fixture: every window's peak equals the planted section amplitude") {
    for (id <- Seq(1L, 4L, 7L, 10L, 31L)) {
      val nSec = 3 + (id % 3).toInt
      val lens = (0 until nSec).map(sc => 2 + ((id + sc) % 3).toInt)
      val pcm = MediaCodec.pcmSamples(MediaCodec.buildActivityWav(lens, 160, 16000, id)).get
      assert(pcm.length == lens.sum * 160)
      val starts = lens.scanLeft(0)(_ + _)
      for (wi <- 0 until lens.sum) {
        val sec = starts.lastIndexWhere(_ <= wi, starts.length - 2) match {
          case -1 => 0
          case k => k
        }
        val expected =
          if (sec % 2 == 0) (2000L + (id + sec) * 37 % 1000).toInt
          else ((id + sec) * 13 % 200).toInt
        val peak = (wi * 160 until (wi + 1) * 160).map(i => math.abs(pcm(i).toInt)).max
        assert(peak == expected, s"id=$id window $wi (section $sec): $peak != $expected")
      }
    }
  }

  test("pcm parser is strict: foreign container and non-PCM fmt reject to None") {
    val ok = MediaCodec.buildActivityWav(Seq(2, 2), 160, 16000, id = 1L)
    assert(MediaCodec.pcmSamples(ok).isDefined)
    assert(MediaCodec.pcmSamples(MediaCodec.buildY4m(4, 2, 1, 1L)).isEmpty)
    val nonPcm = ok.clone()
    nonPcm(20) = 3 // audioFormat: 1 (PCM) → 3 (IEEE float)
    assert(MediaCodec.pcmSamples(nonPcm).isEmpty)
  }

  test("detected segmentation matches the planted structure end-to-end at sf") {
    val scenes = graft.Registry.byName("q_scene_cuts").run(spark, sf()).collect()
    val vids = scenes.map(_.getLong(0)).distinct
    assert(vids.nonEmpty)
    for (vid <- vids.take(20)) {
      val rows = scenes.filter(_.getLong(0) == vid).sortBy(_.getInt(1))
      val expectedLens = (0 until 2 + (vid % 4).toInt).map(sh => 2L + (vid + sh) % 3)
      assert(rows.map(_.getLong(3)).toSeq == expectedLens, s"vid=$vid scene lengths")
      assert(rows.map(_.getInt(2)).toSeq ==
        expectedLens.scanLeft(0L)(_ + _).dropRight(1).map(_.toInt), s"vid=$vid starts")
    }
    val segs = graft.Registry.byName("q_audio_activity").run(spark, sf())
      .filter(col("is_active")).agg(count(lit(1))).head().getLong(0)
    assert(segs > 0)
  }
}
