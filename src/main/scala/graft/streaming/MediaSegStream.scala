package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ext.{MediaCodec, Phash}

/** Streaming twin of the scene-cut detector (`q_scene_cuts`) — the
  * production shape of video clip extraction AT INGEST: media objects
  * arrive as (vid, payload) rows (an object-store landing zone), and
  * each is segmented as it lands, so clip boundaries exist by the time
  * the item reaches the curation sweep instead of waiting for a batch
  * pass over the corpus.
  *
  * STATELESS — the eleventh streaming twin, second of the no-state
  * class ([[DsirStream]] was the first): a video's scene boundaries
  * depend only on its own frames, and the whole payload arrives as one
  * row, so segmentation is a per-row flatMap (decode → per-frame luma
  * dHash → consecutive-hamming cuts → run-length scenes emitted as one
  * row per scene). No watermark, no shuffle, no state store;
  * exactly-once comes free from the file sink's metadata log, and
  * Trigger.AvailableNow terminates normally (no timers).
  *
  * The contract is EXACT set equality with the batch chain: the batch
  * query detects cuts with a lag window over an exploded frame table
  * while this twin walks the hashes imperatively inside the row — two
  * independent implementations of the same segmentation, which is what
  * makes the MediaSegStreamSpec equality a real cross-check rather
  * than shared-code tautology (the hash kernel itself IS shared:
  * [[graft.ext.Phash.dHashLuma]] on [[graft.ext.MediaCodec.lumaFrames]]
  * output, so the two sides cannot drift on decode).
  *
  * Scale shape: per arrival the work is O(frames · hash) with zero
  * exchanges — the view runs at source parallelism on any cluster
  * size. A malformed payload (decode None) contributes zero rows, the
  * dead-letter-free skip an ingest segmenter wants (the strict-parser
  * rejection itself is gated in MediaSegSpec).
  */
object MediaSegStream {

  /** Scene rows (vid, scene_id, start_frame, n_frames) for one payload;
    * empty for anything [[MediaCodec.lumaFrames]] rejects. Cut rule
    * identical to the batch chain: hamming(h_f, h_{f-1}) >= 16.
    */
  def sceneRows(vid: Long, payload: Array[Byte]): Iterator[(Long, Int, Int, Long)] =
    MediaCodec.lumaFrames(payload) match {
      case None => Iterator.empty
      case Some((w, h, frames)) =>
        val hashes = frames.map(Phash.dHashLuma(w, h, _))
        val out = Vector.newBuilder[(Long, Int, Int, Long)]
        var sceneId = 0
        var sceneStart = 0
        var f = 1
        while (f < hashes.length) {
          if (java.lang.Long.bitCount(hashes(f) ^ hashes(f - 1)) >= 16) {
            out += ((vid, sceneId, sceneStart, (f - sceneStart).toLong))
            sceneId += 1
            sceneStart = f
          }
          f += 1
        }
        out += ((vid, sceneId, sceneStart, (hashes.length - sceneStart).toLong))
        out.result().iterator
    }

  /** Segment a (vid, payload) stream into scene rows. Works on batch
    * frames too (the spec's equality side); on a streaming frame the
    * flatMap is stateless, so any trigger drains and terminates.
    */
  def sceneView(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .selectExpr("vid", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (vid, p) => sceneRows(vid, p) }
      .toDF("vid", "scene_id", "start_frame", "n_frames")
  }

  /** Activity segments (aid, seg_id, is_active, start_window, n_windows,
    * peak) for one audio payload — the audio leg of the same ingest
    * twin: per-window peak walk + run-length rollup, identical rule set
    * to the batch chain (threshold 1000, window = 160 samples). Empty
    * for anything [[MediaCodec.pcmSamples]] rejects.
    */
  def activityRows(
      aid: Long, payload: Array[Byte]): Iterator[(Long, Int, Boolean, Int, Long, Int)] =
    MediaCodec.pcmSamples(payload) match {
      case None => Iterator.empty
      case Some(pcm) =>
        val nW = pcm.length / 160
        if (nW == 0) Iterator.empty
        else {
          def peak(wi: Int): Int = {
            var p = 0
            var i = wi * 160
            while (i < (wi + 1) * 160) {
              val a = math.abs(pcm(i).toInt)
              if (a > p) p = a
              i += 1
            }
            p
          }
          val out = Vector.newBuilder[(Long, Int, Boolean, Int, Long, Int)]
          var segId = 0
          var segStart = 0
          var segPeak = peak(0)
          var segActive = segPeak >= 1000
          var wi = 1
          while (wi < nW) {
            val p = peak(wi)
            val active = p >= 1000
            if (active != segActive) {
              out += ((aid, segId, segActive, segStart, (wi - segStart).toLong, segPeak))
              segId += 1
              segStart = wi
              segPeak = p
              segActive = active
            } else if (p > segPeak) segPeak = p
            wi += 1
          }
          out += ((aid, segId, segActive, segStart, (nW - segStart).toLong, segPeak))
          out.result().iterator
        }
    }

  /** Segment an (aid, payload) audio stream into activity segments —
    * same stateless shape as [[sceneView]].
    */
  def activityView(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media
      .selectExpr("aid", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, p) => activityRows(aid, p) }
      .toDF("aid", "seg_id", "is_active", "start_window", "n_windows", "peak")
  }
}
