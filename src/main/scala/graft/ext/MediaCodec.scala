package graft.ext

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM builders and header parsers for three REAL, trivially
  * parseable media container formats — no native codec libraries needed:
  *
  *   - BMP (BITMAPINFOHEADER, 24-bit) for images
  *   - WAV (RIFF, 16-bit PCM) for audio
  *   - Y4M (YUV4MPEG2, C420) for video — the plain-header raw-video
  *     format ffmpeg/mpv consume
  *
  * Builders emit spec-valid files with deterministic pseudo-random
  * content; parsers read GEOMETRY from the actual header bytes (width,
  * height, frame/sample counts) exactly as a real ingest pipeline sniffs
  * containers before handing payloads to a decoder. Parsing is strict
  * enough to reject truncated/foreign payloads (None → caller falls back).
  */
object MediaCodec {

  /** (kind, width, height, nFrames) read from real container headers. */
  final case class Decoded(kind: String, width: Int, height: Int, nFrames: Int)

  // Deterministic byte filler (LCG) — content entropy without Random.
  private def fill(buf: Array[Byte], from: Int, seed: Long): Unit = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    var i = from
    while (i < buf.length) {
      x = x * 6364136223846793005L + 1442695040888963407L
      buf(i) = (x >>> 56).toByte
      i += 1
    }
  }

  // ---- builders ----

  /** Spec-valid 24-bit BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, rows padded to 4 bytes.
    */
  def buildBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = (width * 3 + 3) / 4 * 4
    val size = 54 + rowSize * height
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54) // reserved ×2, pixel-data offset
    b.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bits-per-pixel
      .putInt(0).putInt(rowSize * height) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette unused
    val arr = b.array()
    fill(arr, 54, seed)
    arr
  }

  /** Spec-valid 16-bit PCM mono WAV (canonical 44-byte header). */
  def buildWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0)
    val dataSize = nSamples * 2 // mono, 16-bit → blockAlign 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize).put("WAVE".getBytes(US_ASCII))
    b.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
    b.put("data".getBytes(US_ASCII)).putInt(dataSize)
    val arr = b.array()
    fill(arr, 44, seed)
    arr
  }

  /** Spec-valid YUV4MPEG2 stream: ASCII stream header, then per frame a
    * `FRAME\n` marker + w×h×3/2 bytes of C420 planes (w,h must be even).
    */
  def buildY4m(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && width % 2 == 0 && height % 2 == 0)
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n".getBytes(US_ASCII)
    val frameSize = width * height * 3 / 2
    val out = new Array[Byte](header.length + nFrames * (6 + frameSize))
    System.arraycopy(header, 0, out, 0, header.length)
    fill(out, header.length, seed)
    val marker = "FRAME\n".getBytes(US_ASCII)
    var f = 0
    while (f < nFrames) { // stamp markers over the filled content
      System.arraycopy(marker, 0, out, header.length + f * (6 + frameSize), 6)
      f += 1
    }
    out
  }

  /** Shot-structured Y4M for scene-cut detection: the video is a
    * sequence of shots; every frame of shot `s` renders the same smooth
    * horizontal luma ramp — direction alternating per shot
    * (even shots brighten left→right, odd shots right→left; slope 2/px)
    * over a per-shot base level — plus a per-frame uniform brightness
    * jitter (camera flicker). The dHash invariant this is built for:
    * a uniform shift moves both cells of every pooled comparison
    * together (no byte clamping anywhere: 64 + 32 + 24 + 2·(w−1) ≤ 230
    * for w ≤ 40), so frames within a shot hash identically, while the
    * direction flip at a shot boundary inverts EVERY comparison —
    * hamming exactly 64, a provable detection margin rather than a
    * statistical one. Chroma planes are neutral (128).
    */
  def buildShotY4m(width: Int, height: Int, shotLens: Seq[Int], id: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0)
    require(shotLens.nonEmpty && shotLens.forall(_ > 0))
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n".getBytes(US_ASCII)
    val frameSize = width * height * 3 / 2
    val nFrames = shotLens.sum
    val out = new Array[Byte](header.length + nFrames * (6 + frameSize))
    System.arraycopy(header, 0, out, 0, header.length)
    val marker = "FRAME\n".getBytes(US_ASCII)
    var f = 0
    var shot = 0
    var inShot = 0
    while (f < nFrames) {
      val at = header.length + f * (6 + frameSize)
      System.arraycopy(marker, 0, out, at, 6)
      val base = (64L + (id + shot) * 7 % 33).toInt
      val jitter = ((id * 31 + f * 13) % 25).toInt
      val leftToRight = shot % 2 == 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val ramp = if (leftToRight) 2 * x else 2 * (width - 1 - x)
          out(at + 6 + y * width + x) = (base + jitter + ramp).toByte
          x += 1
        }
        y += 1
      }
      java.util.Arrays.fill(out, at + 6 + width * height, at + 6 + frameSize, 128.toByte)
      f += 1
      inShot += 1
      if (inShot == shotLens(shot)) { shot += 1; inShot = 0 }
    }
    out
  }

  /** Activity-structured 16-bit PCM mono WAV for audio segmentation:
    * alternating active/silent sections (active first), each
    * `sectionLens(s)` windows of `windowSamples` samples. Every sample
    * in section `s` is a period-4 square wave at amplitude
    * A_s = 2000 + (id+s)·37 % 1000 (active) or (id+s)·13 % 200
    * (silent), so every window's peak |sample| equals A_s EXACTLY —
    * the planted arithmetic an oracle can re-derive without decoding.
    */
  def buildActivityWav(
      sectionLens: Seq[Int], windowSamples: Int, sampleRate: Int, id: Long): Array[Byte] = {
    require(sectionLens.nonEmpty && sectionLens.forall(_ > 0) && windowSamples >= 4)
    val nSamples = sectionLens.sum * windowSamples
    val b = ByteBuffer.allocate(44 + nSamples * 2).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes(US_ASCII)).putInt(36 + nSamples * 2).put("WAVE".getBytes(US_ASCII))
    b.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    b.put("data".getBytes(US_ASCII)).putInt(nSamples * 2)
    var sec = 0
    while (sec < sectionLens.length) {
      val amp =
        if (sec % 2 == 0) (2000L + (id + sec) * 37 % 1000).toInt
        else ((id + sec) * 13 % 200).toInt
      var j = 0
      val secSamples = sectionLens(sec) * windowSamples
      while (j < secSamples) {
        val v = if ((j & 3) < 2) amp else -amp // period-4 square wave
        b.putShort(v.toShort)
        j += 1
      }
      sec += 1
    }
    b.array()
  }

  // ---- parsers ----

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + t.length <= b.length && t.indices.forall(j => b(i + j) == t.charAt(j).toByte)

  /** Sniff the container magic and parse real header geometry. None for
    * anything that isn't a well-formed BMP/WAV/Y4M payload.
    */
  def decode(payload: Array[Byte]): Option[Decoded] =
    decodeBmp(payload).orElse(decodeWav(payload)).orElse(decodeY4m(payload))

  private def decodeBmp(b: Array[Byte]): Option[Decoded] =
    if (b.length >= 54 && tag(b, 0, "BM") && i32le(b, 14) >= 40)
      // negative height = top-down row order; geometry is |height|
      Some(Decoded("image", i32le(b, 18), math.abs(i32le(b, 22)), 1))
    else None

  private def decodeWav(b: Array[Byte]): Option[Decoded] =
    if (b.length >= 44 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      // chunk walk (chunks pad to even length): need fmt's blockAlign and
      // data's size; sample frames = dataSize / blockAlign
      var i = 12
      var blockAlign = 0
      var dataSize = -1
      var wellFormed = true
      while (wellFormed && i + 8 <= b.length && (blockAlign == 0 || dataSize < 0)) {
        val sz = i32le(b, i + 4)
        // a negative declared size means a foreign/corrupt payload — and
        // would stall the walk (i would stop advancing); a declared size
        // past the payload end would wrap `i` negative via Int overflow
        // (8 + 0x7FFFFFF0 < 0) and index the array at a negative offset on
        // the next pass — both bail to None. `b.length - i - 8` cannot
        // overflow (i ≥ 12, guarded ≤ b.length - 8).
        if (sz < 0 || sz > b.length - i - 8) wellFormed = false
        else {
          if (tag(b, i, "fmt ") && sz >= 16) blockAlign = u16le(b, i + 20)
          else if (tag(b, i, "data")) dataSize = sz
          i += 8 + sz + (sz & 1)
        }
      }
      if (wellFormed && blockAlign > 0 && dataSize >= 0)
        Some(Decoded("audio", 0, 0, dataSize / blockAlign))
      else None
    } else None

  private def decodeY4m(b: Array[Byte]): Option[Decoded] =
    if (tag(b, 0, "YUV4MPEG2 ")) {
      val nl = b.indexOf('\n'.toByte)
      if (nl < 0) None
      else {
        val params = new String(b, 0, nl, US_ASCII).split(' ').drop(1)
        // digit cap ≤ 8 keeps toInt total (no NumberFormatException on a
        // foreign header like W99999999999 — reject to None instead)
        def num(prefix: Char): Option[Int] =
          params.collectFirst {
            case p if p.length >= 2 && p.length <= 9 && p.head == prefix && p.tail.forall(_.isDigit) =>
              p.tail.toInt
          }
        (num('W'), num('H')) match {
          // 16384px cap: bounds w*h*3/2 far below Int overflow, which
          // would otherwise turn the frame scan negative (walk backwards
          // / accept garbage geometry) on crafted headers
          case (Some(w), Some(h)) if w > 0 && h > 0 && w <= 16384 && h <= 16384 =>
            val frameSize = w * h * 3 / 2 // C420 (the only subsampling we emit)
            var i = nl + 1
            var frames = 0
            var ok = true
            while (ok && i < b.length) {
              if (tag(b, i, "FRAME") ) {
                val fnl = {
                  var j = i + 5
                  while (j < b.length && b(j) != '\n'.toByte) j += 1
                  j
                }
                if (fnl + 1 + frameSize <= b.length) { frames += 1; i = fnl + 1 + frameSize }
                else { ok = false } // truncated frame → malformed
              } else ok = false
            }
            if (ok && frames > 0) Some(Decoded("video", w, h, frames)) else None
          case _ => None
        }
      }
    } else None

  /** Pixel-level Y4M decode: (width, height, per-frame LUMA planes,
    * row-major top-down). The frame walk mirrors [[decodeY4m]]'s strict
    * contract (same geometry caps, truncated frame → None); chroma is
    * skipped — scene detection hashes luminance, as real shot-boundary
    * detectors do.
    */
  def lumaFrames(b: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] =
    if (tag(b, 0, "YUV4MPEG2 ")) {
      val nl = b.indexOf('\n'.toByte)
      if (nl < 0) None
      else {
        val params = new String(b, 0, nl, US_ASCII).split(' ').drop(1)
        def num(prefix: Char): Option[Int] =
          params.collectFirst {
            case p if p.length >= 2 && p.length <= 9 && p.head == prefix && p.tail.forall(_.isDigit) =>
              p.tail.toInt
          }
        (num('W'), num('H')) match {
          case (Some(w), Some(h)) if w > 0 && h > 0 && w <= 16384 && h <= 16384 =>
            val frameSize = w * h * 3 / 2
            var i = nl + 1
            var ok = true
            val out = Vector.newBuilder[Array[Byte]]
            var n = 0
            while (ok && i < b.length) {
              if (tag(b, i, "FRAME")) {
                var j = i + 5
                while (j < b.length && b(j) != '\n'.toByte) j += 1
                if (j + 1 + frameSize <= b.length) {
                  out += java.util.Arrays.copyOfRange(b, j + 1, j + 1 + w * h)
                  n += 1
                  i = j + 1 + frameSize
                } else ok = false
              } else ok = false
            }
            if (ok && n > 0) Some((w, h, out.result())) else None
          case _ => None
        }
      }
    } else None

  /** Sample-level WAV decode: the 16-bit little-endian PCM mono samples
    * from the data chunk. Same chunk-walk hardening as [[decodeWav]];
    * None unless the payload is exactly the PCM/16-bit/mono shape this
    * module emits (a real ingest pipeline would hand other encodings to
    * a fuller decoder).
    */
  def pcmSamples(b: Array[Byte]): Option[Array[Short]] =
    if (b.length >= 44 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) {
      var i = 12
      var fmtOk = false
      var dataAt = -1
      var dataSize = -1
      var wellFormed = true
      while (wellFormed && i + 8 <= b.length && (!fmtOk || dataAt < 0)) {
        val sz = i32le(b, i + 4)
        if (sz < 0 || sz > b.length - i - 8) wellFormed = false
        else {
          if (tag(b, i, "fmt ") && sz >= 16)
            // audioFormat=1 (PCM), mono, 16-bit — the only wire shape here
            fmtOk = u16le(b, i + 8) == 1 && u16le(b, i + 10) == 1 && u16le(b, i + 22) == 16
          else if (tag(b, i, "data")) { dataAt = i + 8; dataSize = sz }
          i += 8 + sz + (sz & 1)
        }
      }
      if (wellFormed && fmtOk && dataAt >= 0) {
        val n = dataSize / 2
        val out = new Array[Short](n)
        var k = 0
        while (k < n) {
          out(k) = ((b(dataAt + 2 * k) & 0xff) | (b(dataAt + 2 * k + 1) << 8)).toShort
          k += 1
        }
        Some(out)
      } else None
    } else None
}
