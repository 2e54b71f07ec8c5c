package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Perceptual image hashing over REAL 24-bit BMP payloads — the
  * multimodal × dedup intersection: near-duplicate image detection via
  * dHash (difference hash) + hamming banding.
  *
  * dHash (the standard perceptual-hash family member alongside
  * aHash/pHash): average-pool the grayscale image onto a 9×8 grid, then
  * emit one bit per horizontally-adjacent cell pair — bit set iff
  * left < right. Properties that make it the right invariant for
  * near-dup detection: the pooled grid normalizes RESOLUTION (a resized
  * copy pools to nearly the same grid), and comparing ADJACENT cells
  * normalizes global illumination (a brightness-shifted copy moves both
  * cells of every comparison together, up to clamping at the byte
  * ceiling) — so true variants land within a small hamming distance
  * while unrelated images are ~32 bits apart (each bit is a fair coin).
  *
  * Pixels come from the actual BMP payload bytes (offset/geometry read
  * from the real header, bottom-up row order and 4-byte row padding
  * honoured — [[MediaCodec]] reads geometry only; this module is the
  * pixel-level decode step of the pipeline). Scale shape: the hash is a
  * narrow per-row kernel inside mapPartitions (the codec tier's
  * justified imperative island); everything downstream — banding,
  * candidate join, hamming verify — is columnar and keyed on bounded
  * 16-bit bands, the same machinery as the SimHash text path
  * (q_dedup_simhash).
  */
object Phash {

  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Decode a 24-bit BMP into (width, height, top-down BGR triplets).
    * None for anything that isn't a well-formed 24-bit BMP (foreign
    * containers fall back, mirroring [[MediaCodec.decode]]'s contract).
    */
  def pixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = i32(b, 10)
    val w = i32(b, 18)
    val hRaw = i32(b, 22)
    val h = math.abs(hRaw)
    if (u16(b, 28) != 24 || w <= 0 || h <= 0 || w > 16384 || h > 16384) return None
    val rowSize = (w * 3 + 3) / 4 * 4
    if (off < 54 || off.toLong + rowSize.toLong * h > b.length) return None
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      // positive height = bottom-up storage; normalize to top-down
      val srcRow = if (hRaw > 0) h - 1 - y else y
      System.arraycopy(b, off + srcRow * rowSize, px, y * w * 3, w * 3)
      y += 1
    }
    Some((w, h, px))
  }

  /** Re-encode top-down BGR triplets as a spec-valid bottom-up 24-bit BMP
    * (same layout [[MediaCodec.buildBmp]] emits).
    */
  private def writeBmp(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val size = 54 + rowSize * h
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val out = bb.array()
    var y = 0
    while (y < h) {
      System.arraycopy(px, y * w * 3, out, 54 + (h - 1 - y) * rowSize, w * 3)
      y += 1
    }
    out
  }

  /** Average-pool top-down grayscale onto a gw×gh grid. Cells partition
    * the image by integer boundaries (x0 = gx·w/gw …), so a
    * nearest-neighbor 2× upscale pools to near-identical values — the
    * invariance the resize fixture exercises.
    */
  private def pool(w: Int, h: Int, px: Array[Byte], gw: Int, gh: Int): Array[Double] = {
    val out = new Array[Double](gw * gh)
    var gy = 0
    while (gy < gh) {
      val y0 = gy * h / gh
      val y1 = math.max((gy + 1) * h / gh, y0 + 1)
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw
        val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        var s = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val i = (y * w + x) * 3
            s += (px(i) & 0xff) + (px(i + 1) & 0xff) + (px(i + 2) & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = s.toDouble / (n * 3)
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 64-bit dHash of a BMP payload: bit(gy·8+gx) = grid(gx,gy) < grid(gx+1,gy)
    * over the 9×8 pooled grayscale. None for non-BMP payloads.
    */
  def dHash(b: Array[Byte]): Option[Long] =
    pixels(b).map { case (w, h, px) =>
      val p = pool(w, h, px, 9, 8)
      var bits = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (p(gy * 9 + gx) < p(gy * 9 + gx + 1)) bits |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      bits
    }

  /** 64-bit dHash of a single-channel luma plane (row-major top-down,
    * as [[MediaCodec.lumaFrames]] emits) — the video-frame sibling of
    * [[dHash]]: same 9×8 average pool, same left<right comparison per
    * adjacent cell pair. The gradient comparison is exactly invariant
    * to a uniform brightness shift (both cells move together; callers
    * must keep values clear of the byte ceiling), which is what makes
    * per-frame flicker hash-stable while a content change flips bits.
    */
  def dHashLuma(w: Int, h: Int, luma: Array[Byte]): Long = {
    require(luma.length >= w * h)
    val p = new Array[Double](9 * 8)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8
      val y1 = math.max((gy + 1) * h / 8, y0 + 1)
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9
        val x1 = math.max((gx + 1) * w / 9, x0 + 1)
        var s = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            s += luma(y * w + x) & 0xff
            n += 1
            x += 1
          }
          y += 1
        }
        p(gy * 9 + gx) = s.toDouble / n
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var gy2 = 0
    while (gy2 < 8) {
      var gx = 0
      while (gx < 8) {
        if (p(gy2 * 9 + gx) < p(gy2 * 9 + gx + 1)) bits |= 1L << (gy2 * 8 + gx)
        gx += 1
      }
      gy2 += 1
    }
    bits
  }

  /** Nearest-neighbor integer upscale (factor ≥ 1), re-encoded as a real
    * BMP — the "same image, different resolution" near-dup fixture.
    */
  def resizeBmp(b: Array[Byte], f: Int): Option[Array[Byte]] = {
    require(f >= 1)
    pixels(b).map { case (w, h, px) =>
      val nw = w * f
      val nh = h * f
      val np = new Array[Byte](nw * nh * 3)
      var y = 0
      while (y < nh) {
        val sy = y / f
        var x = 0
        while (x < nw) {
          val si = (sy * w + x / f) * 3
          val di = (y * nw + x) * 3
          np(di) = px(si); np(di + 1) = px(si + 1); np(di + 2) = px(si + 2)
          x += 1
        }
        y += 1
      }
      writeBmp(nw, nh, np)
    }
  }

  /** Per-channel brightness shift clamped to [0, 255] — the "same image,
    * different exposure" near-dup fixture. Clamping at the ceiling is
    * deliberately kept: it perturbs pooled averages unevenly, so the
    * variant is NEAR the base hash (small hamming), not equal — the
    * regime banding exists for.
    */
  def brightenBmp(b: Array[Byte], delta: Int): Option[Array[Byte]] =
    pixels(b).map { case (w, h, px) =>
      val np = new Array[Byte](px.length)
      var i = 0
      while (i < px.length) {
        val v = (px(i) & 0xff) + delta
        np(i) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        i += 1
      }
      writeBmp(w, h, np)
    }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Spec-valid BMP with SMOOTH low-frequency content (seeded sinusoid
    * mix per channel + light deterministic noise) — the perceptual-hash
    * fixture builder. [[MediaCodec.buildBmp]]'s white-noise content is
    * structurally the WORST case for any perceptual hash: with zero
    * spatial correlation, pooled cells sit within noise of each other
    * and a 2× resample flips ~7 dHash bits (measured) — while real
    * photographs are low-frequency, which is the entire premise of
    * pooling-based hashes. This builder models that: smooth fields pool
    * stably (resize/brightness variants land within a few bits) while
    * different seeds give independent phase/frequency mixes (~32 bits
    * apart, fair-coin regime).
    */
  def buildSmoothBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    var x0 = seed * 6364136223846793005L + 1442695040888963407L
    def nextDouble(): Double = {
      x0 = x0 * 6364136223846793005L + 1442695040888963407L
      ((x0 >>> 11).toDouble / (1L << 53).toDouble)
    }
    // 2 low-frequency components per channel: frequency in [0.5, 2.5]
    // cycles across the image, free phase
    val params = Array.fill(3, 2)((0.5 + 2.0 * nextDouble(), 2 * math.Pi * nextDouble(),
      0.5 + 2.0 * nextDouble(), 2 * math.Pi * nextDouble()))
    val px = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val v = (y + 0.5) / height
      var x = 0
      while (x < width) {
        val u = (x + 0.5) / width
        var c = 0
        while (c < 3) {
          var s = 0.0
          var k = 0
          while (k < 2) {
            val (fx, px0, fy, py0) = params(c)(k)
            s += math.sin(2 * math.Pi * fx * u + px0) * math.cos(2 * math.Pi * fy * v + py0)
            k += 1
          }
          val value = 128.0 + 55.0 * s
          px((y * width + x) * 3 + c) =
            (if (value < 0) 0 else if (value > 255) 255 else value.toInt).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    writeBmp(width, height, px)
  }
}
