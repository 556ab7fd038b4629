package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled GIF87a/89a codec (public spec: GIF89a, CompuServe 1990) —
  * makes VIDEO a real modality: animated GIF is the one video container a
  * web crawl is full of that needs no external codec. Decode handles
  * global/local color tables, Graphic Control Extensions (frame delay,
  * transparency, disposal none/keep/restore-background), sub-rectangle
  * frames, interlaced images, and the GIF LZW variant (LSB-first bit
  * packing, variable code width 3..12, clear/EOI codes, NO early-change —
  * unlike the TIFF LZW in io/GeoTiff.scala, which is MSB-first with the
  * early-change rule). Encode writes GIF89a with per-frame delays and
  * optional interlace, emitting a clear code when the table fills.
  *
  * Pure byte-array kernels — Spark integration stays in [[Multimodal]]
  * (mapPartitions batch shape), the same split as [[Multimodal.Wav]].
  */
object Gif {

  /** One decoded frame: placement rect, centisecond delay, palette-index
    * pixels (w*h, row-major, already deinterlaced), RGB palette, and the
    * transparent index (-1 when opaque), disposal method 0-3. */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
                         delayCs: Int, indices: Array[Byte], palette: Array[Int],
                         transparentIdx: Int, disposal: Int)

  final case class Image(width: Int, height: Int, bgIndex: Int,
                         globalPalette: Array[Int], frames: Vector[Frame])

  def isGif(b: Array[Byte]): Boolean =
    b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  // ---------------------------------------------------------------- decode

  def decode(b: Array[Byte]): Image = {
    require(isGif(b), "not a GIF payload")
    def u16(off: Int) = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    val width = u16(6); val height = u16(8)
    val flags = b(10) & 0xFF
    val bg = b(11) & 0xFF
    var pos = 13
    val gct = if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      val p = readPalette(b, pos, n); pos += 3 * n; p
    } else Array.empty[Int]

    val frames = Vector.newBuilder[Frame]
    var delay = 0; var transparent = -1; var disposal = 0
    var done = false
    while (!done && pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x3B => done = true
        case 0x21 => // extension
          val label = b(pos + 1) & 0xFF
          pos += 2
          if (label == 0xF9) { // Graphic Control Extension
            val sz = b(pos) & 0xFF // always 4
            val f = b(pos + 1) & 0xFF
            disposal = (f >> 2) & 7
            delay = u16(pos + 2)
            transparent = if ((f & 1) != 0) b(pos + 4) & 0xFF else -1
            pos += 1 + sz
            pos += 1 // block terminator
          } else { // skip sub-block chain (comment/app/plain-text)
            while ((b(pos) & 0xFF) != 0) pos += 1 + (b(pos) & 0xFF)
            pos += 1
          }
        case 0x2C => // image descriptor
          val left = u16(pos + 1); val top = u16(pos + 3)
          val w = u16(pos + 5); val h = u16(pos + 7)
          val iflags = b(pos + 9) & 0xFF
          pos += 10
          val lct = if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            val p = readPalette(b, pos, n); pos += 3 * n; p
          } else gct
          val minCode = b(pos) & 0xFF; pos += 1
          val data = ArrayBuffer.empty[Byte]
          while ((b(pos) & 0xFF) != 0) {
            val n = b(pos) & 0xFF
            data ++= b.slice(pos + 1, pos + 1 + n)
            pos += 1 + n
          }
          pos += 1
          var px = lzwDecode(data.toArray, minCode, w * h)
          if ((iflags & 0x40) != 0) px = deinterlace(px, w, h)
          frames += Frame(left, top, w, h, delay, px, lct, transparent, disposal)
          delay = 0; transparent = -1; disposal = 0
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    Image(width, height, bg, gct, frames.result())
  }

  private def readPalette(b: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((b(off + 3 * i) & 0xFF) << 16) | ((b(off + 3 * i + 1) & 0xFF) << 8) |
        (b(off + 3 * i + 2) & 0xFF)
    }

  /** GIF LZW: LSB-first codes, width minCode+1 .. 12, decoder widens when
    * its next free entry reaches 1<<width (no early change). */
  private[ops] def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var width = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitPos = 0L
    val totalBits = data.length.toLong * 8

    def readCode(): Int = {
      if (bitPos + width > totalBits) return eoi // truncated stream: stop
      var v = 0; var i = 0
      while (i < width) {
        val p = bitPos + i
        if ((data((p >> 3).toInt) >> (p & 7).toInt & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }

    def expand(code: Int): Array[Byte] = {
      val buf = ArrayBuffer.empty[Byte]
      var c = code
      while (c >= clear + 2) { buf += suffix(c); c = prefix(c) }
      buf += c.toByte
      buf.reverseIterator.toArray
    }

    var stop = false
    while (!stop && outPos < nPixels) {
      val code = readCode()
      if (code == eoi) stop = true
      else if (code == clear) { width = minCode + 1; next = eoi + 1; prev = -1 }
      else {
        val entry =
          if (code < next && (code < clear || code >= clear + 2)) expand(code)
          else if (code == next && prev >= 0) {
            val p = expand(prev); p :+ p(0)
          } else throw new IllegalArgumentException(s"bad LZW code $code (next=$next)")
        System.arraycopy(entry, 0, out, outPos, math.min(entry.length, nPixels - outPos))
        outPos += entry.length
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = entry(0); next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out
  }

  private[ops] def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    var src = 0
    interlaceRows(h).foreach { y =>
      System.arraycopy(px, src * w, out, y * w, w); src += 1
    }
    out
  }

  private[ops] def interlaceRows(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  // ---------------------------------------------------------------- encode

  /** GIF89a with one full-canvas image per frame (indices, delayCs);
    * palette size is padded to the next power of two (min 2). */
  def encode(width: Int, height: Int, palette: Array[Int],
             frames: Seq[(Array[Byte], Int)], interlace: Boolean = false): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, "palette size 1..256")
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val palN = 1 << bits
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0x80 | (bits - 1)) // GCT present, size 2^bits
    out.write(0); out.write(0)   // bg index, aspect
    (0 until palN).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF); out.write(c & 0xFF)
    }
    frames.foreach { case (indices, delayCs) =>
      require(indices.length == width * height, "frame must be full-canvas")
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0x04) // disposal 1 (keep), no transparency
      u16(delayCs); out.write(0); out.write(0)
      out.write(0x2C); u16(0); u16(0); u16(width); u16(height)
      out.write(if (interlace) 0x40 else 0)
      val minCode = math.max(2, bits)
      out.write(minCode)
      val src =
        if (!interlace) indices
        else {
          val re = new Array[Byte](indices.length)
          var dst = 0
          interlaceRows(height).foreach { y =>
            System.arraycopy(indices, y * width, re, dst * width, width); dst += 1
          }
          re
        }
      val lzw = lzwEncode(src, minCode)
      var o = 0
      while (o < lzw.length) {
        val n = math.min(255, lzw.length - o)
        out.write(n); out.write(lzw, o, n); o += n
      }
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** GIF LZW encoder — runs one table entry ahead of the decoder, so it
    * widens at (1<<width)+1 where the decoder widens at 1<<width (same
    * one-ahead bookkeeping as the TIFF arm, shifted by the absent
    * early-change). Emits CLEAR when the table hits 4096. */
  private[ops] def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var curBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << curBits; curBits += width
      while (curBits >= 8) { out.write((cur & 0xFF).toInt); cur >>= 8; curBits -= 8 }
    }
    var table = scala.collection.mutable.LongMap.empty[Int]
    var next = eoi + 1
    def key(prefix: Int, k: Int): Long = (prefix.toLong << 8) | k

    put(clear)
    if (indices.nonEmpty) {
      var w = indices(0) & 0xFF
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xFF
        val kk = key(w, k)
        val hit = table.getOrElse(kk, -1)
        if (hit >= 0) w = hit
        else {
          put(w)
          table.update(kk, next)
          next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
          if (next == 4096) {
            put(clear)
            table = scala.collection.mutable.LongMap.empty[Int]
            width = minCode + 1; next = eoi + 1
          }
          w = k
        }
        i += 1
      }
      put(w)
    }
    put(eoi)
    if (curBits > 0) out.write((cur & 0xFF).toInt)
    out.toByteArray
  }

  // ---------------------------------------------------------------- render

  /** Compose frames onto the logical canvas (disposal 0/1 keep, 2 restore
    * to background, 3 treated as keep) → full-canvas RGB per frame. */
  def renderRgbFrames(img: Image): Vector[Array[Int]] = {
    val canvas = new Array[Int](img.width * img.height)
    val bgColor =
      if (img.globalPalette.nonEmpty && img.bgIndex < img.globalPalette.length)
        img.globalPalette(img.bgIndex)
      else 0
    java.util.Arrays.fill(canvas, bgColor)
    val outFrames = Vector.newBuilder[Array[Int]]
    img.frames.foreach { f =>
      var y = 0
      while (y < f.height) {
        var x = 0
        while (x < f.width) {
          val idx = f.indices(y * f.width + x) & 0xFF
          if (idx != f.transparentIdx && idx < f.palette.length) {
            val cy = f.top + y; val cx = f.left + x
            if (cy < img.height && cx < img.width)
              canvas(cy * img.width + cx) = f.palette(idx)
          }
          x += 1
        }
        y += 1
      }
      outFrames += canvas.clone()
      if (f.disposal == 2) {
        var yy = f.top
        while (yy < math.min(img.height, f.top + f.height)) {
          var xx = f.left
          while (xx < math.min(img.width, f.left + f.width)) {
            canvas(yy * img.width + xx) = bgColor; xx += 1
          }
          yy += 1
        }
      }
    }
    outFrames.result()
  }
}
