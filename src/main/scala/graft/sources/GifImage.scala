package graft.sources

/** Pure-JVM GIF codec (GIF87a/GIF89a, single-frame) — the second
  * compressed image container after [[PngImage]], and a genuinely new
  * compression family: GIF's pixel data is variable-width LZW
  * (spec Appendix F), not zlib, so this closes the "can the strict
  * discipline host a dictionary coder" question the PNG work left
  * open. Same rules as BmpImage/WavAudio/PngImage/PdfText: implement
  * the PUBLIC spec (GIF89a, CompuServe 1990) byte-by-byte, validate
  * loudly, never emit garbage pixels.
  *
  * Scope (documented, not hidden): one image frame (a second image
  * descriptor — an animation — rejects with a named error; corpus
  * triage counts it, the q144 shape), global or local color table,
  * both row orders (sequential and the 4-pass interlace of spec
  * §20), Graphic Control Extension transparency (the 89a feature real
  * corpora actually use), all other extension blocks structurally
  * validated (sub-block chains walked, terminators required) then
  * skipped. The LZW layer is strict: codes must fit the current
  * width, a code may exceed the table only in the KwKwK case, the
  * stream must yield EXACTLY width×height indices, reach End-Of-
  * Information, and leave no dangling sub-block bytes. Decodes to the
  * same 0xAARRGGBB face as the other codecs (transparent index →
  * alpha 0), so every consumer (phash, stats) stays layout-agnostic.
  *
  * Reference semantics: the reference treats media as opaque binary
  * with typed metadata and delegates decode to external services
  * (sanctioned stub boundary); this codec makes the decode half real
  * for the second-most-common compressed web image container.
  */
object GifImage {

  /** Decoded image: `pixels` is top-down row-major 0xAARRGGBB (alpha 0
    * only for the GCE-declared transparent index). Face-compatible
    * with [[PngImage.Png]] / [[BmpImage.Bmp]]. */
  final case class Gif(width: Int, height: Int, hasTransparency: Boolean,
      pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x) & 0xffffff
    def alpha(x: Int, y: Int): Int = (pixels(y * width + x) >>> 24) & 0xff
  }

  /** Interlace row schedule (spec §20): pass origins/strides over rows. */
  private val InterlacePasses: Array[(Int, Int)] =
    Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** Strict parse. Rejects loudly: bad signature/version, truncation
    * anywhere, color-table sizes that overrun, a frame outside the
    * logical screen, missing color table (neither global nor local),
    * malformed extension sub-block chains, LZW violations (bad code
    * width, code past the table outside KwKwK, pixel over/underflow,
    * missing EOI, bytes after the terminator), a second image frame,
    * or a missing/duplicated trailer. */
  def parse(bytes: Array[Byte]): Gif = {
    require(bytes.length >= 6 + 7 + 1, s"not a GIF: ${bytes.length} bytes")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"bad signature '$sig'")
    var off = 6

    def u8(): Int = {
      require(off < bytes.length, s"truncated at $off (${bytes.length} bytes)")
      val v = bytes(off) & 0xff; off += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }

    // logical screen descriptor
    val screenW = u16(); val screenH = u16()
    require(screenW > 0 && screenH > 0, s"bad screen ${screenW}x$screenH")
    val flags = u8()
    u8() // background color index — only meaningful with a GCT; ignored
    u8() // pixel aspect ratio — presentational; ignored
    val globalTable: Array[Int] =
      if ((flags & 0x80) != 0) readColorTable(bytes, 2 << (flags & 7),
        () => u8())
      else null

    var transparentIdx = -1 // from the GCE immediately preceding the frame
    var frame: Gif = null

    var done = false
    while (!done) {
      u8() match {
        case 0x3b => // trailer
          require(off == bytes.length,
            s"${bytes.length - off} trailing bytes after GIF trailer")
          done = true
        case 0x21 => // extension
          val label = u8()
          if (label == 0xf9) {
            // Graphic Control Extension: fixed 4-byte block
            require(u8() == 4, "GCE block size is not 4")
            val gflags = u8()
            u16() // delay time — animation timing; ignored for stills
            val tIdx = u8()
            require(u8() == 0, "GCE missing sub-block terminator")
            transparentIdx = if ((gflags & 1) != 0) tIdx else -1
          } else {
            // comment / application / plain-text: walk the sub-block
            // chain strictly (each length-prefixed, 0-terminated)
            var len = u8()
            while (len != 0) {
              require(off + len <= bytes.length,
                s"extension sub-block overruns file at $off")
              off += len
              len = u8()
            }
          }
        case 0x2c => // image descriptor
          require(frame == null,
            "multi-frame GIF (animation) — only single-frame decode")
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(w > 0 && h > 0, s"bad frame dims ${w}x$h")
          require(left + w <= screenW && top + h <= screenH,
            s"frame ${w}x$h+$left+$top outside ${screenW}x$screenH screen")
          // single-frame scope: the frame must BE the screen — a
          // partial first frame composes onto a background we refuse
          // to guess at (strict, not silent)
          require(left == 0 && top == 0 && w == screenW && h == screenH,
            s"frame ${w}x$h+$left+$top does not cover the " +
              s"${screenW}x$screenH screen")
          val iflags = u8()
          val table =
            if ((iflags & 0x80) != 0)
              readColorTable(bytes, 2 << (iflags & 7), () => u8())
            else globalTable
          require(table != null, "no color table (neither global nor local)")
          val interlaced = (iflags & 0x40) != 0
          val minCodeSize = u8()
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad LZW minimum code size $minCodeSize")
          // collect the sub-block chain into one code stream
          val data = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) {
            require(off + len <= bytes.length,
              s"image sub-block overruns file at $off")
            data.write(bytes, off, len); off += len
            len = u8()
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
          val px = new Array[Int](w * h)
          var row = 0
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(h)(identity)
            else {
              val order = new Array[Int](h)
              var k = 0
              InterlacePasses.foreach { case (y0, dy) =>
                var y = y0
                while (y < h) { order(k) = y; k += 1; y += dy }
              }
              order
            }
          while (row < h) {
            val y = rowOrder(row)
            var x = 0
            while (x < w) {
              val idx = indices(row * w + x) & 0xff
              require(idx < table.length,
                s"color index $idx at ($x,$y) out of range " +
                  s"(${table.length}-entry table)")
              px(y * w + x) =
                if (idx == transparentIdx) table(idx) & 0xffffff
                else table(idx)
              x += 1
            }
            row += 1
          }
          frame = Gif(w, h, transparentIdx >= 0, px)
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at ${off - 1}")
      }
    }
    require(frame != null, "GIF carries no image frame")
    frame
  }

  private def readColorTable(bytes: Array[Byte], n: Int,
      u8: () => Int): Array[Int] =
    Array.fill(n) {
      val r = u8(); val g = u8(); val b = u8()
      0xff000000 | (r << 16) | (g << 8) | b
    }

  /** Strict GIF-LZW decode (spec Appendix F): variable code width
    * minCodeSize+1 .. 12, LSB-first bit packing, Clear resets the
    * table, the first code after Clear must be a literal, a code may
    * equal the next free slot only in the KwKwK case, table growth
    * stops at 4096, the stream must produce EXACTLY `expected` indices
    * and then End-Of-Information, with only zero-padding bits after. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outN = 0
    // dictionary as (prefix code, appended byte) pairs; literals implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = eoi + 1
    var codeSize = minCodeSize + 1
    var prev = -1

    var acc = 0L; var accBits = 0; var pos = 0
    var sawEoi = false
    val seq = new Array[Byte](4096) // scratch for one expansion
    while (!sawEoi) {
      while (accBits < codeSize && pos < data.length) {
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8; pos += 1
      }
      require(accBits >= codeSize,
        s"LZW stream ends mid-code after $outN of $expected pixels")
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; accBits -= codeSize

      if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        require(outN == expected,
          s"LZW EOI after $outN of $expected pixels")
        sawEoi = true
      } else {
        require(code < next || (code == next && prev >= 0),
          s"LZW code $code beyond table ($next entries)")
        require(prev >= 0 || code < clear,
          s"first LZW code after clear is $code, not a literal")
        // expand `code` (or KwKwK: prev + first(prev))
        var n = 0
        if (code == next) {
          var c = prev
          while (c >= eoi + 1) { seq(n) = append(c); n += 1; c = prefix(c) }
          seq(n) = c.toByte; n += 1
          // reversed prev, then its own first byte appended at the FRONT
          // of the reversed buffer is handled below by emitting first
          // byte twice: emit reversed(seq) then first byte
        } else {
          var c = code
          while (c >= eoi + 1) { seq(n) = append(c); n += 1; c = prefix(c) }
          seq(n) = c.toByte; n += 1
        }
        val firstByte = seq(n - 1)
        val total = if (code == next) n + 1 else n
        require(outN + total <= expected,
          s"LZW yields more than $expected pixels")
        var k = 0
        while (k < n) { out(outN + k) = seq(n - 1 - k); k += 1 }
        if (code == next) out(outN + n) = firstByte
        outN += total
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; append(next) = firstByte
          next += 1
          // canonical GIF-LZW width timing (the giflib pairing): the
          // DECODER bumps as soon as the table fills the current width;
          // the ENCODER (below) bumps one entry later — the offset
          // compensates for the decoder adding each entry one code
          // after the encoder did
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    // strict tail: EOI must be the last thing in the sub-block data —
    // at most 7 zero padding bits completing the final byte
    require(pos == data.length && acc == 0,
      s"LZW data continues past EOI (${data.length - pos} bytes, " +
        s"$accBits bits)")
    out
  }

  /** Encode a single-frame GIF89a from top-down row-major palette
    * indices and a palette of 0xAARRGGBB entries (palette size is
    * rounded up to the next power of two with black padding, per the
    * format's 2^n table rule). At most one entry may carry alpha 0 —
    * it becomes the GCE transparent index; other alphas are invalid
    * for this format. `interlaced` writes the 4-pass row order. The
    * generator half for every decode path, with a REAL LZW encoder
    * (table reset at 4096, the width-bump timing the decoder expects),
    * so round-trip tests and fixtures cover dictionary growth and
    * reset. */
  def encode(width: Int, height: Int, indices: Array[Int],
      palette: Array[Int], interlaced: Boolean = false,
      subBlockSize: Int = 255): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(indices.length == width * height,
      s"${indices.length} indices for ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette has ${palette.length} entries (1..256)")
    require(subBlockSize >= 1 && subBlockSize <= 255,
      s"bad subBlockSize $subBlockSize")
    val transparent = palette.indices.filter(j => (palette(j) >>> 24) == 0)
    require(transparent.size <= 1,
      s"${transparent.size} transparent entries (GIF allows at most one)")
    palette.foreach { p =>
      val a = (p >>> 24) & 0xff
      require(a == 0xff || a == 0,
        f"palette alpha 0x$a%02x unsupported (GIF is 1-bit transparency)")
    }
    // table size = next power of two >= max(2, palette size)
    var tableBits = 1
    while ((1 << tableBits) < palette.length) tableBits += 1
    val tableN = 1 << tableBits
    val minCodeSize = math.max(2, tableBits)

    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    u8(0x80 | (tableBits - 1)) // GCT present, 2^tableBits entries
    u8(0); u8(0) // background index, aspect
    for (j <- 0 until tableN) {
      val p = if (j < palette.length) palette(j) else 0
      u8(p >> 16); u8(p >> 8); u8(p)
    }
    transparent.headOption.foreach { tIdx =>
      u8(0x21); u8(0xf9); u8(4)
      u8(1) // transparency flag set
      u16(0) // delay
      u8(tIdx)
      u8(0)
    }
    u8(0x2c)
    u16(0); u16(0); u16(width); u16(height)
    u8(if (interlaced) 0x40 else 0)
    u8(minCodeSize)

    // row-reorder for interlace, then LZW-encode the index stream
    val stream = new Array[Byte](indices.length)
    var k = 0
    val rows: Array[Int] =
      if (!interlaced) Array.tabulate(height)(identity)
      else {
        val order = new Array[Int](height)
        var m = 0
        InterlacePasses.foreach { case (y0, dy) =>
          var y = y0
          while (y < height) { order(m) = y; m += 1; y += dy }
        }
        order
      }
    rows.foreach { y =>
      var x = 0
      while (x < width) {
        val idx = indices(y * width + x)
        require(idx >= 0 && idx < palette.length,
          s"index $idx at ($x,$y) out of palette range (${palette.length})")
        stream(k) = idx.toByte
        k += 1
        x += 1
      }
    }
    val lzw = lzwEncode(stream, minCodeSize)
    var o = 0
    while (o < lzw.length) {
      val take = math.min(subBlockSize, lzw.length - o)
      u8(take)
      out.write(lzw, o, take)
      o += take
    }
    u8(0) // sub-block terminator
    u8(0x3b) // trailer
    out.toByteArray
  }


  /** Structural metadata for one animation frame: bounding box, delay
    * (centiseconds, from the preceding GCE; 0 if none), transparency
    * flag, interlace flag, and the frame's compressed payload size. */
  final case class FrameMeta(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, transparent: Boolean, interlaced: Boolean,
      lzwBytes: Int)

  /** Structural walk of a (possibly animated) GIF: validates the FULL
    * container — signature, screen descriptor, color tables, every
    * frame's descriptor (bounds-checked against the screen), every
    * GCE, every extension and image sub-block chain, trailer, no
    * trailing bytes — and returns per-frame metadata WITHOUT decoding
    * pixel data (the LZW payloads are size-accounted, not expanded).
    * This is the triage face for the multi-frame class [[parse]]
    * rejects: at corpus scale, "what animations do we hold" is a
    * metadata query, and a structurally broken animation still rejects
    * loudly here. A single-frame file yields one FrameMeta and is
    * exactly the population [[parse]] decodes. */
  def scanFrames(bytes: Array[Byte]): Seq[FrameMeta] = {
    require(bytes.length >= 6 + 7 + 1, s"not a GIF: ${bytes.length} bytes")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"bad signature '$sig'")
    var off = 6
    def u8(): Int = {
      require(off < bytes.length, s"truncated at $off (${bytes.length} bytes)")
      val v = bytes(off) & 0xff; off += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    val screenW = u16(); val screenH = u16()
    require(screenW > 0 && screenH > 0, s"bad screen ${screenW}x$screenH")
    val flags = u8()
    u8(); u8()
    val hasGct = (flags & 0x80) != 0
    if (hasGct) off += 3 * (2 << (flags & 7))
    require(off <= bytes.length, "global color table overruns file")

    val frames = Seq.newBuilder[FrameMeta]
    var pendingDelay = 0
    var pendingTransparent = false
    var done = false
    while (!done) {
      u8() match {
        case 0x3b =>
          require(off == bytes.length,
            s"${bytes.length - off} trailing bytes after GIF trailer")
          done = true
        case 0x21 =>
          val label = u8()
          if (label == 0xf9) {
            require(u8() == 4, "GCE block size is not 4")
            val gflags = u8()
            pendingDelay = u16()
            u8() // transparent index — structural walk keeps the flag only
            require(u8() == 0, "GCE missing sub-block terminator")
            pendingTransparent = (gflags & 1) != 0
          } else {
            var len = u8()
            while (len != 0) {
              require(off + len <= bytes.length,
                s"extension sub-block overruns file at $off")
              off += len
              len = u8()
            }
          }
        case 0x2c =>
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(w > 0 && h > 0, s"bad frame dims ${w}x$h")
          require(left + w <= screenW && top + h <= screenH,
            s"frame ${w}x$h+$left+$top outside ${screenW}x$screenH screen")
          val iflags = u8()
          val hasLct = (iflags & 0x80) != 0
          if (hasLct) off += 3 * (2 << (iflags & 7))
          require(off <= bytes.length, "local color table overruns file")
          require(hasGct || hasLct,
            "no color table (neither global nor local)")
          val minCodeSize = u8()
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad LZW minimum code size $minCodeSize")
          var lzwBytes = 0
          var len = u8()
          while (len != 0) {
            require(off + len <= bytes.length,
              s"image sub-block overruns file at $off")
            lzwBytes += len
            off += len
            len = u8()
          }
          frames += FrameMeta(left, top, w, h, pendingDelay,
            pendingTransparent, (iflags & 0x40) != 0, lzwBytes)
          pendingDelay = 0
          pendingTransparent = false
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at ${off - 1}")
      }
    }
    val out = frames.result()
    require(out.nonEmpty, "GIF carries no image frame")
    out
  }

  /** One COMPOSITED animation frame: the frame's own geometry/timing/
    * disposal plus the full logical-screen canvas AS DISPLAYED after
    * this frame draws (0xAARRGGBB; alpha 0 = a canvas cell no frame
    * has painted — or one a disposal-2 clear un-painted). */
  final case class AnimFrame(index: Int, left: Int, top: Int,
      width: Int, height: Int, delayCs: Int, disposal: Int,
      canvas: Array[Int])

  /** Decode + COMPOSITE a (possibly animated) GIF per the GIF89a
    * rendering model — the full-frame face [[scanFrames]]'s structural
    * walk deliberately is not: each frame's indices expand (LZW,
    * interlace, local/global palette, GCE transparency) and draw onto
    * the logical screen at the frame's offset (transparent pixels
    * leave the canvas untouched); after the displayed canvas is
    * snapshotted, the frame's DISPOSAL method runs — 0/1 leave the
    * canvas, 2 clears the frame RECT to unpainted (the universal
    * modern-renderer convention; the spec's background-color variant
    * is ignored by every real renderer), 3 restores the canvas to its
    * pre-frame state; methods 4..7 are "to be defined" and reject by
    * name. [[parse]]'s strictness ladder applies throughout. This is
    * the FRAME-SAMPLING seam a video-adjacent pipeline needs: per-frame
    * upright canvases to hash/stat, never raw payload guesswork.
    * @return (screenW, screenH, frames in presentation order) */
  def decodeAnimation(bytes: Array[Byte]): (Int, Int, Seq[AnimFrame]) = {
    require(bytes.length >= 6 + 7 + 1, s"not a GIF: ${bytes.length} bytes")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"bad signature '$sig'")
    var off = 6
    def u8(): Int = {
      require(off < bytes.length, s"truncated at $off (${bytes.length} bytes)")
      val v = bytes(off) & 0xff; off += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    val screenW = u16(); val screenH = u16()
    require(screenW > 0 && screenH > 0, s"bad screen ${screenW}x$screenH")
    val flags = u8()
    u8(); u8()
    val globalTable: Array[Int] =
      if ((flags & 0x80) != 0) readColorTable(bytes, 2 << (flags & 7),
        () => u8())
      else null

    val canvas = new Array[Int](screenW * screenH) // alpha 0 = unpainted
    val frames = Seq.newBuilder[AnimFrame]
    var n = 0
    var pendingDelay = 0
    var pendingDisposal = 0
    var transparentIdx = -1
    var done = false
    while (!done) {
      u8() match {
        case 0x3b =>
          require(off == bytes.length,
            s"${bytes.length - off} trailing bytes after GIF trailer")
          done = true
        case 0x21 =>
          val label = u8()
          if (label == 0xf9) {
            require(u8() == 4, "GCE block size is not 4")
            val gflags = u8()
            pendingDisposal = (gflags >> 2) & 7
            require(pendingDisposal <= 3,
              s"disposal method $pendingDisposal undefined (spec allows 0..3)")
            pendingDelay = u16()
            val tIdx = u8()
            require(u8() == 0, "GCE missing sub-block terminator")
            transparentIdx = if ((gflags & 1) != 0) tIdx else -1
          } else {
            var len = u8()
            while (len != 0) {
              require(off + len <= bytes.length,
                s"extension sub-block overruns file at $off")
              off += len
              len = u8()
            }
          }
        case 0x2c =>
          val left = u16(); val top = u16()
          val w = u16(); val h = u16()
          require(w > 0 && h > 0, s"bad frame dims ${w}x$h")
          require(left + w <= screenW && top + h <= screenH,
            s"frame ${w}x$h+$left+$top outside ${screenW}x$screenH screen")
          val iflags = u8()
          val table =
            if ((iflags & 0x80) != 0)
              readColorTable(bytes, 2 << (iflags & 7), () => u8())
            else globalTable
          require(table != null, "no color table (neither global nor local)")
          val interlaced = (iflags & 0x40) != 0
          val minCodeSize = u8()
          require(minCodeSize >= 2 && minCodeSize <= 8,
            s"bad LZW minimum code size $minCodeSize")
          val data = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) {
            require(off + len <= bytes.length,
              s"image sub-block overruns file at $off")
            data.write(bytes, off, len); off += len
            len = u8()
          }
          val indices = lzwDecode(data.toByteArray, minCodeSize, w * h)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(h)(identity)
            else {
              val order = new Array[Int](h)
              var k = 0
              InterlacePasses.foreach { case (y0, dy) =>
                var y = y0
                while (y < h) { order(k) = y; k += 1; y += dy }
              }
              order
            }
          // disposal 3 needs the pre-frame canvas to restore
          val before =
            if (pendingDisposal == 3) canvas.clone() else null
          var row = 0
          while (row < h) {
            val y = rowOrder(row)
            var x = 0
            while (x < w) {
              val idx = indices(row * w + x) & 0xff
              require(idx < table.length,
                s"color index $idx at ($x,$y) out of range " +
                  s"(${table.length}-entry table)")
              if (idx != transparentIdx)
                canvas((top + y) * screenW + (left + x)) = table(idx)
              x += 1
            }
            row += 1
          }
          frames += AnimFrame(n, left, top, w, h, pendingDelay,
            pendingDisposal, canvas.clone())
          pendingDisposal match {
            case 2 => // clear the frame RECT to unpainted
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  canvas((top + y) * screenW + (left + x)) = 0
                  x += 1
                }
                y += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => () // 0/1: leave
          }
          n += 1
          pendingDelay = 0
          pendingDisposal = 0
          transparentIdx = -1
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at ${off - 1}")
      }
    }
    val out = frames.result()
    require(out.nonEmpty, "GIF carries no image frame")
    (screenW, screenH, out)
  }

  /** Encode a multi-frame GIF89a animation: frame 0 covers the screen;
    * later frames are sub-rectangles with per-frame delays
    * (centiseconds), disposal methods and GCE transparency. The
    * generator half for [[scanFrames]] AND [[decodeAnimation]] — real
    * LZW payloads per frame, a GCE whenever the frame has a delay, a
    * non-0 disposal or a transparent index. Pixel content per frame
    * comes from `framePx(f)` (palette indices for that frame's own
    * w×h; `transparentFor(f)`, when >= 0, names the index that leaves
    * the canvas untouched). */
  def encodeAnimation(screenW: Int, screenH: Int, palette: Array[Int],
      frames: Seq[(Int, Int, Int, Int, Int)], // (left, top, w, h, delayCs)
      framePx: Int => Array[Int],
      interlacedFrame: Int => Boolean = _ => false,
      disposalFor: Int => Int = _ => 0,
      transparentFor: Int => Int = _ => -1): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette has ${palette.length} entries (1..256)")
    palette.foreach(p => require((p >>> 24) == 0xff,
      "animation generator keeps all entries opaque"))
    var tableBits = 1
    while ((1 << tableBits) < palette.length) tableBits += 1
    val minCodeSize = math.max(2, tableBits)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(screenW); u16(screenH)
    u8(0x80 | (tableBits - 1)); u8(0); u8(0)
    for (j <- 0 until (1 << tableBits)) {
      val p = if (j < palette.length) palette(j) else 0
      u8(p >> 16); u8(p >> 8); u8(p)
    }
    frames.zipWithIndex.foreach { case ((left, top, w, h, delay), f) =>
      require(w > 0 && h > 0 && left + w <= screenW && top + h <= screenH,
        s"frame $f out of bounds")
      if (f == 0) require(left == 0 && top == 0 && w == screenW &&
        h == screenH, "frame 0 must cover the screen")
      val disp = disposalFor(f)
      val tr = transparentFor(f)
      require(disp >= 0 && disp <= 3, s"frame $f disposal $disp (0..3)")
      require(tr >= -1 && tr < palette.length,
        s"frame $f transparent index $tr")
      if (delay > 0 || disp > 0 || tr >= 0) {
        u8(0x21); u8(0xf9); u8(4)
        u8((disp << 2) | (if (tr >= 0) 1 else 0))
        u16(delay); u8(math.max(tr, 0)); u8(0)
      }
      u8(0x2c)
      u16(left); u16(top); u16(w); u16(h)
      // sample the caller's predicate ONCE per frame: the flag byte and
      // the payload row order below must come from the same evaluation,
      // or a non-deterministic closure silently emits a GIF whose
      // interlace flag contradicts its payload (advisor r17 — the r16
      // fix only pinned the CodecFuzz call site)
      val ilace = interlacedFrame(f)
      u8(if (ilace) 0x40 else 0)
      u8(minCodeSize)
      val idx = framePx(f)
      require(idx.length == w * h, s"frame $f: ${idx.length} px for ${w}x$h")
      idx.foreach(i =>
        require(i >= 0 && i < palette.length, s"frame $f index $i"))
      // interlaced payloads carry the display rows in PASS order — the
      // flag was write-only while scanFrames (structural) was the only
      // consumer; decodeAnimation actually expands frames, so the
      // encoder half now honors it (found by the independent-reference
      // compositing spec)
      val stream = new Array[Byte](idx.length)
      if (ilace) {
        val order = new Array[Int](h)
        var k = 0
        InterlacePasses.foreach { case (y0, dy) =>
          var y = y0
          while (y < h) { order(k) = y; k += 1; y += dy }
        }
        var r = 0
        while (r < h) {
          var x = 0
          while (x < w) {
            stream(r * w + x) = idx(order(r) * w + x).toByte
            x += 1
          }
          r += 1
        }
      } else {
        var k = 0
        while (k < idx.length) { stream(k) = idx(k).toByte; k += 1 }
      }
      val lzw = lzwEncode(stream, minCodeSize)
      var o = 0
      while (o < lzw.length) {
        val take = math.min(255, lzw.length - o)
        u8(take); out.write(lzw, o, take)
        o += take
      }
      u8(0)
    }
    u8(0x3b)
    out.toByteArray
  }

  /** GIF-LZW encode (spec Appendix F): emits Clear, then codes with
    * the width-growth timing [[lzwDecode]] expects (bump AFTER
    * assigning the last code of the current width), resets the table
    * with a fresh Clear when it would pass 4096, ends with EOI. */
  private def lzwEncode(stream: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeSize
      while (accBits >= 8) {
        out.write((acc & 0xff).toInt)
        acc >>>= 8; accBits -= 8
      }
    }
    // dictionary: (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1

    emit(clear)
    var prefix = -1
    var i = 0
    while (i < stream.length) {
      val b = stream(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix << 8) | b
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          if (next == 4096) {
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            codeSize = minCodeSize + 1
          } else {
            dict.put(key, next)
            next += 1
            // one entry later than the decoder's bump — see lzwDecode
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    // tail width alignment: the decoder performs its LAST dictionary
    // add after reading the final data code — one add the encoder's
    // loop never mirrors (it stopped consuming input) — and that add
    // can bump the decoder's width right before it reads EOI. When the
    // final entry count lands exactly on the 1<<codeSize boundary, EOI
    // must therefore be emitted one bit wider. (Found by the brute
    // round-trip scan: every failure was "ends mid-code after N of N
    // pixels" with the table ending on a power of two.)
    if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
    emit(eoi)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}
