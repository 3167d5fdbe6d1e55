package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (non-interlaced, 8-bit truecolor RGB / RGBA) —
  * the COMPRESSED-container image half of the multimodal decode seam,
  * closing the gap [[BmpImage]] left open: BMP proved decoded-pixel
  * plumbing, but every real image corpus ships compressed containers.
  * Built on the same strict-codec discipline as BmpImage / [[WavAudio]]
  * / PdfText: implement the PUBLIC spec (ISO/IEC 15948) byte-by-byte,
  * validate loudly, never return garbage pixels. The zlib half reuses
  * the exact machinery PdfText's FlateDecode already proved
  * (`java.util.zip.Inflater` — PNG's IDAT stream IS a zlib stream),
  * so no new dependency appears.
  *
  * Scope (documented, not hidden): bit depth 8, color types 0
  * (grayscale), 2 (truecolor), 3 (palette, PLTE + optional tRNS), 4
  * (grayscale+alpha) and 6 (truecolor+alpha), compression 0, filter
  * method 0 (all five per-scanline filter types:
  * None/Sub/Up/Average/Paeth), interlace 0. 16-bit, sub-8-bit palette
  * depths and Adam7 are rejected with named errors — a partial decode
  * of an unsupported layout is exactly the garbage-output failure mode
  * the discipline bans. Grayscale decodes to the same 0xAARRGGBB pixel
  * face with R = G = B = gray, and palette indices resolve through the
  * PLTE/tRNS tables to the same face, so every consumer (phash, stats)
  * is layout-agnostic.
  *
  * Reference semantics: the reference treats media as opaque binary
  * with typed metadata and delegates decode to external services
  * (sanctioned stub boundary); this codec makes the decode half real
  * for the one compressed container that needs nothing beyond the JDK.
  */
object PngImage {

  /** Decoded image. `pixels` is top-down row-major 0xAARGGBB ints
    * (alpha 0xff for color type 2); [[Png#pixel]] masks to 0xRRGGBB —
    * the [[BmpImage.Bmp]]-compatible face the phash seam consumes. */
  final case class Png(width: Int, height: Int, hasAlpha: Boolean,
      pixels: Array[Int]) {
    /** 0xRRGGBB at (x, y), alpha dropped — BmpImage-face parity. */
    def pixel(x: Int, y: Int): Int = pixels(y * width + x) & 0xffffff
    /** alpha channel at (x, y): 255 for color type 2. */
    def alpha(x: Int, y: Int): Int = (pixels(y * width + x) >>> 24) & 0xff
  }

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def chunkType(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def crcOf(b: Array[Byte], typeOff: Int, len: Int): Long = {
    val crc = new CRC32()
    crc.update(b, typeOff, 4 + len)
    crc.getValue
  }

  /** Strict parse. Rejects loudly: bad signature, chunk overrunning the
    * file, CRC mismatch on ANY chunk, IHDR not first / wrong length,
    * unsupported depth/color/compression/filter/interlace, zero or
    * absurd dimensions, non-contiguous IDAT runs, missing IDAT, zlib
    * stream that fails or ends early or carries trailing compressed
    * garbage, inflated size ≠ height × (1 + width·bpp), filter byte
    * outside [0,4], IEND missing / non-empty / not last, or bytes after
    * IEND. */
  def parse(bytes: Array[Byte]): Png = {
    require(bytes.length >= 8 + 25 + 12 + 12, // sig + IHDR + IDAT + IEND
      s"not a PNG: ${bytes.length} bytes")
    var i = 0
    while (i < 8) {
      require(bytes(i) == Signature(i),
        f"bad signature byte $i: 0x${bytes(i) & 0xff}%02x")
      i += 1
    }
    var off = 8
    var width = 0; var height = 0; var colorType = -1
    // palette state (color type 3): PLTE entries as 0xAARRGGBB (alpha
    // 0xff until tRNS overrides); tRNS may only shorten-or-match PLTE
    var palette: Array[Int] = null
    var seenTrns = false
    var seenIhdr = false; var seenIend = false
    // seenIdat tracks CHUNKS, not accumulated bytes: a zero-length IDAT
    // (legal) still starts the run, so a gap after it must end it too
    // (review find: keying off idat.size() let "IDAT(0 B), tEXt, IDAT"
    // slip past the contiguity rule)
    var seenIdat = false
    var idatDone = false // an IDAT run, once broken, must not resume
    val idat = new java.io.ByteArrayOutputStream()
    while (off < bytes.length && !seenIend) {
      require(off + 12 <= bytes.length,
        s"truncated chunk header at $off (${bytes.length} bytes)")
      val len = u32(bytes, off)
      require(len <= Int.MaxValue - 12 && off + 12 + len <= bytes.length,
        s"chunk at $off declares $len bytes, overruns file (${bytes.length})")
      val ctype = chunkType(bytes, off + 4)
      val dataOff = off + 8
      val crcStored = u32(bytes, dataOff + len.toInt)
      val crcActual = crcOf(bytes, off + 4, len.toInt)
      require(crcStored == crcActual,
        f"$ctype chunk CRC mismatch: stored 0x$crcStored%08x, " +
          f"computed 0x$crcActual%08x")
      if (!seenIhdr) {
        require(ctype == "IHDR", s"first chunk is $ctype, not IHDR")
        require(len == 13, s"IHDR length $len, expected 13")
        width = u32(bytes, dataOff).toInt
        height = u32(bytes, dataOff + 4).toInt
        val bitDepth = bytes(dataOff + 8) & 0xff
        colorType = bytes(dataOff + 9) & 0xff
        val compression = bytes(dataOff + 10) & 0xff
        val filterMethod = bytes(dataOff + 11) & 0xff
        val interlace = bytes(dataOff + 12) & 0xff
        require(width > 0 && width <= (1 << 20), s"bad width $width")
        require(height > 0 && height <= (1 << 20), s"bad height $height")
        require(bitDepth == 8, s"unsupported bit depth $bitDepth (only 8)")
        require(colorType == 0 || colorType == 2 || colorType == 3 ||
          colorType == 4 || colorType == 6,
          s"unsupported color type $colorType " +
            "(only 0=gray, 2=RGB, 3=palette, 4=gray+alpha, 6=RGBA)")
        require(compression == 0, s"bad compression method $compression")
        require(filterMethod == 0, s"bad filter method $filterMethod")
        require(interlace == 0,
          s"unsupported interlace $interlace (only non-interlaced)")
        seenIhdr = true
      } else ctype match {
        case "IHDR" => throw new IllegalArgumentException("duplicate IHDR")
        case "IDAT" =>
          require(!idatDone,
            "non-contiguous IDAT chunks (IDAT run resumed after a gap)")
          seenIdat = true
          idat.write(bytes, dataOff, len.toInt)
        case "PLTE" =>
          // spec §11.2.3: PLTE shall not appear for grayscale types,
          // shall precede the first IDAT, at most once, 1–256 RGB
          // triples. For truecolor (2/6) it is a legal suggested
          // quantization palette — validated then ignored.
          require(colorType != 0 && colorType != 4,
            s"PLTE forbidden for grayscale color type $colorType")
          require(palette == null, "duplicate PLTE")
          require(!seenIdat, "PLTE after first IDAT")
          require(len > 0 && len % 3 == 0 && len <= 768,
            s"PLTE length $len (must be a positive multiple of 3, <= 768)")
          palette = Array.tabulate((len / 3).toInt) { j =>
            0xff000000 | ((bytes(dataOff + 3 * j) & 0xff) << 16) |
              ((bytes(dataOff + 3 * j + 1) & 0xff) << 8) |
              (bytes(dataOff + 3 * j + 2) & 0xff)
          }
        case "tRNS" =>
          // for type 3: per-palette-entry alpha, after PLTE and before
          // IDAT, no longer than the palette. For types 0/2 it is a
          // legal color-key we deliberately ignore (ancillary — safely
          // skippable, decode stays opaque); for 4/6 the spec forbids it.
          require(colorType != 4 && colorType != 6,
            s"tRNS forbidden for alpha color type $colorType")
          if (colorType == 3) {
            require(palette != null, "tRNS before PLTE")
            require(!seenIdat, "tRNS after first IDAT")
            require(!seenTrns, "duplicate tRNS")
            require(len <= palette.length,
              s"tRNS carries $len entries for ${palette.length}-entry palette")
            seenTrns = true
            var j = 0
            while (j < len.toInt) {
              palette(j) = (palette(j) & 0xffffff) |
                ((bytes(dataOff + j) & 0xff) << 24)
              j += 1
            }
          } else if (seenIdat) idatDone = true
        case "IEND" =>
          require(len == 0, s"IEND carries $len data bytes")
          seenIend = true
        case other =>
          // ancillary chunks (tEXt, tIME, gAMA, …) are CRC-checked above
          // and skipped; an unknown CRITICAL chunk (uppercase first
          // letter) cannot be safely ignored per the spec
          require((other.charAt(0) & 0x20) != 0,
            s"unknown critical chunk $other")
          if (seenIdat) idatDone = true
      }
      off += 12 + len.toInt
    }
    require(seenIend, "missing IEND")
    require(off == bytes.length,
      s"${bytes.length - off} trailing bytes after IEND")
    require(idat.size() > 0, "missing IDAT")
    require(colorType != 3 || palette != null,
      "palette image (color type 3) without PLTE")

    val bpp = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val rowBytes = 1 + width * bpp
    val expected = rowBytes.toLong * height
    require(expected <= Int.MaxValue, s"image too large: $expected bytes")
    // memory-amplification guard for untrusted bytes: deflate expands at
    // most ~1032:1 (each 5-byte stored-block header aside, a maximal
    // back-reference run encodes 258 bytes in 2 bits of a dynamic-Huffman
    // match). A crafted in-cap IHDR (up to 2^20 × 2^20) must not force a
    // ~2 GB allocation before the IDAT payload proves it could plausibly
    // produce that many bytes.
    require(expected <= idat.size().toLong * 1032 + 64,
      s"IHDR declares $expected pixel bytes but IDAT carries only " +
        s"${idat.size()} compressed bytes (max deflate expansion exceeded)")
    val raw = inflateExact(idat.toByteArray, expected.toInt)

    val px = new Array[Int](width * height)
    val prior = new Array[Byte](width * bpp) // previous recon scanline
    val recon = new Array[Byte](width * bpp)
    var y = 0
    while (y < height) {
      val ro = y * rowBytes
      val filter = raw(ro) & 0xff
      require(filter <= 4, s"bad filter type $filter on scanline $y")
      var x = 0
      val n = width * bpp
      while (x < n) {
        val rawB = raw(ro + 1 + x) & 0xff
        val left = if (x >= bpp) recon(x - bpp) & 0xff else 0
        val up = if (y > 0) prior(x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) prior(x - bpp) & 0xff else 0
        val rec = filter match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 => rawB + paeth(left, up, upLeft)
        }
        recon(x) = (rec & 0xff).toByte
        x += 1
      }
      var c = 0
      while (c < width) {
        val o = c * bpp
        px(y * width + c) = colorType match {
          case 0 =>
            val g = recon(o) & 0xff
            0xff000000 | (g << 16) | (g << 8) | g
          case 3 =>
            val idx = recon(o) & 0xff
            // spec §11.2.3: an index past the palette is an error —
            // strict reject, never a clamped/garbage pixel
            require(idx < palette.length,
              s"palette index $idx at ($c,$y) out of range " +
                s"(${palette.length}-entry PLTE)")
            palette(idx)
          case 4 =>
            val g = recon(o) & 0xff
            ((recon(o + 1) & 0xff) << 24) | (g << 16) | (g << 8) | g
          case _ =>
            val a = if (bpp == 4) recon(o + 3) & 0xff else 0xff
            (a << 24) | ((recon(o) & 0xff) << 16) |
              ((recon(o + 1) & 0xff) << 8) | (recon(o + 2) & 0xff)
        }
        c += 1
      }
      System.arraycopy(recon, 0, prior, 0, n)
      y += 1
    }
    Png(width, height,
      colorType == 6 || colorType == 4 || (colorType == 3 && seenTrns), px)
  }

  /** Paeth predictor (PNG spec §9.4) — nearest of left/up/up-left to
    * the linear estimate left + up − upLeft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Strict zlib inflate: must produce EXACTLY `expected` bytes, reach
    * stream end, and leave no unconsumed compressed input. Unlike
    * PdfText's tolerant inflate (real-world PDFs truncate mid-stream
    * and partial text beats none), a pixel array with a hole is garbage
    * — so every deviation rejects. */
  private def inflateExact(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(z)
      val out = new Array[Byte](expected)
      var total = 0
      var n = -1
      while (total < expected && n != 0) {
        n = try inf.inflate(out, total, expected - total)
        catch { case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"corrupt zlib stream in IDAT: ${e.getMessage}")
        }
        total += n
      }
      require(total == expected,
        s"IDAT inflates to $total bytes, expected $expected")
      // over-long streams: either more pixels than the header declares
      // (finished=false) or compressed trailing garbage (remaining>0)
      require(inf.finished(),
        s"IDAT stream continues past the $expected declared pixel bytes")
      require(inf.getRemaining == 0,
        s"${inf.getRemaining} unconsumed bytes after zlib stream end")
      out
    } finally inf.end()
  }

  /** Encode 8-bit truecolor PNG from top-down row-major pixels
    * (0xAARRGGBB; alpha ignored unless `withAlpha`). Each row's filter
    * type comes from `filterFor(y)` — the encoder half exists so every
    * decoder path (all five filters, RGB and RGBA, multi-IDAT
    * concatenation) has a generator for round-trip testing and fixture
    * synthesis; `idatChunkSize` splits the compressed stream into
    * multiple IDAT chunks the way real encoders do. */
  def encode(width: Int, height: Int, pixels: Array[Int],
      withAlpha: Boolean = false,
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    require(idatChunkSize > 0, s"bad idatChunkSize $idatChunkSize")
    val bpp = if (withAlpha) 4 else 3
    val n = width * bpp
    val raw = new Array[Byte]((1 + n) * height)
    val cur = new Array[Byte](n)
    val prior = new Array[Byte](n)
    var y = 0
    while (y < height) {
      var c = 0
      while (c < width) {
        val p = pixels(y * width + c)
        val o = c * bpp
        cur(o) = ((p >> 16) & 0xff).toByte
        cur(o + 1) = ((p >> 8) & 0xff).toByte
        cur(o + 2) = (p & 0xff).toByte
        if (withAlpha) cur(o + 3) = ((p >>> 24) & 0xff).toByte
        c += 1
      }
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"bad filter $f for row $y")
      val ro = y * (1 + n)
      raw(ro) = f.toByte
      var x = 0
      while (x < n) {
        val v = cur(x) & 0xff
        val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val up = if (y > 0) prior(x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) prior(x - bpp) & 0xff else 0
        val enc = f match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case 4 => v - paeth(left, up, upLeft)
        }
        raw(ro + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prior, 0, n)
      y += 1
    }
    wrapIdat(width, height, if (withAlpha) 6 else 2, raw, idatChunkSize)
  }

  /** Deflate the filtered scanlines and assemble the container —
    * signature, IHDR (bit depth 8, the given color type), any `extra`
    * chunks (PLTE/tRNS, in order) between IHDR and the first IDAT, IDAT
    * split at `idatChunkSize`, IEND — the ONE copy shared by [[encode]],
    * [[encodeGray]] and [[encodePalette]]. */
  private def wrapIdat(width: Int, height: Int, colorType: Int,
      raw: Array[Byte], idatChunkSize: Int,
      extra: Seq[(String, Array[Byte])] = Nil): Array[Byte] = {
    require(idatChunkSize > 0, s"bad idatChunkSize $idatChunkSize")
    val def_ = new Deflater()
    val z = try {
      def_.setInput(raw); def_.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!def_.finished()) buf.write(tmp, 0, def_.deflate(tmp))
      buf.toByteArray
    } finally def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, width); putU32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    writeChunk(out, "IHDR", ihdr)
    extra.foreach { case (t, d) => writeChunk(out, t, d) }
    var zo = 0
    while (zo < z.length) {
      val take = math.min(idatChunkSize, z.length - zo)
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, zo, zo + take))
      zo += take
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode 8-bit palette PNG (color type 3) from top-down row-major
    * palette indices and a palette of 0xAARRGGBB entries. Emits PLTE
    * always; emits tRNS covering entries up to the LAST non-opaque one
    * (the spec-minimal table — trailing opaque entries default to 255
    * on decode, so round-trip alpha is exact either way). The generator
    * half for the palette decode paths — same per-row filter selection
    * and IDAT splitting as [[encode]]. */
  def encodePalette(width: Int, height: Int, indices: Array[Int],
      palette: Array[Int],
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(indices.length == width * height,
      s"${indices.length} indices for ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette has ${palette.length} entries (1..256)")
    val raw = new Array[Byte]((1 + width) * height)
    val cur = new Array[Byte](width)
    val prior = new Array[Byte](width)
    var y = 0
    while (y < height) {
      var c = 0
      while (c < width) {
        val idx = indices(y * width + c)
        require(idx >= 0 && idx < palette.length,
          s"index $idx at ($c,$y) out of palette range (${palette.length})")
        cur(c) = idx.toByte
        c += 1
      }
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"bad filter $f for row $y")
      val ro = y * (1 + width)
      raw(ro) = f.toByte
      var x = 0
      while (x < width) {
        val v = cur(x) & 0xff
        val left = if (x >= 1) cur(x - 1) & 0xff else 0
        val up = if (y > 0) prior(x) & 0xff else 0
        val upLeft = if (y > 0 && x >= 1) prior(x - 1) & 0xff else 0
        val enc = f match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case 4 => v - paeth(left, up, upLeft)
        }
        raw(ro + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prior, 0, width)
      y += 1
    }
    val plte = new Array[Byte](palette.length * 3)
    var j = 0
    while (j < palette.length) {
      plte(3 * j) = ((palette(j) >> 16) & 0xff).toByte
      plte(3 * j + 1) = ((palette(j) >> 8) & 0xff).toByte
      plte(3 * j + 2) = (palette(j) & 0xff).toByte
      j += 1
    }
    val trnsLen = palette.lastIndexWhere(p => ((p >>> 24) & 0xff) != 0xff) + 1
    val extra =
      if (trnsLen == 0) Seq("PLTE" -> plte)
      else Seq("PLTE" -> plte,
        "tRNS" -> Array.tabulate(trnsLen)(j => ((palette(j) >>> 24) & 0xff).toByte))
    wrapIdat(width, height, 3, raw, idatChunkSize, extra)
  }

  /** Encode 8-bit grayscale PNG (color type 0, or 4 with `withAlpha`)
    * from top-down row-major gray values (`gray(i) & 0xff`; alpha from
    * `alpha(i) & 0xff` when present). The generator half for the
    * grayscale decode paths — same per-row filter selection and IDAT
    * splitting as [[encode]]. */
  def encodeGray(width: Int, height: Int, gray: Array[Int],
      alpha: Array[Int] = Array.emptyIntArray,
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(gray.length == width * height,
      s"${gray.length} gray values for ${width}x$height")
    val withAlpha = alpha.nonEmpty
    if (withAlpha) require(alpha.length == gray.length,
      s"${alpha.length} alpha values for ${gray.length} pixels")
    val bpp = if (withAlpha) 2 else 1
    val n = width * bpp
    val raw = new Array[Byte]((1 + n) * height)
    val cur = new Array[Byte](n)
    val prior = new Array[Byte](n)
    var y = 0
    while (y < height) {
      var c = 0
      while (c < width) {
        cur(c * bpp) = (gray(y * width + c) & 0xff).toByte
        if (withAlpha) cur(c * bpp + 1) = (alpha(y * width + c) & 0xff).toByte
        c += 1
      }
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"bad filter $f for row $y")
      val ro = y * (1 + n)
      raw(ro) = f.toByte
      var x = 0
      while (x < n) {
        val v = cur(x) & 0xff
        val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val up = if (y > 0) prior(x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) prior(x - bpp) & 0xff else 0
        val enc = f match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case 4 => v - paeth(left, up, upLeft)
        }
        raw(ro + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      System.arraycopy(cur, 0, prior, 0, n)
      y += 1
    }
    wrapIdat(width, height, if (withAlpha) 4 else 0, raw, idatChunkSize)
  }

  private def putU32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >>> 24) & 0xff).toByte; b(o + 1) = ((v >>> 16) & 0xff).toByte
    b(o + 2) = ((v >>> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream,
      ctype: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putU32(len, 0, data.length)
    out.write(len, 0, 4)
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb, 0, 4); crc.update(data, 0, data.length)
    val cb = new Array[Byte](4); putU32(cb, 0, crc.getValue.toInt)
    out.write(cb, 0, 4)
  }
}
