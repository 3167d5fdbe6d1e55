package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — the COMPRESSED-container image half of the
  * multimodal decode seam, closing the gap [[BmpImage]] left open: BMP
  * proved decoded-pixel plumbing, but every real image corpus ships
  * compressed containers. Built on the same strict-codec discipline as
  * BmpImage / [[WavAudio]] / PdfText: implement the PUBLIC spec
  * (ISO/IEC 15948) byte-by-byte, validate loudly, never return garbage
  * pixels. The zlib half reuses the exact machinery PdfText's
  * FlateDecode already proved (`java.util.zip.Inflater` — PNG's IDAT
  * stream IS a zlib stream), so no new dependency appears.
  *
  * Scope (documented, not hidden): every spec-valid bit depth —
  * 1/2/4-bit for grayscale and palette (round 16: packed MSB-first
  * samples, the 1-byte filter-bpp floor of spec §9.2, gray rescaled to
  * the 8-bit face by the §12.5 linear map ×255/(2^d−1)), 8, and 16
  * (16-bit samples scale to the 8-bit face by their HIGH byte — the
  * spec §12.5 sanctioned depth rescale, what libpng's strip-16 does;
  * the low byte is decoded, validated by the filter/size machinery,
  * then dropped), across color types 0 (grayscale), 2 (truecolor), 3
  * (palette, depths {1,2,4,8} per §11.2.2, PLTE + optional tRNS), 4
  * (grayscale+alpha) and 6 (truecolor+alpha) — each type restricted to
  * ITS spec-valid depth set, anything else a named reject;
  * compression 0, filter method 0 (all five per-scanline filter types:
  * None/Sub/Up/Average/Paeth), interlace methods 0 (null) and 1
  * (Adam7 — all seven passes, each an independently filtered
  * sub-image, empty passes carrying zero bytes per spec §8.2).
  * Grayscale decodes to the same 0xAARRGGBB pixel
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

  /** Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass. A pass
    * covers image pixels (x0 + i·dx, y0 + j·dy); a pass whose first
    * pixel falls outside the image is EMPTY and contributes no bytes —
    * not even filter bytes. */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** The single non-interlaced "pass": the whole image. */
  private val NullPass: Array[(Int, Int, Int, Int)] = Array((0, 0, 1, 1))

  private def passDims(w: Int, h: Int, p: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = p
    (if (w > x0) (w - x0 + dx - 1) / dx else 0,
      if (h > y0) (h - y0 + dy - 1) / dy else 0)
  }

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
    * garbage, inflated size ≠ the exact per-pass filtered-scanline
    * total, filter byte outside [0,4], IEND missing / non-empty / not
    * last, or bytes after IEND. */
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
    var bitDepth = 8; var sampleBytes = 1; var interlaced = false
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
        bitDepth = bytes(dataOff + 8) & 0xff
        colorType = bytes(dataOff + 9) & 0xff
        val compression = bytes(dataOff + 10) & 0xff
        val filterMethod = bytes(dataOff + 11) & 0xff
        val interlace = bytes(dataOff + 12) & 0xff
        require(width > 0 && width <= (1 << 20), s"bad width $width")
        require(height > 0 && height <= (1 << 20), s"bad height $height")
        // total-pixel budget in LONG arithmetic (advisor r17, TIFF
        // find applied family-wide): per-dim caps alone admit products
        // whose Int byte sizes wrap
        require(width.toLong * height <= (1L << 26),
          s"image ${width}x$height exceeds the ${1L << 26}-pixel budget")
        require(colorType == 0 || colorType == 2 || colorType == 3 ||
          colorType == 4 || colorType == 6,
          s"unsupported color type $colorType " +
            "(only 0=gray, 2=RGB, 3=palette, 4=gray+alpha, 6=RGBA)")
        // spec §11.2.2's exact depth sets per color type: gray takes
        // {1,2,4,8,16}, palette {1,2,4,8}, the multi-channel types
        // {8,16} — any other pairing is INVALID, a named reject
        val validDepths: Set[Int] = colorType match {
          case 0 => Set(1, 2, 4, 8, 16)
          case 3 => Set(1, 2, 4, 8)
          case _ => Set(8, 16)
        }
        require(validDepths(bitDepth),
          s"bit depth $bitDepth invalid for color type $colorType")
        require(compression == 0, s"bad compression method $compression")
        require(filterMethod == 0, s"bad filter method $filterMethod")
        require(interlace == 0 || interlace == 1,
          s"bad interlace method $interlace (0=null, 1=Adam7)")
        sampleBytes = math.max(1, bitDepth / 8) // byte stride, depth >= 8
        interlaced = interlace == 1
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

    val bitsPP = channelsOf(colorType) * bitDepth
    val bpp = channelsOf(colorType) * sampleBytes
    val passes = if (interlaced) Adam7 else NullPass
    // exact filtered-scanline total: per NON-EMPTY pass, hp rows of
    // (1 filter byte + ceil(wp·bitsPP/8)) — sub-8 depths pack samples
    // MSB-first into bytes (spec §7.2), empty Adam7 passes contribute
    // nothing
    var expected = 0L
    passes.foreach { p =>
      val (wp, hp) = passDims(width, height, p)
      if (wp > 0 && hp > 0)
        expected += hp.toLong * (1 + (wp.toLong * bitsPP + 7) / 8)
    }
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
    var segOff = 0
    passes.foreach { p =>
      val (x0, y0, dx, dy) = p
      val (wp, hp) = passDims(width, height, p)
      if (wp > 0 && hp > 0)
        segOff = decodePass(raw, segOff, wp, hp, x0, y0, dx, dy,
          width, bpp, sampleBytes, bitDepth, colorType, palette, px)
    }
    Png(width, height,
      colorType == 6 || colorType == 4 || (colorType == 3 && seenTrns), px)
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
  }

  /** Unfilter one (sub-)image of `hp` scanlines × `wp` pixels starting
    * at `raw(segOff)` and scatter its pixels into `px` on the
    * (x0 + i·dx, y0 + j·dy) grid. Filters operate BYTEWISE with the
    * pass-local bpp (spec §9.2 — for Adam7 each pass filters as an
    * independent image; for 16-bit, `sb` = 2 and the 8-bit face takes
    * each sample's leading high byte; for sub-8 depths the filter bpp
    * FLOORS AT ONE BYTE — spec §9.2's "rounding up to one" — and the
    * unfiltered bytes then unpack MSB-first, `depth` bits per sample,
    * gray rescaled ×255/(2^d−1) per §12.5, palette indices used raw).
    * Returns the offset past this pass's bytes. */
  private def decodePass(raw: Array[Byte], segOff: Int, wp: Int, hp: Int,
      x0: Int, y0: Int, dx: Int, dy: Int, imgW: Int, bpp: Int, sb: Int,
      depth: Int, colorType: Int, palette: Array[Int],
      px: Array[Int]): Int = {
    // packed row width and filter offset: sub-8 rows are ceil(wp·d/8)
    // bytes filtered with bpp = 1; depths >= 8 keep the byte layout
    val n = if (depth < 8) (wp * depth + 7) / 8 else wp * bpp
    val fBpp = if (depth < 8) 1 else bpp
    val rowBytes = 1 + n
    val prior = new Array[Byte](n)
    val recon = new Array[Byte](n)
    var j = 0
    while (j < hp) {
      val ro = segOff + j * rowBytes
      val filter = raw(ro) & 0xff
      require(filter <= 4, s"bad filter type $filter on scanline $j")
      var x = 0
      while (x < n) {
        val rawB = raw(ro + 1 + x) & 0xff
        val left = if (x >= fBpp) recon(x - fBpp) & 0xff else 0
        val up = if (j > 0) prior(x) & 0xff else 0
        val upLeft = if (j > 0 && x >= fBpp) prior(x - fBpp) & 0xff else 0
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
      val y = y0 + j * dy
      var c = 0
      while (c < wp) {
        px(y * imgW + (x0 + c * dx)) =
          if (depth < 8) {
            // MSB-first bit unpack (spec §7.2)
            val bitPos = c * depth
            val v = ((recon(bitPos / 8) & 0xff) >>
              (8 - depth - (bitPos % 8))) & ((1 << depth) - 1)
            if (colorType == 0) {
              // §12.5 linear rescale: 255/(2^d−1) is exact (255/85/17)
              val g = v * (255 / ((1 << depth) - 1))
              0xff000000 | (g << 16) | (g << 8) | g
            } else { // colorType 3 (the only other sub-8-legal type)
              require(v < palette.length,
                s"palette index $v at (${x0 + c * dx},$y) out of range " +
                  s"(${palette.length}-entry PLTE)")
              palette(v)
            }
          } else {
            val o = c * bpp
            colorType match {
              case 0 =>
                val g = recon(o) & 0xff
                0xff000000 | (g << 16) | (g << 8) | g
              case 3 =>
                val idx = recon(o) & 0xff
                // spec §11.2.3: an index past the palette is an error —
                // strict reject, never a clamped/garbage pixel
                require(idx < palette.length,
                  s"palette index $idx at (${x0 + c * dx},$y) out of range " +
                    s"(${palette.length}-entry PLTE)")
                palette(idx)
              case 4 =>
                val g = recon(o) & 0xff
                ((recon(o + sb) & 0xff) << 24) | (g << 16) | (g << 8) | g
              case _ =>
                val a = if (colorType == 6) recon(o + 3 * sb) & 0xff else 0xff
                (a << 24) | ((recon(o) & 0xff) << 16) |
                  ((recon(o + sb) & 0xff) << 8) | (recon(o + 2 * sb) & 0xff)
            }
          }
        c += 1
      }
      System.arraycopy(recon, 0, prior, 0, n)
      j += 1
    }
    segOff + hp * rowBytes
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

  /** Filter the scanlines of one `wp`×`hp` sub-image whose packed
    * sample bytes sit in `samples(sampOff ..)`, writing
    * hp·(1 + wp·bpp) filtered bytes at `out(outOff)`. `filterAt(j)`
    * picks row j's filter type — the ONE filtering kernel shared by
    * every encoder path and both interlace methods. */
  private def filterPass(samples: Array[Byte], sampOff: Int, wp: Int,
      hp: Int, bpp: Int, filterAt: Int => Int, out: Array[Byte],
      outOff: Int): Int = {
    val n = wp * bpp
    var j = 0
    while (j < hp) {
      val f = filterAt(j)
      require(f >= 0 && f <= 4, s"bad filter $f for row $j")
      val so = sampOff + j * n
      val ro = outOff + j * (1 + n)
      out(ro) = f.toByte
      var x = 0
      while (x < n) {
        val v = samples(so + x) & 0xff
        val left = if (x >= bpp) samples(so + x - bpp) & 0xff else 0
        val up = if (j > 0) samples(so + x - n) & 0xff else 0
        val upLeft = if (j > 0 && x >= bpp) samples(so + x - n - bpp) & 0xff
          else 0
        val enc = f match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - (left + up) / 2
          case 4 => v - paeth(left, up, upLeft)
        }
        out(ro + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      j += 1
    }
    outOff + hp * (1 + n)
  }

  /** Turn a full image's packed sample bytes (w·h·bpp, row-major) into
    * the filtered-scanline stream for the chosen interlace method:
    * null = one pass over the whole image; Adam7 = seven passes, each
    * extracted onto its own sub-image grid and filtered independently.
    * `filterFor` receives the GLOBAL output-scanline index (rows of
    * pass k continue pass k−1's numbering), so per-row filter cycling
    * in fixtures and fuzz exercises every filter in every pass. */
  private def buildRaw(samples: Array[Byte], w: Int, h: Int, bpp: Int,
      interlaced: Boolean, filterFor: Int => Int): Array[Byte] = {
    if (!interlaced) {
      val out = new Array[Byte]((1 + w * bpp) * h)
      filterPass(samples, 0, w, h, bpp, filterFor, out, 0)
      out
    } else {
      var total = 0
      Adam7.foreach { p =>
        val (wp, hp) = passDims(w, h, p)
        if (wp > 0 && hp > 0) total += hp * (1 + wp * bpp)
      }
      val out = new Array[Byte](total)
      var outOff = 0
      var globalRow = 0
      Adam7.foreach { p =>
        val (x0, y0, dx, dy) = p
        val (wp, hp) = passDims(w, h, p)
        if (wp > 0 && hp > 0) {
          val sub = new Array[Byte](wp * hp * bpp)
          var j = 0
          while (j < hp) {
            var c = 0
            while (c < wp) {
              System.arraycopy(samples,
                ((y0 + j * dy) * w + (x0 + c * dx)) * bpp,
                sub, (j * wp + c) * bpp, bpp)
              c += 1
            }
            j += 1
          }
          val base = globalRow
          outOff = filterPass(sub, 0, wp, hp, bpp,
            j => filterFor(base + j), out, outOff)
          globalRow += hp
        }
      }
      out
    }
  }

  /** Pack per-pixel sample VALUES (each < 2^d) into MSB-first d-bit
    * rows (spec §7.2), ceil(w·d/8) bytes per row. */
  private def packBitsRows(vals: Array[Int], w: Int, h: Int,
      depth: Int): Array[Byte] = {
    val rb = (w * depth + 7) / 8
    val out = new Array[Byte](rb * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bitPos = x * depth
        val o = y * rb + bitPos / 8
        out(o) = (out(o) |
          (vals(y * w + x) << (8 - depth - (bitPos % 8)))).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[buildRaw]] for sub-8 depths: per pass, extract the sub-image's
    * sample values, bit-pack its rows, and filter them — the packed
    * row is handed to [[filterPass]] as rb one-byte "pixels", which IS
    * the spec §9.2 one-byte filter-bpp floor. */
  private def buildRawSub(vals: Array[Int], w: Int, h: Int, depth: Int,
      interlaced: Boolean, filterFor: Int => Int): Array[Byte] = {
    val passes = if (interlaced) Adam7 else NullPass
    var total = 0
    passes.foreach { p =>
      val (wp, hp) = passDims(w, h, p)
      if (wp > 0 && hp > 0) total += hp * (1 + (wp * depth + 7) / 8)
    }
    val out = new Array[Byte](total)
    var outOff = 0
    var globalRow = 0
    passes.foreach { p =>
      val (x0, y0, dx, dy) = p
      val (wp, hp) = passDims(w, h, p)
      if (wp > 0 && hp > 0) {
        val sub = new Array[Int](wp * hp)
        var j = 0
        while (j < hp) {
          var c = 0
          while (c < wp) {
            sub(j * wp + c) = vals((y0 + j * dy) * w + (x0 + c * dx))
            c += 1
          }
          j += 1
        }
        val rb = (wp * depth + 7) / 8
        val base = globalRow
        outOff = filterPass(packBitsRows(sub, wp, hp, depth), 0, rb, hp, 1,
          j => filterFor(base + j), out, outOff)
        globalRow += hp
      }
    }
    out
  }

  /** Encode 8-bit truecolor PNG from top-down row-major pixels
    * (0xAARRGGBB; alpha ignored unless `withAlpha`). Each row's filter
    * type comes from `filterFor(y)` — the encoder half exists so every
    * decoder path (all five filters, RGB and RGBA, multi-IDAT
    * concatenation, both interlace methods) has a generator for
    * round-trip testing and fixture synthesis; `idatChunkSize` splits
    * the compressed stream into multiple IDAT chunks the way real
    * encoders do. */
  def encode(width: Int, height: Int, pixels: Array[Int],
      withAlpha: Boolean = false,
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val bpp = if (withAlpha) 4 else 3
    val samples = new Array[Byte](width * height * bpp)
    var k = 0
    while (k < pixels.length) {
      val p = pixels(k)
      val o = k * bpp
      samples(o) = ((p >> 16) & 0xff).toByte
      samples(o + 1) = ((p >> 8) & 0xff).toByte
      samples(o + 2) = (p & 0xff).toByte
      if (withAlpha) samples(o + 3) = ((p >>> 24) & 0xff).toByte
      k += 1
    }
    val raw = buildRaw(samples, width, height, bpp, interlaced, filterFor)
    wrapIdat(width, height, if (withAlpha) 6 else 2, 8, interlaced, raw,
      idatChunkSize)
  }

  /** Deflate the filtered scanlines and assemble the container —
    * signature, IHDR (the given depth/color/interlace), any `extra`
    * chunks (PLTE/tRNS, in order) between IHDR and the first IDAT, IDAT
    * split at `idatChunkSize`, IEND — the ONE copy shared by every
    * encoder. */
  private def wrapIdat(width: Int, height: Int, colorType: Int,
      bitDepth: Int, interlaced: Boolean, raw: Array[Byte],
      idatChunkSize: Int,
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
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = if (interlaced) 1 else 0
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
    * half for the palette decode paths — same per-row filter selection,
    * IDAT splitting and interlace support as [[encode]]. */
  def encodePalette(width: Int, height: Int, indices: Array[Int],
      palette: Array[Int],
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue,
      interlaced: Boolean = false,
      depth: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      s"palette depth $depth (spec allows 1/2/4/8)")
    require(indices.length == width * height,
      s"${indices.length} indices for ${width}x$height")
    require(palette.nonEmpty && palette.length <= (1 << depth),
      s"palette has ${palette.length} entries (1..${1 << depth} at " +
        s"depth $depth)")
    val samples = new Array[Byte](indices.length)
    var k = 0
    while (k < indices.length) {
      val idx = indices(k)
      require(idx >= 0 && idx < palette.length,
        s"index $idx at (${k % width},${k / width}) out of palette range " +
          s"(${palette.length})")
      samples(k) = idx.toByte
      k += 1
    }
    val raw =
      if (depth == 8) buildRaw(samples, width, height, 1, interlaced,
        filterFor)
      else buildRawSub(indices, width, height, depth, interlaced, filterFor)
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
    wrapIdat(width, height, 3, depth, interlaced, raw, idatChunkSize, extra)
  }

  /** Encode 8-bit grayscale PNG (color type 0, or 4 with `withAlpha`)
    * from top-down row-major gray values (`gray(i) & 0xff`; alpha from
    * `alpha(i) & 0xff` when present). The generator half for the
    * grayscale decode paths — same per-row filter selection, IDAT
    * splitting and interlace support as [[encode]]. */
  def encodeGray(width: Int, height: Int, gray: Array[Int],
      alpha: Array[Int] = Array.emptyIntArray,
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue,
      interlaced: Boolean = false,
      depth: Int = 8): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      s"gray depth $depth here (16-bit via encode16)")
    require(gray.length == width * height,
      s"${gray.length} gray values for ${width}x$height")
    val withAlpha = alpha.nonEmpty
    require(!(withAlpha && depth != 8),
      s"gray+alpha (color type 4) has no depth-$depth form")
    if (withAlpha) require(alpha.length == gray.length,
      s"${alpha.length} alpha values for ${gray.length} pixels")
    if (depth < 8) {
      gray.zipWithIndex.foreach { case (g, k) =>
        require(g >= 0 && g < (1 << depth),
          s"gray value $g at pixel $k out of depth-$depth range")
      }
      val raw = buildRawSub(gray, width, height, depth, interlaced,
        filterFor)
      return wrapIdat(width, height, 0, depth, interlaced, raw,
        idatChunkSize)
    }
    val bpp = if (withAlpha) 2 else 1
    val samples = new Array[Byte](gray.length * bpp)
    var k = 0
    while (k < gray.length) {
      samples(k * bpp) = (gray(k) & 0xff).toByte
      if (withAlpha) samples(k * bpp + 1) = (alpha(k) & 0xff).toByte
      k += 1
    }
    val raw = buildRaw(samples, width, height, bpp, interlaced, filterFor)
    wrapIdat(width, height, if (withAlpha) 4 else 0, 8, interlaced, raw,
      idatChunkSize)
  }

  /** Encode a 16-bit PNG (color types 0/2/4/6) from per-channel
    * top-down row-major 16-bit sample values (0..65535, stored
    * big-endian per spec §7.1). `channels` carries exactly the color
    * type's channel count in spec order (gray[,alpha] / R,G,B[,alpha]).
    * The generator half for the 16-bit decode paths: the decoder's
    * 8-bit face keeps each sample's HIGH byte, so fixtures with
    * independently varying low bytes prove the low byte is carried
    * through the filter/size machinery and then dropped — same per-row
    * filter selection, IDAT splitting and interlace support as
    * [[encode]]. */
  def encode16(width: Int, height: Int, channels: Array[Array[Int]],
      colorType: Int,
      filterFor: Int => Int = _ => 0,
      idatChunkSize: Int = Int.MaxValue,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(colorType == 0 || colorType == 2 || colorType == 4 ||
      colorType == 6, s"color type $colorType has no 16-bit form here " +
        "(palette is 8-bit only)")
    val nCh = channelsOf(colorType)
    require(channels.length == nCh,
      s"${channels.length} channel arrays for color type $colorType " +
        s"(needs $nCh)")
    channels.foreach(ch => require(ch.length == width * height,
      s"${ch.length} samples for ${width}x$height"))
    val bpp = nCh * 2
    val samples = new Array[Byte](width * height * bpp)
    var k = 0
    while (k < width * height) {
      var ch = 0
      while (ch < nCh) {
        val v = channels(ch)(k)
        require(v >= 0 && v <= 0xffff, s"16-bit sample $v out of range")
        val o = k * bpp + ch * 2
        samples(o) = ((v >> 8) & 0xff).toByte
        samples(o + 1) = (v & 0xff).toByte
        ch += 1
      }
      k += 1
    }
    val raw = buildRaw(samples, width, height, bpp, interlaced, filterFor)
    wrapIdat(width, height, colorType, 16, interlaced, raw, idatChunkSize)
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
