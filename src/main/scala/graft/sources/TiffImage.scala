package graft.sources

/** Pure-JVM baseline TIFF codec (TIFF 6.0) — the most common
  * real-corpus image container the dispatch face could not yet sniff,
  * built on the same discipline as [[BmpImage]]/[[PngImage]]/
  * [[JpegImage]]: implement the PUBLIC spec byte-by-byte, validate
  * strictly, never return garbage pixels.
  *
  * Scope (the real-world baseline, everything else a NAMED reject):
  *  - both byte orders (`II*` little-endian, `MM*` big-endian);
  *  - 8-bit and 16-bit samples (16-bit scales to the 8-bit face by
  *    high byte, the PNG-16 convention); photometric 0 (WhiteIsZero),
  *    1 (BlackIsZero), 2 (RGB, SamplesPerPixel 3) and 3 (8-bit
  *    palette through a 16-bit ColorMap); 1-BIT bilevel samples
  *    (round 18 — the scanned-document depth; photometric 0/1,
  *    strips only, MSB-first FillOrder 1);
  *  - compression 1 (none), 5 (TIFF-LZW: MSB-first bit packing,
  *    9→12-bit codes with the spec's EARLY width change — one code
  *    sooner than GIF's LSB-first variant), 8/32946 (zlib Deflate)
  *    and 32773 (PackBits RLE) — with predictor 1 (none) or 2
  *    (horizontal differencing per sample channel); on 1-bit pages
  *    additionally the CCITT family via [[CcittCodec]]: 2 (G3
  *    Modified Huffman), 3 (T.4, 1D and 2D per T4Options bit 0,
  *    fill bits tolerated, uncompressed-mode escape rejected) and
  *    4 (T.6, extensions rejected); and NEW-STYLE JPEG (compression
  *    7, TTN2) on 8-bit gray/YCbCr pages — each strip an embedded
  *    [[JpegImage]] stream, abbreviated streams merged with the
  *    shared tag-347 JPEGTables payload (old-style JPEG, compression
  *    6, is spec-deprecated and stays a named reject);
  *  - strip layout (RowsPerStrip + StripOffsets/StripByteCounts) AND
  *    tile layout (TileWidth/TileLength/TileOffsets/TileByteCounts,
  *    edge tiles padded to full tile size per spec §15);
  *  - orientation tag 274, normalized to the UPRIGHT face through the
  *    same one-copy [[JpegImage.exifSource]] mapping the EXIF lane
  *    uses (EXIF's orientation IS this TIFF tag — Exif 2.32 §4.6.4
  *    adopts it verbatim), so a rotated TIFF cannot escape dedup any
  *    more than a rotated JPEG can.
  *
  * The IFD walk is strict: entries must be ascending by tag (TIFF 6.0
  * §2), counts/types must match the baseline spec, and every
  * offset/byte-count is bounds-checked before a read — a file that
  * lies about itself is a named reject into the quarantine lane, not
  * an ArrayIndexOutOfBounds in an executor.
  *
  * Reference semantics: the reference treats downloaded documents as
  * opaque binary and delegates any media decode to external services
  * (epa_ingestion.py:1 stores attachments verbatim); this codec closes
  * the decode half for the TIFF container the way BmpImage/PngImage
  * did for BMP/PNG — no image libraries exist in this environment, but
  * a container walk needs none.
  */
object TiffImage {

  /** Decoded TIFF, already orientation-normalized: `pixels` are
    * top-left row-major 0xRRGGBB ints (no alpha — callers add the
    * opaque face like the BMP path). */
  final case class Tiff(width: Int, height: Int, photometric: Int,
      compression: Int, tiled: Boolean, pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x)
  }

  // ------------------------------------------------------------ parse

  /** Strict parse. Rejects loudly (named reasons): wrong magic/order,
    * non-ascending IFD, unsupported bits/compression/photometric/
    * planar config, missing layout tags, offsets or counts overrunning
    * the file, LZW codes out of table range, short sample data. */
  def parse(bytes: Array[Byte]): Tiff = {
    val (big, ifd0) = header(bytes)
    val (page, next) = parseIfd(bytes, big, ifd0)
    // a silent first-page decode of a 50-page scanned document is
    // silent data loss — the GIF "multi-frame" posture applies
    require(next == 0,
      s"multi-page TIFF (next IFD at $next — use parsePages)")
    page
  }

  /** Decode every page of a (possibly multi-page) TIFF — the scanned-
    * document shape, and the container analog of
    * [[GifImage.decodeAnimation]]: IFDs chain through their trailing
    * next pointer; each page carries its own geometry, photometric,
    * layout and compression. Strict: a chain that cycles or exceeds
    * `maxPages` is a named reject. */
  def parsePages(bytes: Array[Byte], maxPages: Int = 256): Seq[Tiff] = {
    val (big, ifd0) = header(bytes)
    val seen = scala.collection.mutable.Set.empty[Long]
    val pages = scala.collection.mutable.ArrayBuffer.empty[Tiff]
    var off = ifd0
    while (off != 0) {
      require(seen.add(off), s"IFD chain cycles back to offset $off")
      require(pages.length < maxPages,
        s"IFD chain exceeds $maxPages pages")
      val (page, next) = parseIfd(bytes, big, off)
      pages += page
      off = next
    }
    pages.toSeq
  }

  private def header(bytes: Array[Byte]): (Boolean, Long) = {
    require(bytes.length >= 8, s"not a TIFF: ${bytes.length} bytes")
    val big = ((bytes(0) & 0xff).toChar, (bytes(1) & 0xff).toChar) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case (a, b) => throw new IllegalArgumentException(
        s"bad TIFF byte order '$a$b' (need II or MM)")
    }
    val magic = if (big) ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
      else (bytes(2) & 0xff) | ((bytes(3) & 0xff) << 8)
    require(magic == 42, s"bad TIFF magic $magic (need 42)")
    val ifdOff =
      if (big) ((bytes(4) & 0xffL) << 24) | ((bytes(5) & 0xffL) << 16) |
        ((bytes(6) & 0xffL) << 8) | (bytes(7) & 0xffL)
      else (bytes(4) & 0xffL) | ((bytes(5) & 0xffL) << 8) |
        ((bytes(6) & 0xffL) << 16) | ((bytes(7) & 0xffL) << 24)
    require(ifdOff >= 8 && ifdOff + 2 <= bytes.length,
      s"IFD offset $ifdOff out of range")
    (big, ifdOff)
  }

  /** One IFD's page + the chain's next-IFD offset (0 = end). */
  private def parseIfd(bytes: Array[Byte], big: Boolean,
      ifdOff: Long): (Tiff, Long) = {
    def u16(o: Int): Int = {
      require(o >= 0 && o + 2 <= bytes.length, s"u16 read at $o overruns file")
      if (big) ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      else (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    }
    def u32(o: Int): Long = {
      require(o >= 0 && o + 4 <= bytes.length, s"u32 read at $o overruns file")
      if (big) ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      else (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    }

    // one pass over the IFD: tag -> numeric values (SHORT or LONG only
    // — the baseline tags this scope consumes are all integral)
    val base = ifdOff.toInt
    val nEntries = u16(base)
    require(nEntries > 0, "empty IFD")
    require(base + 2 + 12 * nEntries + 4 <= bytes.length,
      s"IFD declares $nEntries entries, overruns file")
    val tags = scala.collection.mutable.LinkedHashMap.empty[Int, Array[Long]]
    var jpegTables: Array[Byte] = null // tag 347 (UNDEFINED payload)
    var prevTag = -1
    var i = 0
    while (i < nEntries) {
      val e = base + 2 + 12 * i
      val tag = u16(e)
      require(tag > prevTag,
        s"IFD entries not ascending (tag $tag after $prevTag)")
      prevTag = tag
      val typ = u16(e + 2)
      val count = u32(e + 4)
      require(count >= 1 && count <= (1L << 24), s"tag $tag count $count")
      if (tag == 347 && typ == 7) {
        // JPEGTables: an abbreviated tables-only JPEG stream shared by
        // every strip (new-style JPEG-in-TIFF, TTN2)
        val valOff =
          if (count <= 4) e + 8
          else {
            val off = u32(e + 8)
            require(off >= 8 && off + count <= bytes.length,
              s"tag 347 value offset $off overruns file")
            off.toInt
          }
        jpegTables = java.util.Arrays.copyOfRange(bytes, valOff,
          valOff + count.toInt)
        require(jpegTables.length >= 4 &&
          (jpegTables(0) & 0xff) == 0xff && (jpegTables(1) & 0xff) == 0xd8,
          "JPEGTables payload does not start with SOI")
      }
      val width = typ match {
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case 5 => 8 // RATIONAL (round 19: YCbCrCoefficients / RefBW
                    // must be VALIDATED, not skipped — a headroom-coded
                    // file read as full-range is silent garbage pixels)
        case _ => 0 // skipped (ASCII metadata etc.)
      }
      if (width > 0) {
        val totalBytes = width * count
        val valOff =
          if (totalBytes <= 4) e + 8
          else {
            val off = u32(e + 8)
            require(off >= 8 && off + totalBytes <= bytes.length,
              s"tag $tag value offset $off overruns file")
            off.toInt
          }
        // RATIONALs store as interleaved numerator/denominator pairs
        tags(tag) =
          if (typ == 5) Array.tabulate(2 * count.toInt)(k =>
            u32(valOff + 4 * k))
          else Array.tabulate(count.toInt)(k =>
            if (typ == 3) u16(valOff + 2 * k).toLong else u32(valOff + 4 * k))
      }
      i += 1
    }
    def one(tag: Int, default: Long = -1L): Long =
      tags.get(tag).map { v =>
        require(v.length == 1, s"tag $tag expects one value, got ${v.length}")
        v(0)
      }.getOrElse {
        require(default >= 0, s"required tag $tag missing"); default
      }

    val width = one(256).toInt
    val height = one(257).toInt
    require(width > 0 && width <= (1 << 20), s"bad width $width")
    require(height > 0 && height <= (1 << 20), s"bad height $height")
    // total-pixel budget in LONG arithmetic (advisor r17): the per-dim
    // caps alone admit 2^40-pixel products whose Int byte sizes wrap —
    // a crafted 1048576x2048 header would NegativeArraySize (or, with
    // dims chosen so the product wraps non-negative, allocate a buffer
    // SMALLER than width*height and break the never-return-garbage
    // contract). 2^26 pixels bounds every buffer below 403 MB.
    require(width.toLong * height <= (1L << 26),
      s"image ${width}x$height exceeds the ${1L << 26}-pixel budget")
    val spp = one(277, default = 1).toInt
    val bits = tags.getOrElse(258, Array(1L))
    require(bits.length == spp &&
      (bits.forall(_ == 8) || bits.forall(_ == 16) || bits.forall(_ == 1)),
      s"unsupported BitsPerSample ${bits.mkString("/")} " +
        "(only uniform 1, 8 or 16 per sample)")
    val oneBit = bits(0) == 1
    val bps = if (oneBit) 1 else (bits(0) / 8).toInt // bytes per sample
    val compression = one(259, default = 1).toInt
    val ccitt = compression == 2 || compression == 3 || compression == 4
    val jpegComp = compression == 7 // new-style JPEG-in-TIFF (TTN2)
    require(compression == 1 || compression == 5 || compression == 8 ||
      compression == 32773 || compression == 32946 || ccitt || jpegComp,
      s"compression $compression unsupported " +
        "(only 1=none, 2/3/4=CCITT, 5=LZW, 7=JPEG, 8/32946=Deflate, " +
        "32773=PackBits)")
    require(!ccitt || oneBit,
      s"CCITT compression $compression requires 1-bit samples " +
        s"(BitsPerSample ${bits(0)})")
    // FillOrder 2 (LSB-first bits within a byte) — the common layout
    // of real fax TIFFs (TIFF 6.0 §4 allows it; spec recommends it
    // only with CCITT data). In scope for 1-bit pages: the segment
    // bytes are bit-reversed before decode. On deeper samples the tag
    // is meaningless noise and stays a named reject.
    val fillOrder = one(266, default = 1).toInt
    require(fillOrder == 1 || (fillOrder == 2 && oneBit &&
      (ccitt || compression == 1)),
      s"FillOrder 2 (LSB-first bits) only supported on 1-bit " +
        s"CCITT/uncompressed pages (compression $compression, " +
        s"BitsPerSample ${bits(0)})")
    // T.4/T.6 option tags: 2D T.4 and fill bits are in scope, the
    // uncompressed-mode escape (bit 1) and every T.6 extension are not
    val t4opts = one(292, default = 0).toInt
    require(compression != 3 || (t4opts & ~5) == 0,
      s"T4Options $t4opts unsupported (uncompressed-mode escape)")
    val t4TwoD = compression == 3 && (t4opts & 1) == 1
    require(compression != 4 || one(293, default = 0) == 0,
      "T6Options extensions unsupported")
    val photometric = one(262).toInt
    require(photometric >= 0 && photometric <= 3 || photometric == 5 ||
      photometric == 6,
      s"photometric $photometric unsupported (only 0/1/2/3/5/6)")
    require(!oneBit || photometric <= 1,
      s"1-bit photometric $photometric unsupported (only 0/1)")
    // photometric 6: inside JPEG (compression 7) the transform lives
    // in the JPEG stream; outside it (round 19 — NATIVE YCbCr, the
    // digital-camera TIFF layout) the sample data is subsampled
    // chroma data units per TIFF 6.0 §21, decoded below
    val yccNative = photometric == 6 && !jpegComp
    require(!yccNative || bits(0) == 8,
      s"native YCbCr with ${bits(0)}-bit samples unsupported")
    val (subH, subV) =
      if (yccNative) {
        val s = tags.getOrElse(530, Array(2L, 2L))
        require(s.length == 2 && (s(0) == 1 || s(0) == 2) &&
          (s(1) == 1 || s(1) == 2),
          s"YCbCrSubSampling ${s.mkString("x")} unsupported (only 1/2)")
        (s(0).toInt, s(1).toInt)
      } else (1, 1)
    if (yccNative) {
      // num/den pairs: value k is v(2k)/v(2k+1)
      def frac(v: Array[Long], k: Int, num: Long, den: Long): Boolean =
        v(2 * k + 1) != 0 && v(2 * k) * den == num * v(2 * k + 1)
      tags.get(529).foreach { v => // YCbCrCoefficients
        require(v.length == 6 && frac(v, 0, 299, 1000) &&
          frac(v, 1, 587, 1000) && frac(v, 2, 114, 1000),
          "YCbCrCoefficients other than CCIR 601 (the spec default) " +
            "unsupported")
      }
      tags.get(532).foreach { v => // ReferenceBlackWhite
        val want = Seq((0L, 255L), (128L, 255L), (128L, 255L))
        require(v.length == 12 && want.zipWithIndex.forall {
          case ((blk, wht), c) =>
            frac(v, 2 * c, blk, 1) && frac(v, 2 * c + 1, wht, 1)
        }, "ReferenceBlackWhite with headroom/footroom unsupported " +
          "(only the centered full-range 0,255/128,255/128,255)")
      }
    }
    require(!jpegComp || (photometric == 1 || photometric == 6),
      s"JPEG compression with photometric $photometric unsupported " +
        "(only 1=gray, 6=YCbCr)")
    require(!jpegComp || bits(0) == 8,
      s"JPEG compression with ${bits(0)}-bit samples unsupported")
    // CMYK (photometric 5, "separated"): 8-bit, InkSet 1 only — the
    // real scanned-press layout; the face conversion is the public
    // multiplicative convention R = (255-C)(255-K)/255 (libtiff
    // tif_getimage), exactly invertible at K = 0
    require(photometric != 5 || bits(0) == 8,
      s"CMYK with ${bits(0)}-bit samples unsupported (only 8)")
    require(photometric != 5 || one(332, default = 1) == 1,
      "InkSet 2 (non-CMYK separations) unsupported")
    // PlanarConfiguration 2 (round 19): each component's samples in
    // their OWN strips/tiles, plane-major (TIFF 6.0 §14's "separate
    // planes" — a real scientific/scanner layout). The segment tables
    // carry spp × segmentsPerPlane entries; decoded planes scatter
    // into the same interleaved sample array the chunky path fills,
    // so the face conversion below is layout-blind. For spp = 1 the
    // two configurations are byte-identical and the tag is accepted
    // either way (the spec tells readers to treat them alike).
    val planar2 = {
      val pc = one(284, default = 1).toInt
      require(pc == 1 || pc == 2,
        s"planar configuration $pc unsupported (only 1=chunky, 2=separate)")
      pc == 2 && spp > 1
    }
    require(!planar2 || !jpegComp,
      "planar JPEG-in-TIFF unsupported (TTN2 JPEG strips interleave)")
    // planar native YCbCr (round 20 — the last TIFF layout cross):
    // plane 0 carries full-resolution Y rows, planes 1/2 carry the
    // SUBSAMPLED chroma planes at ceil(w/subH) x ceil(h/subV)
    // (TIFF 6.0 §21's planar arrangement, libtiff's strip sizing);
    // strips only — no real writer tiles separate subsampled planes
    val planarYcc = planar2 && yccNative
    require(!planarYcc || !(tags.contains(322) || tags.contains(324)),
      "tiled planar native YCbCr unsupported (strips only)")
    val predictor = one(317, default = 1).toInt
    require(predictor == 1 || predictor == 2,
      s"predictor $predictor unsupported (only 1=none, 2=horizontal)")
    require(!oneBit || predictor == 1,
      "predictor 2 on 1-bit samples unsupported")
    require(!jpegComp || predictor == 1,
      "predictor 2 on JPEG-compressed samples unsupported")
    // predictor 2 rides only the LZW/Deflate codecs, matching the
    // ecosystem (libtiff attaches its predictor stage to LZW/ZIP, not
    // PackBits; the JDK reader likewise ignores tag 317 on PackBits —
    // round-19 parity probe). A PackBits+predictor file would be
    // self-consistent here but silently MISREAD everywhere else, the
    // exact garbage-pixels outcome the strict posture exists to stop.
    require(predictor == 1 || compression == 5 || compression == 8 ||
      compression == 32946,
      s"predictor 2 with compression $compression unsupported " +
        "(only LZW/Deflate carry a predictor stage)")
    require(predictor == 1 || !yccNative,
      "predictor 2 on native-YCbCr data units unsupported")
    val expectedSpp =
      if (photometric == 2 || photometric == 6) 3
      else if (photometric == 5) 4 else 1
    require(spp == expectedSpp,
      s"SamplesPerPixel $spp does not match photometric $photometric " +
        s"(need $expectedSpp)")
    val orientation = one(274, default = 1).toInt
    require(orientation >= 1 && orientation <= 8,
      s"orientation $orientation out of range")
    val colorMap: Array[Int] =
      if (photometric == 3) {
        require(bps == 1, "palette TIFF with 16-bit indices unsupported")
        val cm = tags.getOrElse(320,
          throw new IllegalArgumentException("palette TIFF missing ColorMap"))
        require(cm.length == 3 * 256,
          s"ColorMap has ${cm.length} values (need ${3 * 256} for 8-bit)")
        // 16-bit channels -> 8-bit face (the spec's full-range scale)
        Array.tabulate(256) { k =>
          (((cm(k) >> 8).toInt & 0xff) << 16) |
            (((cm(256 + k) >> 8).toInt & 0xff) << 8) |
            ((cm(512 + k) >> 8).toInt & 0xff)
        }
      } else null

    val tiled = tags.contains(322) || tags.contains(324)
    require(!(tiled && tags.contains(273)),
      "file declares BOTH strip and tile layouts")
    require(!(oneBit && tiled), "tiled 1-bit TIFF unsupported")

    // assemble raw sample bytes (after decompression + predictor),
    // top-left row-major, spp * bps bytes per pixel; the JPEG arm
    // bypasses the sample plane and decodes straight into the face
    val spb = spp * bps
    val raw = new Array[Byte](if (jpegComp) 0 else width * height * spb)
    val px = new Array[Int](width * height)
    // embedded-JPEG segment (new-style, TTN2): prepend the shared
    // JPEGTables (when present) to the segment's abbreviated stream,
    // decode with the house [[JpegImage]] codec, validate geometry and
    // channel count strictly — a segment that lies about itself is a
    // named reject like every other one. Strips decode to width×rows
    // at (0, rowOff); tiles (round 19 — the dominant aerial/medical
    // layout) to a FULL tile placed at (colOff, rowOff) with the edge
    // overhang discarded (spec §15: edge tiles are padded to full
    // size).
    def jpegSegment(off: Long, len: Long, segW: Int, segH: Int,
        rowOff: Int, colOff: Int): Unit = {
      require(off >= 8 && len >= 4 && off + len <= bytes.length,
        s"segment at $off+$len overruns file (${bytes.length} bytes)")
      require((bytes(off.toInt) & 0xff) == 0xff &&
        (bytes(off.toInt + 1) & 0xff) == 0xd8,
        "JPEG strip does not start with SOI")
      val stream =
        if (jpegTables == null)
          java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
        else {
          val t = jpegTables
          require(t.length >= 4 && (t(t.length - 2) & 0xff) == 0xff &&
            (t(t.length - 1) & 0xff) == 0xd9,
            "JPEGTables payload does not end with EOI")
          // SOI ++ tables interior (sans SOI/EOI) ++ strip sans SOI
          val out = new java.io.ByteArrayOutputStream()
          out.write(0xff); out.write(0xd8)
          out.write(t, 2, t.length - 4)
          out.write(bytes, off.toInt + 2, len.toInt - 2)
          out.toByteArray
        }
      val jp = JpegImage.parse(stream)
      require(jp.width == segW && jp.height == segH,
        s"JPEG segment decodes to ${jp.width}x${jp.height}, layout " +
          s"needs ${segW}x$segH")
      require(jp.channels == (if (photometric == 1) 1 else 3),
        s"JPEG segment has ${jp.channels} channel(s), photometric " +
          s"$photometric needs ${if (photometric == 1) 1 else 3}")
      var y = 0
      while (y < segH && rowOff + y < height) {
        var x = 0
        while (x < segW && colOff + x < width) {
          px((rowOff + y) * width + colOff + x) =
            jp.pixels(y * segW + x) & 0xffffff
          x += 1
        }
        y += 1
      }
    }
    // `chans` is the component count WITHIN the segment: spp for
    // chunky layouts, 1 for a planar-separate plane (the predictor's
    // "previous sample of the same channel" is then simply the
    // previous sample)
    def undiff(seg: Array[Byte], segW: Int, segH: Int, chans: Int): Unit =
      if (predictor == 2) {
        val sb = chans * bps
        var y = 0
        while (y < segH) {
          var x = 1
          while (x < segW) {
            var c = 0
            while (c < chans) {
              val o = ((y * segW + x) * chans + c) * bps
              if (bps == 1) seg(o) = (seg(o) + seg(o - chans)).toByte
              else {
                // 16-bit differencing operates on sample VALUES in the
                // file byte order (TIFF 6.0 §14), not on bytes
                def rd(p: Int): Int =
                  if (big) ((seg(p) & 0xff) << 8) | (seg(p + 1) & 0xff)
                  else (seg(p) & 0xff) | ((seg(p + 1) & 0xff) << 8)
                val v = (rd(o) + rd(o - sb)) & 0xffff
                if (big) { seg(o) = (v >> 8).toByte; seg(o + 1) = v.toByte }
                else { seg(o) = v.toByte; seg(o + 1) = (v >> 8).toByte }
              }
              c += 1
            }
            x += 1
          }
          y += 1
        }
      }
    // scatter one decoded PLANE segment (rows×segW samples of
    // component `plane`) into the interleaved sample array at
    // (rowOff, colOff)
    def scatterPlane(seg: Array[Byte], plane: Int, segW: Int,
        rows: Int, rowOff: Int, colOff: Int, copyW: Int): Unit = {
      var y = 0
      while (y < rows) {
        var x = 0
        while (x < copyW) {
          var b = 0
          while (b < bps) {
            raw((((rowOff + y) * width + colOff + x) * spp + plane) * bps
              + b) = seg((y * segW + x) * bps + b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
    }
    // native-YCbCr segment (§21): decompress to subsampled data units
    // (subH×subV Y samples row-major, then Cb, Cr), scatter into the
    // interleaved sample plane with chroma replicated across the unit —
    // edge-unit padding samples are discarded. Unit geometry is exact:
    // a segment of segW×segH pixels carries ⌈segW/subH⌉×⌈segH/subV⌉
    // full units (spec: strips/tiles contain complete data units).
    def yccSegment(off: Long, len: Long, segW: Int, segH: Int,
        rowOff: Int, colOff: Int): Unit = {
      val uX = (segW + subH - 1) / subH
      val uY = (segH + subV - 1) / subV
      val unit = subH * subV + 2
      val seg = segment(off, len, uX * uY * unit)
      var uy = 0
      while (uy < uY) {
        var ux = 0
        while (ux < uX) {
          val base = (uy * uX + ux) * unit
          val cb = seg(base + subH * subV)
          val cr = seg(base + subH * subV + 1)
          var dy = 0
          while (dy < subV) {
            val sy = uy * subV + dy
            val y0 = rowOff + sy
            var dx = 0
            while (dx < subH) {
              val sx = ux * subH + dx
              val x0 = colOff + sx
              if (sy < segH && sx < segW && y0 < height && x0 < width) {
                val o = (y0 * width + x0) * 3
                raw(o) = seg(base + dy * subH + dx)
                raw(o + 1) = cb
                raw(o + 2) = cr
              }
              dx += 1
            }
            dy += 1
          }
          ux += 1
        }
        uy += 1
      }
    }
    def segment(off: Long, len: Long, outLen: Int): Array[Byte] = {
      require(off >= 8 && len >= 0 && off + len <= bytes.length,
        s"segment at $off+$len overruns file (${bytes.length} bytes)")
      compression match {
        case 1 =>
          require(len == outLen,
            s"uncompressed segment is $len bytes, layout needs $outLen")
          java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
        case 5 => lzwDecode(bytes, off.toInt, len.toInt, outLen)
        case 8 | 32946 => inflate(bytes, off.toInt, len.toInt, outLen)
        case _ => packBitsDecode(bytes, off.toInt, len.toInt, outLen)
      }
    }
    // 1-bit strip → one byte per pixel, 0 or 255 (the bit scaled to the
    // 8-bit face, so the photometric arms below apply unchanged): CCITT
    // segments decode straight to a 0/1 plane; the byte-packed
    // compressions decompress to MSB-first packed rows first
    def oneBitSegment(off: Long, len: Long, rows: Int): Array[Byte] = {
      require(off >= 8 && len >= 0 && off + len <= bytes.length,
        s"segment at $off+$len overruns file (${bytes.length} bytes)")
      val rowBytes = (width + 7) / 8
      val out = new Array[Byte](rows * width)
      // FillOrder 2: reverse each segment byte's bit order up front so
      // the MSB-first readers below apply unchanged
      def src: Array[Byte] =
        if (fillOrder == 1) bytes
        else {
          val r = new Array[Byte](len.toInt)
          var i = 0
          while (i < r.length) {
            r(i) = reverseBits(bytes(off.toInt + i)); i += 1
          }
          r
        }
      val srcOff = if (fillOrder == 1) off.toInt else 0
      if (ccitt) {
        val plane = CcittCodec.decode(src, srcOff, len.toInt,
          width, rows, compression, t4TwoD)
        var i = 0
        while (i < plane.length) { out(i) = (plane(i) * 255).toByte; i += 1 }
      } else {
        val packed =
          if (fillOrder == 1) segment(off, len, rows * rowBytes)
          else {
            require(len == rows * rowBytes,
              s"uncompressed segment is $len bytes, layout needs " +
                s"${rows * rowBytes}")
            src
          }
        var y = 0
        while (y < rows) {
          var x = 0
          while (x < width) {
            val bit = (packed(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
            out(y * width + x) = (bit * 255).toByte
            x += 1
          }
          y += 1
        }
      }
      out
    }

    if (!tiled) {
      val rps = math.min(one(278, default = height.toLong), height.toLong).toInt
      require(rps > 0, s"RowsPerStrip $rps")
      val nStrips = (height + rps - 1) / rps
      val planes = if (planar2) spp else 1
      val offs = tags.getOrElse(273,
        throw new IllegalArgumentException("missing StripOffsets"))
      val cnts = tags.getOrElse(279,
        throw new IllegalArgumentException("missing StripByteCounts"))
      require(offs.length == planes * nStrips &&
        cnts.length == planes * nStrips,
        s"strip tables have ${offs.length}/${cnts.length} entries " +
          s"(layout needs ${planes * nStrips})")
      var s = 0
      while (s < planes * nStrips) {
        val si = s % nStrips // strips are PLANE-MAJOR (TIFF 6.0 §14)
        val rows = math.min(rps, height - si * rps)
        if (jpegComp) jpegSegment(offs(s), cnts(s), width, rows, si * rps, 0)
        else if (planarYcc) {
          require(nStrips == 1 || rps % subV == 0,
            s"RowsPerStrip $rps not a multiple of YCbCr subsampling $subV")
          val plane = s / nStrips
          if (plane == 0) { // full-resolution luma rows
            val seg = segment(offs(s), cnts(s), rows * width)
            scatterPlane(seg, 0, width, rows, si * rps, 0, width)
          } else {
            // a SUBSAMPLED chroma plane strip: ceil(rows/subV) rows of
            // ceil(width/subH) samples, each replicated across its
            // subH x subV block (§21's sample spacing), edge-clipped
            val cw = (width + subH - 1) / subH
            val crows = (rows + subV - 1) / subV
            val seg = segment(offs(s), cnts(s), crows * cw)
            var cy = 0
            while (cy < crows) {
              var cx = 0
              while (cx < cw) {
                val v = seg(cy * cw + cx)
                var dy = 0
                while (dy < subV) {
                  val y0 = si * rps + cy * subV + dy
                  var dx = 0
                  while (dx < subH) {
                    val x0 = cx * subH + dx
                    if (y0 < height && x0 < width)
                      raw((y0 * width + x0) * 3 + plane) = v
                    dx += 1
                  }
                  dy += 1
                }
                cx += 1
              }
              cy += 1
            }
          }
        }
        else if (yccNative) {
          // data units cannot straddle strips (§21: RowsPerStrip must
          // be a multiple of the vertical subsampling when the image
          // spans several strips; the LAST strip pads up to a unit)
          require(nStrips == 1 || rps % subV == 0,
            s"RowsPerStrip $rps not a multiple of YCbCr subsampling $subV")
          yccSegment(offs(s), cnts(s), width, rows, si * rps, 0)
        }
        else if (planar2) {
          val seg = segment(offs(s), cnts(s), rows * width * bps)
          undiff(seg, width, rows, 1)
          scatterPlane(seg, s / nStrips, width, rows, si * rps, 0, width)
        } else {
          val seg =
            if (oneBit) oneBitSegment(offs(s), cnts(s), rows)
            else {
              val g = segment(offs(s), cnts(s), rows * width * spb)
              undiff(g, width, rows, spp)
              g
            }
          System.arraycopy(seg, 0, raw, si * rps * width * spb, seg.length)
        }
        s += 1
      }
    } else {
      val tw = one(322).toInt
      val th = one(323).toInt
      require(tw > 0 && tw % 16 == 0 && th > 0 && th % 16 == 0,
        s"tile size $tw x $th (spec requires multiples of 16)")
      // same Long-domain budget for the per-tile buffer: tile dims have
      // no per-dim cap of their own, so a lying header could otherwise
      // wrap tw*th*spb (advisor r17)
      require(tw.toLong * th <= (1L << 26),
        s"tile ${tw}x$th exceeds the ${1L << 26}-pixel budget")
      val tx = (width + tw - 1) / tw
      val ty = (height + th - 1) / th
      val planes = if (planar2) spp else 1
      val offs = tags.getOrElse(324,
        throw new IllegalArgumentException("missing TileOffsets"))
      val cnts = tags.getOrElse(325,
        throw new IllegalArgumentException("missing TileByteCounts"))
      require(offs.length == planes * tx * ty &&
        cnts.length == planes * tx * ty,
        s"tile tables have ${offs.length}/${cnts.length} entries " +
          s"(layout needs ${planes * tx * ty})")
      var t = 0
      while (t < planes * tx * ty) {
        val ti = t % (tx * ty) // tiles are PLANE-MAJOR, like strips
        val ox = (ti % tx) * tw; val oy = (ti / tx) * th
        if (jpegComp) jpegSegment(offs(t), cnts(t), tw, th, oy, ox)
        else if (yccNative) yccSegment(offs(t), cnts(t), tw, th, oy, ox)
        else if (planar2) {
          val seg = segment(offs(t), cnts(t), tw * th * bps)
          undiff(seg, tw, th, 1)
          scatterPlane(seg, t / (tx * ty), tw,
            math.min(th, height - oy), oy, ox, math.min(tw, width - ox))
        } else {
          val seg = segment(offs(t), cnts(t), tw * th * spb)
          undiff(seg, tw, th, spp)
          var y = 0
          while (y < th && oy + y < height) {
            val copyW = math.min(tw, width - ox)
            System.arraycopy(seg, y * tw * spb,
              raw, ((oy + y) * width + ox) * spb, copyW * spb)
            y += 1
          }
        }
        t += 1
      }
    }

    // samples -> 0xRRGGBB face (16-bit samples scale to the 8-bit face
    // by taking the high byte — the same full-range convention the
    // 16-bit ColorMap and the PNG 16-bit path use; WhiteIsZero inverts
    // at FULL sample precision before scaling)
    def samp(k: Int, c: Int): Int = {
      val o = (k * spp + c) * bps
      if (bps == 1) raw(o) & 0xff
      else if (big) ((raw(o) & 0xff) << 8) | (raw(o + 1) & 0xff)
      else (raw(o) & 0xff) | ((raw(o + 1) & 0xff) << 8)
    }
    def to8(v: Int): Int = if (bps == 1) v else v >> 8
    var k = 0
    while (!jpegComp && k < width * height) {
      px(k) = photometric match {
        case 0 =>
          val v = to8((if (bps == 1) 255 else 65535) - samp(k, 0))
          (v << 16) | (v << 8) | v
        case 1 => val v = to8(samp(k, 0)); (v << 16) | (v << 8) | v
        case 2 => (to8(samp(k, 0)) << 16) | (to8(samp(k, 1)) << 8) |
          to8(samp(k, 2))
        case 5 => // CMYK: the ONE multiplicative copy (JpegImage's)
          JpegImage.cmykToRgb(samp(k, 0), samp(k, 1), samp(k, 2),
            samp(k, 3))
        case 6 => // native YCbCr: the ONE Rec.601 transform (JPEG's)
          JpegImage.yccToRgb(samp(k, 0), samp(k, 1), samp(k, 2))
        case _ => colorMap(samp(k, 0))
      }
      k += 1
    }

    val nextIfd = u32(base + 2 + 12 * nEntries)
    require(nextIfd == 0 ||
      (nextIfd >= 8 && nextIfd + 2 <= bytes.length),
      s"next IFD offset $nextIfd out of range")
    if (orientation == 1)
      (Tiff(width, height, photometric, compression, tiled, px), nextIfd)
    else {
      // normalize to upright through the ONE orientation mapping (the
      // EXIF lane's — tag 274 is the same tag, same semantics)
      val (nw, nh) = if (orientation >= 5) (height, width) else (width, height)
      val out = new Array[Int](nw * nh)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          val (sx, sy) = JpegImage.exifSource(orientation, x, y, width, height)
          out(y * nw + x) = px(sy * width + sx)
          x += 1
        }
        y += 1
      }
      (Tiff(nw, nh, photometric, compression, tiled, out), nextIfd)
    }
  }

  /** Bit-reverse one byte (FillOrder 2 -> MSB-first). */
  private[graft] def reverseBits(b: Byte): Byte = {
    var v = b & 0xff
    v = ((v & 0x55) << 1) | ((v >> 1) & 0x55)
    v = ((v & 0x33) << 2) | ((v >> 2) & 0x33)
    (((v & 0x0f) << 4) | (v >> 4)).toByte
  }

  // -------------------------------------------------------- TIFF LZW

  /** TIFF 6.0 §13 LZW decode: MSB-first bit packing, initial 9-bit
    * codes, Clear=256, EOI=257, first table entry 258, and the EARLY
    * width change (the decoder widens when its next entry index
    * reaches 2^width − 1; the encoder — whose table runs one entry
    * ahead — at 2^width: both one code sooner than the GIF variant,
    * pinned against the JDK TIFF codec's streams in both directions).
    * Strict: a code beyond the table (other than the KwKwK next-code
    * case), a missing EOI, or output past `outLen` is a named
    * reject. */
  private[graft] def lzwDecode(bytes: Array[Byte], off: Int, len: Int,
      outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var outPos = 0
    var bitPos = 0L
    val endBit = len * 8L
    var width = 9
    def nextCode(): Int = {
      require(bitPos + width <= endBit,
        "LZW stream ends mid-code (no EOI)")
      var v = 0
      var b = 0
      while (b < width) {
        val bit = bitPos + b
        v = (v << 1) |
          ((bytes(off + (bit >> 3).toInt) >> (7 - (bit & 7).toInt)) & 1)
        b += 1
      }
      bitPos += width
      v
    }
    // table as (prefix code, appended byte); -1 prefix = root literal
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = 258
    def reset(): Unit = { next = 258; width = 9 }
    def expand(code: Int): Array[Byte] = {
      var n = 0
      var c = code
      while (c >= 256) { n += 1; c = prefix(c) }
      val s = new Array[Byte](n + 1)
      c = code
      var j = n
      while (j > 0) { s(j) = append(c); c = prefix(c); j -= 1 }
      s(0) = c.toByte
      s
    }
    def write(s: Array[Byte]): Unit = {
      require(outPos + s.length <= outLen,
        s"LZW output exceeds segment size $outLen")
      System.arraycopy(s, 0, out, 0 + outPos, s.length)
      outPos += s.length
    }
    var old = -1
    var done = false
    while (!done) {
      val code = nextCode()
      if (code == 257) done = true // EOI
      else if (code == 256) { reset(); old = -1 } // Clear
      else {
        require(next < 4096, "LZW table overflow without Clear")
        if (old < 0) {
          require(code < 256, s"first code after Clear is $code (not a root)")
          write(Array(code.toByte))
          old = code
        } else {
          require(code <= next, s"LZW code $code beyond table ($next)")
          val s =
            if (code < next) expand(code)
            else { val p = expand(old); p :+ p(0) } // KwKwK
          write(s)
          prefix(next) = old; append(next) = s(0)
          next += 1
          // EARLY change, decoder side: widen at 511/1023/2047 (2^w−1,
          // one entry before the table could address 2^w — the GIF
          // variant widens only at 2^w). Pinned against the JDK TIFF
          // writer's streams: a probe decoded all 8 strips of a
          // high-entropy JDK LZW file at this boundary and at no
          // neighboring one (the first crafted cut used 2^w−2, which
          // round-tripped against its own mirror but desynced from
          // the JDK's exactly at code index 254 — the first 10-bit
          // code. Same family as the GIF width-bump lesson: only
          // cross-decoder evidence catches a self-consistent pair.)
          if (next == (1 << width) - 1 && width < 12) width += 1
          old = code
        }
      }
    }
    require(outPos == outLen,
      s"LZW decoded $outPos bytes, layout needs $outLen")
    out
  }

  /** TIFF LZW encode — the decoder's exact mirror (same early width
    * change, including the pending bump BEFORE the final code and EOI:
    * the GIF lesson, §13 variant), emitting a Clear whenever the table
    * nears 4094 so width can never exceed 12. */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var width = 9
    def emit(code: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        out.write(((acc >> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    val dict = new scala.collection.mutable.LongMap[Int]() // (prefix<<8)|byte
    var next = 258
    def reset(): Unit = { dict.clear(); next = 258; width = 9 }
    emit(256) // spec: each strip begins with a Clear
    var cur = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (cur < 0) cur = b
      else {
        val key = (cur.toLong << 8) | b
        val hit = dict.getOrElse(key, -1)
        if (hit >= 0) cur = hit
        else {
          emit(cur)
          dict.put(key, next)
          next += 1
          // encoder bumps at 2^w: its table runs ONE entry ahead of
          // the decoder's (it adds on its first post-Clear emission,
          // the decoder only from the second code), so 2^w here lands
          // on the decoder's 2^w − 1
          if (next == (1 << width) && width < 12) width += 1
          if (next >= 4094) { emit(256); reset() }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) {
      emit(cur)
      // mirror the decoder's final table add + pending width bump
      next += 1
      if (next == (1 << width) && width < 12) width += 1
    }
    emit(257) // EOI
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }

  // ------------------------------------------------ PackBits / Deflate

  /** TIFF 6.0 §9 PackBits decode: n ≥ 0 → copy n+1 literal bytes;
    * −127 ≤ n ≤ −1 → repeat the next byte 1−n times; −128 → no-op.
    * Strict: output must land exactly on `outLen` and the segment must
    * be fully consumed (a token overrunning either side is a named
    * reject). Tokens never NEED to cross row boundaries (the spec
    * compresses per row) but a decoder is insensitive to where rows
    * end — PackBits carries no inter-token state. */
  private[graft] def packBitsDecode(bytes: Array[Byte], off: Int, len: Int,
      outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = off
    val end = off + len
    var o = 0
    while (o < outLen) {
      require(i < end, "PackBits segment ends mid-stream")
      val n = bytes(i)
      i += 1
      if (n >= 0) {
        require(i + n + 1 <= end, "PackBits literal run overruns segment")
        require(o + n + 1 <= outLen, "PackBits output exceeds segment size")
        System.arraycopy(bytes, i, out, o, n + 1)
        i += n + 1; o += n + 1
      } else if (n != -128) { // -128 is a spec no-op
        require(i < end, "PackBits replicate run missing its byte")
        val cnt = 1 - n
        require(o + cnt <= outLen, "PackBits output exceeds segment size")
        java.util.Arrays.fill(out, o, o + cnt, bytes(i))
        i += 1; o += cnt
      }
    }
    require(i == end, s"PackBits segment carries ${end - i} trailing bytes")
    out
  }

  /** PackBits encode, per ROW (`rowBytes` per row — TIFF 6.0: "each
    * row must be compressed separately"): runs of ≥ 3 identical bytes
    * become replicate tokens, everything else literal tokens of up to
    * 128 bytes. */
  private[graft] def packBitsEncode(data: Array[Byte],
      rowBytes: Int): Array[Byte] = {
    require(rowBytes > 0 && data.length % rowBytes == 0, "row size")
    val out = new java.io.ByteArrayOutputStream()
    var rowStart = 0
    while (rowStart < data.length) {
      val rowEnd = rowStart + rowBytes
      var i = rowStart
      var litStart = i
      def flushLit(until: Int): Unit = {
        var s = litStart
        while (s < until) {
          val n = math.min(128, until - s)
          out.write(n - 1)
          out.write(data, s, n)
          s += n
        }
      }
      while (i < rowEnd) {
        var run = 1
        while (i + run < rowEnd && run < 128 && data(i + run) == data(i))
          run += 1
        if (run >= 3) {
          flushLit(i)
          out.write(1 - run) // two's complement byte
          out.write(data(i))
          i += run
          litStart = i
        } else i += run
      }
      flushLit(rowEnd)
      rowStart = rowEnd
    }
    out.toByteArray
  }

  /** zlib inflate for Deflate-compressed segments (compression 8 and
    * the old-style 32946): strict — exactly `outLen` bytes and a
    * finished stream, or a named reject. */
  private[graft] def inflate(bytes: Array[Byte], off: Int, len: Int,
      outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(bytes, off, len)
      val out = new Array[Byte](outLen)
      var o = 0
      while (o < outLen && !inf.finished()) {
        val n =
          try inf.inflate(out, o, outLen - o)
          catch { case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"Deflate segment corrupt: ${e.getMessage}")
          }
        require(n > 0 || inf.finished(),
          "Deflate segment truncated (inflater stalled)")
        o += n
      }
      require(o == outLen,
        s"Deflate segment decoded $o bytes, layout needs $outLen")
      // the overlong-stream drain probe parses MORE of the stream and
      // can itself hit corruption — it needs the same named-reject
      // wrap as the loop (r18 seal fuzz: a mutated tile that inflated
      // to exactly outLen with a corrupt continuation leaked
      // DataFormatException from here; seeds 9004/9005/9010)
      val drained =
        try inf.finished() || inf.inflate(new Array[Byte](1)) == 0 &&
          inf.finished()
        catch { case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(
            s"Deflate segment corrupt past the layout's $outLen bytes: " +
              e.getMessage)
        }
      require(drained,
        s"Deflate segment decodes past the layout's $outLen bytes")
      out
    } finally inf.end()
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(data); d.finish()
      val buf = new Array[Byte](math.max(64, data.length + 64))
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  // ----------------------------------------------------------- encode

  /** Encode an image for the fixture/parity lanes. `photometric`:
    * 0/1 grayscale (pixels' low byte; 0 stores inverted), 2 RGB,
    * 3 palette (`palette` 0xRRGGBB entries + `indices` in `pixels`).
    * `tileSize` > 0 emits the tile layout (must be a multiple of 16);
    * otherwise strips of `rowsPerStrip`. `orientation` != 1 writes tag
    * 274 — the caller passes pixels ALREADY stored under it (the
    * [[JpegImage.exifStore]] convention). `compression` 0 derives from
    * the legacy `lzw` flag (1 or 5); explicit values: 1 none, 5 LZW,
    * 8 Deflate, 32773 PackBits. `bits` 16 stores each 8-bit channel
    * value c as the full-range 16-bit sample c·257 (the ColorMap
    * scale), so decode's high-byte reduction recovers c exactly. */
  def encode(width: Int, height: Int, pixels: Array[Int],
      photometric: Int = 2, palette: Array[Int] = null,
      bigEndian: Boolean = false, lzw: Boolean = false,
      predictor: Int = 1, rowsPerStrip: Int = 0, tileSize: Int = 0,
      orientation: Int = 1, compression: Int = 0,
      bits: Int = 8, planar2: Boolean = false,
      yccSub: (Int, Int) = (2, 2)): Array[Byte] = {
    val comp = if (compression == 0) { if (lzw) 5 else 1 } else compression
    encodePages(Seq(Page(width, height, pixels, photometric, palette,
      comp, predictor, rowsPerStrip, tileSize, orientation, bits,
      planar2 = planar2, yccSub = yccSub)),
      bigEndian)
  }

  /** Per-page spec for [[encodePages]] — the same knobs as [[encode]]
    * minus the file-level byte order. `bits` 1 writes a bilevel page
    * (pixels must be 0x000000/0xFFFFFF; photometric 0/1 picks which is
    * the 0 bit; compressions 1/5/8/32773 pack rows MSB-first,
    * 2/3/4 CCITT-code the bit plane — `t4TwoD` selects T.4's 2D mode,
    * written as T4Options 1). */
  final case class Page(width: Int, height: Int, pixels: Array[Int],
      photometric: Int = 2, palette: Array[Int] = null,
      compression: Int = 1, predictor: Int = 1, rowsPerStrip: Int = 0,
      tileSize: Int = 0, orientation: Int = 1, bits: Int = 8,
      t4TwoD: Boolean = false, fillOrder2: Boolean = false,
      planar2: Boolean = false, yccSub: (Int, Int) = (2, 2))

  /** Encode a MULTI-PAGE TIFF (the scanned-document shape): one shared
    * header, each page's segments + out-of-line values + IFD written
    * in order, IFDs chained through their trailing next pointers. A
    * single page yields exactly [[encode]]'s layout. */
  def encodePages(pages: Seq[Page],
      bigEndian: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "no pages")
    val out = new java.io.ByteArrayOutputStream()
    def w16o(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(if (bigEndian) 'M' else 'I')
    out.write(if (bigEndian) 'M' else 'I')
    w16o(42)
    out.write(0); out.write(0); out.write(0); out.write(0) // IFD0, patched
    val spans = pages.map(pg => writePage(out, pg, bigEndian))
    val all = out.toByteArray
    def patch(pos: Int, v: Long): Unit =
      if (bigEndian) {
        all(pos) = ((v >> 24) & 0xff).toByte
        all(pos + 1) = ((v >> 16) & 0xff).toByte
        all(pos + 2) = ((v >> 8) & 0xff).toByte
        all(pos + 3) = (v & 0xff).toByte
      } else {
        all(pos) = (v & 0xff).toByte
        all(pos + 1) = ((v >> 8) & 0xff).toByte
        all(pos + 2) = ((v >> 16) & 0xff).toByte
        all(pos + 3) = ((v >> 24) & 0xff).toByte
      }
    patch(4, spans.head._1)
    for (k <- 0 until spans.length - 1)
      patch(spans(k)._2, spans(k + 1)._1) // chain next pointers
    all
  }

  /** Write one page's segments, value arrays and IFD into `out`;
    * @return (this page's IFD offset, byte position of its next-IFD
    *         pointer — written as 0, patched by the caller). */
  private def writePage(out: java.io.ByteArrayOutputStream, page: Page,
      bigEndian: Boolean): (Long, Int) = {
    val Page(width, height, pixels, photometric, palette, comp,
      predictor, rowsPerStrip, tileSize, orientation, bits, t4TwoD,
      fillOrder2, planar2, yccSub) = page
    val ccitt = comp == 2 || comp == 3 || comp == 4
    require(!fillOrder2 || (bits == 1 && (ccitt || comp == 1)),
      "fillOrder2 is a 1-bit CCITT/uncompressed knob")
    require(comp == 1 || comp == 5 || comp == 8 || comp == 32773 ||
      (ccitt && bits == 1) || comp == 7, s"compression $comp")
    require(photometric >= 0 && photometric <= 3 || photometric == 5 ||
      photometric == 6, s"photometric $photometric")
    require(photometric != 5 || bits == 8, "CMYK pages are 8-bit")
    require(comp != 7 || (bits == 8 &&
      (photometric == 1 || photometric == 6)),
      "JPEG pages are 8-bit gray/YCbCr")
    // photometric 6 pages: inside JPEG the transform lives in the
    // stream; outside it (native YCbCr) the writer emits subsampled
    // data units per TIFF 6.0 section 21
    val yccNative = photometric == 6 && comp != 7
    require(!yccNative || (comp == 1 || comp == 5 || comp == 8 ||
      comp == 32773), "native YCbCr needs a byte-oriented compression")
    require(!yccNative || (bits == 8 && predictor == 1),
      "native YCbCr pages are 8-bit, no predictor")
    require(!(yccNative && planar2) || tileSize == 0,
      "tiled planar native YCbCr unsupported (strips only)")
    val (subH, subV) = yccSub
    require(!yccNative || ((subH == 1 || subH == 2) &&
      (subV == 1 || subV == 2)), s"YCbCr subsampling ${subH}x$subV")
    require(bits == 8 || bits == 16 || bits == 1, s"bits $bits")
    require(bits == 8 || photometric != 3, "palette is 8-bit only")
    require(bits != 1 || (photometric <= 1 && predictor == 1 &&
      tileSize == 0), "1-bit pages are untiled grayscale, no predictor")
    require(pixels.length == width * height, "pixel count")
    require(predictor == 1 || comp == 5 || comp == 8,
      "predictor 2 rides only LZW/Deflate (the ecosystem's predictor " +
        "stage; PackBits readers ignore tag 317)")
    require(tileSize == 0 || tileSize % 16 == 0, "tile size multiple of 16")
    require(orientation >= 1 && orientation <= 8, "orientation")
    val spp =
      if (photometric == 2 || photometric == 6) 3
      else if (photometric == 5) 4 else 1
    require(!planar2 || (spp > 1 && comp != 7),
      "planar2 needs a multi-sample non-JPEG photometric")
    val bps = bits / 8
    val spb = spp * bps
    // raw sample plane, top-left row-major
    val raw = new Array[Byte](width * height * spb)
    def put(sampleIdx: Int, value8: Int): Unit =
      if (bps == 1) raw(sampleIdx) = value8.toByte
      else {
        val v = if (photometric == 0) 65535 - (255 - value8) * 257
          else value8 * 257
        val o = sampleIdx * 2
        if (bigEndian) { raw(o) = (v >> 8).toByte; raw(o + 1) = v.toByte }
        else { raw(o) = v.toByte; raw(o + 1) = (v >> 8).toByte }
      }
    var k = 0
    while (bits != 1 && comp != 7 && !yccNative && k < width * height) {
      photometric match {
        case 0 => put(k, 255 - (pixels(k) & 0xff))
        case 1 => put(k, pixels(k) & 0xff)
        case 2 =>
          put(3 * k, (pixels(k) >> 16) & 0xff)
          put(3 * k + 1, (pixels(k) >> 8) & 0xff)
          put(3 * k + 2, pixels(k) & 0xff)
        case 5 =>
          // K = 0 makes the multiplicative face conversion exactly
          // invertible; nonzero-K decode is pinned by hand fixture
          put(4 * k, 255 - ((pixels(k) >> 16) & 0xff))
          put(4 * k + 1, 255 - ((pixels(k) >> 8) & 0xff))
          put(4 * k + 2, 255 - (pixels(k) & 0xff))
          put(4 * k + 3, 0)
        case _ =>
          require(palette != null && pixels(k) >= 0 && pixels(k) < 256 &&
            pixels(k) < palette.length, s"palette index ${pixels(k)}")
          raw(k) = pixels(k).toByte
      }
      k += 1
    }
    def diff(seg: Array[Byte], segW: Int, segH: Int,
        chans: Int = spp): Array[Byte] =
      if (predictor == 1) seg
      else {
        val sb = chans * bps
        val d = seg.clone()
        var y = 0
        while (y < segH) {
          var x = segW - 1
          while (x >= 1) {
            var c = 0
            while (c < chans) {
              val o = ((y * segW + x) * chans + c) * bps
              if (bps == 1) d(o) = (seg(o) - seg(o - chans)).toByte
              else {
                def rd(pp: Int): Int =
                  if (bigEndian) ((seg(pp) & 0xff) << 8) | (seg(pp + 1) & 0xff)
                  else (seg(pp) & 0xff) | ((seg(pp + 1) & 0xff) << 8)
                val v = (rd(o) - rd(o - sb)) & 0xffff
                if (bigEndian) { d(o) = (v >> 8).toByte; d(o + 1) = v.toByte }
                else { d(o) = v.toByte; d(o + 1) = (v >> 8).toByte }
              }
              c += 1
            }
            x -= 1
          }
          y += 1
        }
        d
      }
    // one component's samples gathered from the interleaved plane:
    // rows×copyW of component `plane` at (rowOff, colOff), padded to
    // segW×segH (tile padding per spec §15; strips use copyW = segW)
    def gatherPlane(plane: Int, segW: Int, segH: Int, rowOff: Int,
        colOff: Int, copyW: Int, copyH: Int): Array[Byte] = {
      val seg = new Array[Byte](segW * segH * bps)
      var y = 0
      while (y < copyH) {
        var x = 0
        while (x < copyW) {
          var b = 0
          while (b < bps) {
            seg((y * segW + x) * bps + b) =
              raw((((rowOff + y) * width + colOff + x) * spp + plane) * bps + b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      seg
    }
    // segments
    def compress(d: Array[Byte], rowBytes: Int): Array[Byte] = comp match {
      case 1 => d
      case 5 => lzwEncode(d)
      case 8 => deflate(d)
      case _ => packBitsEncode(d, rowBytes)
    }
    val segs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val tiled = tileSize > 0
    val rps0 = if (tiled) 0
      else if (rowsPerStrip > 0) math.min(rowsPerStrip, height) else height
    // section 21: RowsPerStrip must be a multiple of the vertical
    // subsampling (libtiff's writer adjusts it the same way)
    val rps = if (yccNative && !tiled) ((rps0 + subV - 1) / subV) * subV
      else rps0
    if (bits == 1) {
      // bilevel plane: one SAMPLE BIT per pixel (photometric 0 stores
      // white as 0, photometric 1 stores black as 0 — the decoder's
      // exact inverse); CCITT codes the bit plane per strip, the
      // byte-oriented compressions get MSB-first packed rows
      val plane = new Array[Byte](width * height)
      var j = 0
      while (j < width * height) {
        val v = pixels(j) & 0xff
        require(v == 0 || v == 255, s"1-bit pixel value $v (need 0 or 255)")
        plane(j) = (if (photometric == 0) { if (v == 0) 1 else 0 }
          else v / 255).toByte
        j += 1
      }
      val rowBytes = (width + 7) / 8
      var s = 0
      while (s * rps < height) {
        val rows = math.min(rps, height - s * rps)
        val slice = java.util.Arrays.copyOfRange(plane,
          s * rps * width, (s * rps + rows) * width)
        def rev(seg: Array[Byte]): Array[Byte] =
          if (!fillOrder2) seg else seg.map(reverseBits)
        segs += rev(comp match {
          case 2 | 3 | 4 => CcittCodec.encode(slice, width, rows, comp, t4TwoD)
          case _ =>
            val packed = new Array[Byte](rows * rowBytes)
            var y = 0
            while (y < rows) {
              var x = 0
              while (x < width) {
                if (slice(y * width + x) == 1)
                  packed(y * rowBytes + (x >> 3)) =
                    (packed(y * rowBytes + (x >> 3)) | (0x80 >> (x & 7))).toByte
                x += 1
              }
              y += 1
            }
            compress(packed, rowBytes)
        })
        s += 1
      }
    } else if (comp == 7 && !tiled) {
      // each strip is a COMPLETE embedded JPEG stream (tables
      // included — the unabridged TTN2 shape; the abbreviated
      // JPEGTables shape is exercised by hand-split specs and the
      // JDK writer's own files). Default quant (all 8s) keeps the
      // block-constant aperture exact.
      var s = 0
      while (s * rps < height) {
        val rows = math.min(rps, height - s * rps)
        val slice = java.util.Arrays.copyOfRange(pixels,
          s * rps * width, (s * rps + rows) * width)
        segs += JpegImage.encode(width, rows, slice,
          grayscale = photometric == 1)
        s += 1
      }
    } else if (comp == 7) {
      // tiled JPEG (round 19): each tile a complete tileSize² JPEG
      // stream; edge tiles padded to FULL tile size (spec §15) by
      // edge replication — the decoder discards the overhang, and
      // replicated columns/rows of 8-aligned blocks stay inside the
      // block-constant aperture whenever width/height are multiples
      // of 8 (the graded lanes' shape)
      val tx = (width + tileSize - 1) / tileSize
      val ty = (height + tileSize - 1) / tileSize
      var t = 0
      while (t < tx * ty) {
        val ox = (t % tx) * tileSize; val oy = (t / tx) * tileSize
        val tilePx = Array.tabulate(tileSize * tileSize) { j =>
          val x = math.min(ox + j % tileSize, width - 1)
          val y = math.min(oy + j / tileSize, height - 1)
          pixels(y * width + x)
        }
        segs += JpegImage.encode(tileSize, tileSize, tilePx,
          grayscale = photometric == 1)
        t += 1
      }
    } else if (yccNative && planar2) {
      // planar native YCbCr (round 20): plane-major strips — full-
      // resolution Y rows, then each SUBSAMPLED chroma plane at
      // ceil(w/subH) x ceil(h/subV), box-averaged (exact for gray
      // content: chroma is 128 everywhere, the graded aperture)
      val yP = new Array[Int](width * height)
      val cbP = new Array[Int](width * height)
      val crP = new Array[Int](width * height)
      var j = 0
      while (j < width * height) {
        val t = JpegImage.rgbToYcc(pixels(j))
        yP(j) = t._1; cbP(j) = t._2; crP(j) = t._3
        j += 1
      }
      var s = 0
      while (s * rps < height) {
        val rows = math.min(rps, height - s * rps)
        val seg = new Array[Byte](rows * width)
        var k2 = 0
        while (k2 < rows * width) {
          seg(k2) = yP(s * rps * width + k2).toByte
          k2 += 1
        }
        segs += compress(seg, width)
        s += 1
      }
      val cw = (width + subH - 1) / subH
      for (plane <- 1 to 2) {
        val src = if (plane == 1) cbP else crP
        var s2 = 0
        while (s2 * rps < height) {
          val rows = math.min(rps, height - s2 * rps)
          val crows = (rows + subV - 1) / subV
          val seg = new Array[Byte](crows * cw)
          var cy = 0
          while (cy < crows) {
            var cx = 0
            while (cx < cw) {
              var sum = 0; var n = 0
              var dy = 0
              while (dy < subV) {
                val y0 = s2 * rps + cy * subV + dy
                var dx = 0
                while (dx < subH) {
                  val x0 = cx * subH + dx
                  if (y0 < height && x0 < width) {
                    sum += src(y0 * width + x0); n += 1
                  }
                  dx += 1
                }
                dy += 1
              }
              seg(cy * cw + cx) = math.round(sum.toDouble / n).toInt.toByte
              cx += 1
            }
            cy += 1
          }
          segs += compress(seg, cw)
          s2 += 1
        }
      }
    } else if (yccNative) {
      // native-YCbCr data units (section 21): per unit, subH x subV Y
      // samples row-major, then ONE Cb and Cr averaged over the unit
      // (exact for gray-valued pixels: chroma is 128 everywhere, the
      // graded lanes' aperture); edge units pad Y by edge replication
      val yP = new Array[Int](width * height)
      val cbP = new Array[Int](width * height)
      val crP = new Array[Int](width * height)
      var j = 0
      while (j < width * height) {
        val t = JpegImage.rgbToYcc(pixels(j))
        yP(j) = t._1; cbP(j) = t._2; crP(j) = t._3
        j += 1
      }
      def unitBytes(ox: Int, oy: Int, segW: Int, segH: Int): Array[Byte] = {
        val uX = (segW + subH - 1) / subH
        val uY = (segH + subV - 1) / subV
        val out = new Array[Byte](uX * uY * (subH * subV + 2))
        var o = 0
        var uy = 0
        while (uy < uY) {
          var ux = 0
          while (ux < uX) {
            var cbSum = 0; var crSum = 0; var n = 0
            var dy = 0
            while (dy < subV) {
              var dx = 0
              while (dx < subH) {
                val x = math.min(ox + ux * subH + dx, width - 1)
                val y = math.min(oy + uy * subV + dy, height - 1)
                out(o) = yP(y * width + x).toByte
                o += 1
                cbSum += cbP(y * width + x); crSum += crP(y * width + x)
                n += 1
                dx += 1
              }
              dy += 1
            }
            out(o) = math.round(cbSum.toDouble / n).toInt.toByte
            out(o + 1) = math.round(crSum.toDouble / n).toInt.toByte
            o += 2
            ux += 1
          }
          uy += 1
        }
        out
      }
      if (!tiled) {
        var sIdx = 0
        while (sIdx * rps < height) {
          val rows = math.min(rps, height - sIdx * rps)
          val u = unitBytes(0, sIdx * rps, width, rows)
          segs += compress(u,
            ((width + subH - 1) / subH) * (subH * subV + 2))
          sIdx += 1
        }
      } else {
        val tx = (width + tileSize - 1) / tileSize
        val ty = (height + tileSize - 1) / tileSize
        var t = 0
        while (t < tx * ty) {
          val u = unitBytes((t % tx) * tileSize, (t / tx) * tileSize,
            tileSize, tileSize)
          segs += compress(u,
            (tileSize / subH) * (subH * subV + 2))
          t += 1
        }
      }
    } else if (!tiled && planar2) {
      // plane-major strips (TIFF 6.0 §14): all of component 0's
      // strips, then component 1's, ...
      var c = 0
      while (c < spp) {
        var s = 0
        while (s * rps < height) {
          val rows = math.min(rps, height - s * rps)
          val seg = gatherPlane(c, width, rows, s * rps, 0, width, rows)
          segs += compress(diff(seg, width, rows, 1), width * bps)
          s += 1
        }
        c += 1
      }
    } else if (!tiled) {
      var s = 0
      while (s * rps < height) {
        val rows = math.min(rps, height - s * rps)
        val seg = new Array[Byte](rows * width * spb)
        System.arraycopy(raw, s * rps * width * spb, seg, 0, seg.length)
        val d = diff(seg, width, rows)
        segs += compress(d, width * spb)
        s += 1
      }
    } else if (planar2) {
      val tx = (width + tileSize - 1) / tileSize
      val ty = (height + tileSize - 1) / tileSize
      var c = 0
      while (c < spp) {
        var t = 0
        while (t < tx * ty) {
          val ox = (t % tx) * tileSize; val oy = (t / tx) * tileSize
          val seg = gatherPlane(c, tileSize, tileSize, oy, ox,
            math.min(tileSize, width - ox), math.min(tileSize, height - oy))
          segs += compress(diff(seg, tileSize, tileSize, 1), tileSize * bps)
          t += 1
        }
        c += 1
      }
    } else {
      val tx = (width + tileSize - 1) / tileSize
      val ty = (height + tileSize - 1) / tileSize
      var t = 0
      while (t < tx * ty) {
        val ox = (t % tx) * tileSize; val oy = (t / tx) * tileSize
        val seg = new Array[Byte](tileSize * tileSize * spb)
        var y = 0
        while (y < tileSize && oy + y < height) {
          val copyW = math.min(tileSize, width - ox)
          System.arraycopy(raw, ((oy + y) * width + ox) * spb,
            seg, y * tileSize * spb, copyW * spb)
          y += 1
        }
        val d = diff(seg, tileSize, tileSize)
        segs += compress(d, tileSize * spb)
        t += 1
      }
    }

    // layout within the shared stream: segment data | out-of-line
    // values | IFD (the caller wrote the file header)
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (bigEndian) {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      } else {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
    val segOffs = segs.map { s => val o = out.size(); out.write(s); o }
    if (out.size() % 2 == 1) out.write(0) // word-align values

    // out-of-line value arrays (SHORT/LONG), gathered before the IFD
    case class Entry(tag: Int, typ: Int, values: Array[Long], var off: Long = -1)
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    def add(tag: Int, typ: Int, vs: Array[Long]): Unit =
      entries += Entry(tag, typ, vs)
    add(256, 4, Array(width.toLong))
    add(257, 4, Array(height.toLong))
    add(258, 3, Array.fill(spp)(bits.toLong))
    add(259, 3, Array(comp.toLong))
    add(262, 3, Array(photometric.toLong))
    if (fillOrder2) add(266, 3, Array(2L))
    if (!tiled) add(273, 4, segOffs.map(_.toLong).toArray)
    if (orientation != 1) add(274, 3, Array(orientation.toLong))
    add(277, 3, Array(spp.toLong))
    if (!tiled) {
      add(278, 4, Array(rps.toLong))
      add(279, 4, segs.map(_.length.toLong).toArray)
    }
    if (planar2) add(284, 3, Array(2L))
    if (comp == 3) add(292, 4, Array(if (t4TwoD) 1L else 0L))
    if (predictor == 2) add(317, 3, Array(2L))
    if (photometric == 3) {
      val cm = new Array[Long](3 * 256)
      for (j <- palette.indices) {
        cm(j) = ((palette(j) >> 16) & 0xff).toLong * 257
        cm(256 + j) = ((palette(j) >> 8) & 0xff).toLong * 257
        cm(512 + j) = (palette(j) & 0xff).toLong * 257
      }
      add(320, 3, cm)
    }
    if (tiled) {
      add(322, 4, Array(tileSize.toLong))
      add(323, 4, Array(tileSize.toLong))
      add(324, 4, segOffs.map(_.toLong).toArray)
      add(325, 4, segs.map(_.length.toLong).toArray)
    }
    // YCbCr subsampling: JPEG pages are 4:4:4 (the encoder's
    // subsample=false) — without the tag readers would assume the TIFF
    // default of 2x2; native pages state their actual unit geometry
    if (photometric == 6)
      add(530, 3,
        if (yccNative) Array(subH.toLong, subV.toLong) else Array(1L, 1L))
    // ReferenceBlackWhite (RATIONAL x6): state the centered full-range
    // mapping explicitly — identity for Y, code-128 centering with a
    // 127-step range for chroma (the JPEG-equivalent coding)
    if (yccNative)
      add(532, 5, Array(0L, 1L, 255L, 1L, 128L, 1L, 255L, 1L,
        128L, 1L, 255L, 1L))
    // write out-of-line arrays, remember their offsets
    for (e <- entries) {
      val w = if (e.typ == 3) 2 else 4
      if (w * e.values.length > 4) {
        e.off = out.size()
        for (v <- e.values) if (e.typ == 3) w16(v.toInt) else w32(v)
      }
    }
    // the IFD itself (entries are added in ascending tag order above)
    val ifdOff = out.size()
    w16(entries.length)
    for (e <- entries) {
      w16(e.tag); w16(e.typ)
      // RATIONAL values store as num/den Long pairs: count is in PAIRS
      w32(if (e.typ == 5) e.values.length / 2L else e.values.length.toLong)
      val w = if (e.typ == 3) 2 else 4
      if (w * e.values.length > 4) w32(e.off)
      else {
        // inline: value field is ITSELF a byte area — fill left to right
        val before = out.size()
        for (v <- e.values) if (e.typ == 3) w16(v.toInt) else w32(v)
        var pad = 4 - (out.size() - before)
        while (pad > 0) { out.write(0); pad -= 1 }
      }
    }
    val nextPtrPos = out.size()
    w32(0) // next-IFD pointer: 0 = last page; caller patches the chain
    (ifdOff.toLong, nextPtrPos)
  }
}
