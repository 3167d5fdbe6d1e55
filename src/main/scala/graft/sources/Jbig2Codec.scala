package graft.sources

/** Pure-JVM JBIG2 codec for the profile scanned PDFs actually emit —
  * the LAST undecodable image class in the reference's own 51-PDF
  * corpus (round-19 probe: all 100 embedded JBIG2 streams are
  * page-info + ONE immediate generic region, arithmetic-coded,
  * template 0, TPGDON off). Implemented from the public ITU-T T.88
  * spec:
  *
  *  - MQ arithmetic coder (Annex E, software conventions) — decoder
  *    AND encoder, with the 47-state Qe table transcribed from
  *    Table E.1;
  *  - generic region decoding (§6.2.5.7, GBTEMPLATE 0) with a SORTED
  *    16-pixel context template so non-nominal AT pixel positions
  *    work unchanged;
  *  - embedded-organization segment headers (§7.2) as PDF carries
  *    them (no file header), page information (§7.4.8) and immediate
  *    generic region (§7.4.6) segments.
  *
  * Beyond the corpus profile, GBTEMPLATE 1-3 and TPGDON (typical
  * prediction — the long-blank-run shortcut scanner encoders lean on)
  * are supported with encoder mirrors. Scope (named rejects for the
  * rest): MMR generic coding, symbol/text/halftone/refinement
  * segments, unknown data length. The encoder half writes the same
  * minimal profile and is the generator for round-trip specs, fuzz
  * and the q176 arm — decode correctness is additionally pinned on
  * the real corpus (scanned pages must come out majority-white with
  * the spec's 1-equals-black convention).
  *
  * Decoded output: one byte per pixel, 1 = black, 0 = white (the
  * CCITT plane convention, so PDF-side sample mapping is shared).
  */
object Jbig2Codec {

  // ------------------------------------------------- MQ coder tables

  /** Table E.1: (Qe, NMPS, NLPS, SWITCH). */
  private val QeTab: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // --------------------------------------------------- MQ decoder

  /** T.88 Annex E.3 software-conventions decoder over a context-state
    * array (`icx`/`mpscx` indexed by context label). */
  private final class MqDecoder(data: Array[Byte], off: Int, len: Int,
      nCtx: Int) {
    private val end = off + len
    private var bp = off
    private var c = 0L
    private var a = 0L
    private var ct = 0
    private val icx = new Array[Int](nCtx)
    private val mpscx = new Array[Byte](nCtx)

    private def b(at: Int): Int = if (at < end) data(at) & 0xff else 0xff

    // INITDEC (E.3.5)
    c = (b(bp).toLong << 16)
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000L

    private def byteIn(): Unit = {
      if (b(bp) == 0xff) {
        if (b(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 }
        else { bp += 1; c += b(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += b(bp).toLong << 8; ct = 8 }
    }

    def decode(cx: Int): Int = {
      val i = icx(cx)
      val qe = QeTab(i).toLong
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffffL) < qe) {
        // LPS exchange path
        if (a < qe) { d = mpscx(cx); icx(cx) = Nmps(i) }
        else {
          d = 1 - mpscx(cx)
          if (Switch(i) == 1) mpscx(cx) = (1 - mpscx(cx)).toByte
          icx(cx) = Nlps(i)
        }
        a = qe
        renorm()
      } else {
        c -= qe << 16
        if ((a & 0x8000L) == 0) {
          if (a < qe) {
            d = 1 - mpscx(cx)
            if (Switch(i) == 1) mpscx(cx) = (1 - mpscx(cx)).toByte
            icx(cx) = Nlps(i)
          } else { d = mpscx(cx); icx(cx) = Nmps(i) }
          renorm()
        } else d = mpscx(cx)
      }
      d
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) byteIn()
        a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
        go = (a & 0x8000L) == 0
      }
    }
  }

  // --------------------------------------------------- MQ encoder

  /** T.88 Annex E.2 encoder — the decoder's generator mirror. */
  private final class MqEncoder(nCtx: Int) {
    private val out = new java.io.ByteArrayOutputStream()
    private var a = 0x8000L
    private var c = 0L
    private var ct = 12
    private var bVal = -1 // the byte pending in B (-1 = none yet)
    private val icx = new Array[Int](nCtx)
    private val mpscx = new Array[Byte](nCtx)

    def encode(cx: Int, d: Int): Unit = {
      val i = icx(cx)
      val qe = QeTab(i).toLong
      if (d == mpscx(cx)) { // CODEMPS
        a -= qe
        if ((a & 0x8000L) == 0) {
          if (a < qe) a = qe else c += qe
          icx(cx) = Nmps(i)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i) == 1) mpscx(cx) = (1 - mpscx(cx)).toByte
        icx(cx) = Nlps(i)
        renorm()
      }
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) byteOut()
        a <<= 1; c <<= 1; ct -= 1
        go = (a & 0x8000L) == 0
      }
    }

    private def byteOut(): Unit = {
      if (bVal == 0xff) {
        out.write(bVal & 0xff) // stuffed path keeps B; emit and carry 7
        bVal = ((c >> 20) & 0xff).toInt
        c &= 0xfffffL
        ct = 7
      } else if (c < 0x8000000L) {
        if (bVal >= 0) out.write(bVal)
        bVal = ((c >> 19) & 0xff).toInt
        c &= 0x7ffffL
        ct = 8
      } else {
        bVal += 1
        if (bVal == 0xff) {
          c &= 0x7ffffffL
          if (bVal >= 0) out.write(bVal)
          bVal = ((c >> 20) & 0xff).toInt
          c &= 0xfffffL
          ct = 7
        } else {
          if (bVal >= 0) out.write(bVal)
          bVal = ((c >> 19) & 0xff).toInt
          c &= 0x7ffffL
          ct = 8
        }
      }
    }

    /** FLUSH (E.2.9): SETBITS maximizes the trailing 1-run so the
      * decoder's past-the-end 0xFF synthesis completes the interval,
      * then two byte-outs drain C; a final 0xFF is dropped (the
      * decoder manufactures 1-bits forever past the end). */
    def flush(): Array[Byte] = {
      val tempC = c + a // SETBITS
      c |= 0xffffL
      if (c >= tempC) c -= 0x8000L
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if (bVal >= 0 && bVal != 0xff) out.write(bVal)
      out.toByteArray
    }
  }

  // ------------------------------------- generic region (template 0)

  /** Nominal AT pixel positions per template (§6.2.5.3): template 0
    * has four, templates 1-3 have one. */
  private val NominalAt: Array[Array[(Int, Int)]] = Array(
    Array((3, -1), (-3, -1), (2, -2), (-2, -2)),
    Array((3, -1)), Array((2, -1)), Array((2, -1)))

  /** The fixed context pixels per GBTEMPLATE (§6.2.5.7 figures 8-11);
    * the AT pixels complete each template (16/13/10/10 total). The
    * context label is built over the template SORTED by (y, x), MSB
    * first — the ordering every conforming implementation derives from
    * the figures, and it makes non-nominal AT positions work with no
    * special cases. */
  private val FixedTemplates: Array[Array[(Int, Int)]] = Array(
    Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    Array((-1, -2), (0, -2), (1, -2), (2, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-3, 0), (-2, 0), (-1, 0)),
    Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1),
      (-2, 0), (-1, 0)),
    Array((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0)))

  /** SLTP (typical prediction) pseudo-pixel contexts per template
    * (§6.2.5.7: 0x9B25, 0x0795, 0x00E5, 0x0195). */
  private val SltpCx: Array[Int] = Array(0x9b25, 0x0795, 0x00e5, 0x0195)

  private def sortedTemplate(tmplId: Int,
      at: Array[(Int, Int)]): Array[(Int, Int)] = {
    require(tmplId >= 0 && tmplId <= 3, s"GBTEMPLATE $tmplId")
    require(at.length == NominalAt(tmplId).length,
      s"template $tmplId needs ${NominalAt(tmplId).length} AT pixels, " +
        s"got ${at.length}")
    (FixedTemplates(tmplId) ++ at).sortBy { case (x, y) => (y, x) }
  }

  /** Decode an arithmetic generic region into a 1-byte-per-pixel
    * plane (1 = black). TPGDON (§6.2.5.6): an SLTP decision per row
    * under the template's pseudo-pixel context toggles LTP; while LTP
    * holds the row copies the one above. */
  private def decodeGeneric(data: Array[Byte], off: Int, len: Int,
      w: Int, h: Int, tmplId: Int, at: Array[(Int, Int)],
      tpgdon: Boolean): Array[Byte] = {
    val tmpl = sortedTemplate(tmplId, at)
    val mq = new MqDecoder(data, off, len, 1 << 16)
    val out = new Array[Byte](w * h)
    def px(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else out(y * w + x) & 1
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon && mq.decode(SltpCx(tmplId)) == 1) ltp = !ltp
      if (ltp) {
        var x = 0
        while (x < w) { out(y * w + x) = px(x, y - 1).toByte; x += 1 }
      } else {
        var x = 0
        while (x < w) {
          var cx = 0
          var t = 0
          while (t < tmpl.length) {
            cx = (cx << 1) | px(x + tmpl(t)._1, y + tmpl(t)._2)
            t += 1
          }
          out(y * w + x) = mq.decode(cx).toByte
          x += 1
        }
      }
      y += 1
    }
    out
  }

  /** Encode a plane as an arithmetic generic region — the decoder's
    * exact mirror. Under TPGDON the encoder emits an SLTP decision per
    * row (typical = identical to the previous row) and skips typical
    * rows entirely, exactly what scanner encoders do for the long
    * blank runs of a page. */
  private def encodeGeneric(plane: Array[Byte], w: Int, h: Int,
      tmplId: Int, at: Array[(Int, Int)], tpgdon: Boolean): Array[Byte] = {
    val tmpl = sortedTemplate(tmplId, at)
    val mq = new MqEncoder(1 << 16)
    def px(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0) 0 else plane(y * w + x) & 1
    def rowTypical(y: Int): Boolean = {
      var x = 0
      while (x < w) {
        if (px(x, y) != px(x, y - 1)) return false
        x += 1
      }
      true
    }
    var ltp = false
    var y = 0
    while (y < h) {
      val typ = tpgdon && rowTypical(y)
      if (tpgdon) {
        mq.encode(SltpCx(tmplId), if (typ != ltp) 1 else 0)
        ltp = typ
      }
      if (!typ) {
        var x = 0
        while (x < w) {
          var cx = 0
          var t = 0
          while (t < tmpl.length) {
            cx = (cx << 1) | px(x + tmpl(t)._1, y + tmpl(t)._2)
            t += 1
          }
          mq.encode(cx, plane(y * w + x) & 1)
          x += 1
        }
      }
      y += 1
    }
    mq.flush()
  }

  // ------------------------------------------- embedded segments

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Decode a PDF-embedded JBIG2 stream (§7.2 embedded organization:
    * a sequence of segments, no file header) of the minimal scanned
    * profile. Returns a 1-byte-per-pixel plane (1 = black) of the
    * stated geometry. */
  def decode(data: Array[Byte], width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width.toLong * height <= (1L << 26),
      s"bad JBIG2 geometry ${width}x$height")
    var out: Array[Byte] = null
    var i = 0
    while (i < data.length) {
      require(i + 11 <= data.length, s"segment header truncated at $i")
      val segNum = u32(data, i)
      val flags = data(i + 4) & 0xff
      val segType = flags & 0x3f
      val pageAssoc4 = (flags & 0x40) != 0
      val rts = data(i + 5) & 0xff
      val nRef = (rts >> 5) & 7
      require(nRef != 7, "long referred-segment form unsupported")
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      var j = i + 6 + nRef * refSize
      j += (if (pageAssoc4) 4 else 1)
      require(j + 4 <= data.length, "segment length field truncated")
      val dataLen = u32(data, j)
      j += 4
      require(dataLen != 0xffffffffL,
        "unknown segment data length unsupported")
      require(j + dataLen <= data.length,
        s"segment $segNum data overruns stream")
      segType match {
        case 48 => () // page information: geometry comes from the dict
        case 38 | 39 => // immediate (lossless) generic region
          require(dataLen >= 18, "generic region segment too short")
          val rw = u32(data, j).toInt
          val rh = u32(data, j + 4).toInt
          val rx = u32(data, j + 8).toInt
          val ry = u32(data, j + 12).toInt
          require(rw == width && rh == height && rx == 0 && ry == 0,
            s"region ${rw}x$rh at ($rx,$ry) does not fill the " +
              s"${width}x$height page (sub-regions unsupported)")
          val gflags = data(j + 17) & 0xff
          require((gflags & 1) == 0, "MMR generic coding unsupported")
          val tmplId = (gflags >> 1) & 3
          val tpgdon = ((gflags >> 3) & 1) == 1
          val nAt = if (tmplId == 0) 4 else 1
          val at = Array.tabulate(nAt)(k =>
            (data(j + 18 + 2 * k).toInt, data(j + 19 + 2 * k).toInt))
          require(out == null, "multiple generic regions unsupported")
          val bodyOff = j + 18 + 2 * nAt
          out = decodeGeneric(data, bodyOff.toInt,
            (j + dataLen - bodyOff).toInt, width, height, tmplId, at,
            tpgdon)
        case 49 | 50 | 51 => () // end-of-page/stripe/file
        case t => throw new IllegalArgumentException(
          s"JBIG2 segment type $t unsupported (minimal scanned profile)")
      }
      i = j + dataLen.toInt
    }
    require(out != null, "JBIG2 stream carries no generic region")
    out
  }

  /** Encode a plane (1 = black) as a PDF-embeddable JBIG2 stream of
    * the same minimal profile the corpus uses: page info + one
    * immediate generic region, template 0, nominal AT. */
  def encode(plane: Array[Byte], width: Int, height: Int,
      template: Int = 0, tpgdon: Boolean = false): Array[Byte] = {
    require(plane.length == width * height, "plane size")
    val at = NominalAt(template)
    val body = encodeGeneric(plane, width, height, template, at, tpgdon)
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Long): Unit = {
      w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt)
      w8(v.toInt)
    }
    // segment 0: page information (type 48), page 1, 19-byte payload
    w32(0); w8(48); w8(0 /* no refs, 1-byte retain */)
    w8(1 /* page association */); w32(19)
    w32(width); w32(height); w32(0xffffffffL /* X res unknown */)
    w32(0xffffffffL); w8(0 /* page flags */); w8(0); w8(0) // striping off
    // segment 1: immediate generic region (type 38)
    val segLen = 18 + 2 * at.length + body.length
    w32(1); w8(38); w8(0); w8(1); w32(segLen.toLong)
    w32(width); w32(height); w32(0); w32(0); w8(0 /* external comb OR */)
    w8((template << 1) | (if (tpgdon) 8 else 0)) // arith generic flags
    at.foreach { case (x, y) => w8(x); w8(y) }
    out.write(body)
    out.toByteArray
  }
}
