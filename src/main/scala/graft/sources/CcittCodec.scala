package graft.sources

/** CCITT Group 3 / Group 4 bilevel codec (ITU-T T.4 / T.6) — the
  * dominant encoding of real scanned/faxed documents (the analogous
  * TIFF corpus to the reference's 51 scanned label PDFs is
  * overwhelmingly G4), implemented from the public ITU tables with the
  * house codec discipline: strict validation, named rejects, never
  * return garbage pixels. Consumed by [[TiffImage]]'s 1-bit path for
  * compressions 2 (Modified Huffman RLE), 3 (T.4, 1D and 2D) and
  * 4 (T.6).
  *
  * Conventions:
  *  - bit streams are MSB-first (TIFF FillOrder 1 — the only order
  *    this scope accepts);
  *  - decoded/encoded pixel planes are ONE BYTE per pixel, 0 = white,
  *    1 = black (the CCITT color model; [[TiffImage]] maps them
  *    through PhotometricInterpretation);
  *  - a line is represented by its CHANGING ELEMENTS: positions where
  *    the color differs from the previous pixel, first element always
  *    a white→black transition (ITU-T T.4 §4.2.1.3.1 / T.6 §2.2.3) —
  *    the representation both coders share;
  *  - run lengths > 2560 are coded as repeated 2560 makeup codes
  *    (T.4 table 4 note: runs longer than the largest makeup use
  *    consecutive makeups), accepted symmetrically by the decoder.
  *
  * The Huffman tables are transcribed from ITU-T T.4 tables 2/3/4
  * (terminating + makeup + shared extended makeup codes) and pinned
  * two ways: hand fixtures in TiffImageSpec AND cross-decoder parity
  * against the JDK's ImageIO TIFF plugin in both directions on
  * high-entropy payloads (the TIFF-LZW lesson: only cross-decoder
  * evidence catches a self-consistent-but-wrong pair).
  */
object CcittCodec {

  // ---------------------------------------------------------- tables

  // "run:bitstring" — ITU-T T.4 table 2 (white terminating + makeup)
  private val whiteCodes =
    """0:00110101 1:000111 2:0111 3:1000 4:1011 5:1100 6:1110 7:1111
      |8:10011 9:10100 10:00111 11:01000 12:001000 13:000011 14:110100
      |15:110101 16:101010 17:101011 18:0100111 19:0001100 20:0001000
      |21:0010111 22:0000011 23:0000100 24:0101000 25:0101011 26:0010011
      |27:0100100 28:0011000 29:00000010 30:00000011 31:00011010
      |32:00011011 33:00010010 34:00010011 35:00010100 36:00010101
      |37:00010110 38:00010111 39:00101000 40:00101001 41:00101010
      |42:00101011 43:00101100 44:00101101 45:00000100 46:00000101
      |47:00001010 48:00001011 49:01010010 50:01010011 51:01010100
      |52:01010101 53:00100100 54:00100101 55:01011000 56:01011001
      |57:01011010 58:01011011 59:01001010 60:01001011 61:00110010
      |62:00110011 63:00110100
      |64:11011 128:10010 192:010111 256:0110111 320:00110110
      |384:00110111 448:01100100 512:01100101 576:01101000 640:01100111
      |704:011001100 768:011001101 832:011010010 896:011010011
      |960:011010100 1024:011010101 1088:011010110 1152:011010111
      |1216:011011000 1280:011011001 1344:011011010 1408:011011011
      |1472:010011000 1536:010011001 1600:010011010 1664:011000
      |1728:010011011""".stripMargin

  // ITU-T T.4 table 3 (black terminating + makeup)
  private val blackCodes =
    """0:0000110111 1:010 2:11 3:10 4:011 5:0011 6:0010 7:00011
      |8:000101 9:000100 10:0000100 11:0000101 12:0000111 13:00000100
      |14:00000111 15:000011000 16:0000010111 17:0000011000
      |18:0000001000 19:00001100111 20:00001101000 21:00001101100
      |22:00000110111 23:00000101000 24:00000010111 25:00000011000
      |26:000011001010 27:000011001011 28:000011001100 29:000011001101
      |30:000001101000 31:000001101001 32:000001101010 33:000001101011
      |34:000011010010 35:000011010011 36:000011010100 37:000011010101
      |38:000011010110 39:000011010111 40:000001101100 41:000001101101
      |42:000011011010 43:000011011011 44:000001010100 45:000001010101
      |46:000001010110 47:000001010111 48:000001100100 49:000001100101
      |50:000001010010 51:000001010011 52:000000100100 53:000000110111
      |54:000000111000 55:000000100111 56:000000101000 57:000001011000
      |58:000001011001 59:000000101011 60:000000101100 61:000001011010
      |62:000001100110 63:000001100111
      |64:0000001111 128:000011001000 192:000011001001 256:000001011011
      |320:000000110011 384:000000110100 448:000000110101
      |512:0000001101100 576:0000001101101 640:0000001001010
      |704:0000001001011 768:0000001001100 832:0000001001101
      |896:0000001110010 960:0000001110011 1024:0000001110100
      |1088:0000001110101 1152:0000001110110 1216:0000001110111
      |1280:0000001010010 1344:0000001010011 1408:0000001010100
      |1472:0000001010101 1536:0000001011010 1600:0000001011011
      |1664:0000001100100 1728:0000001100101""".stripMargin

  // ITU-T T.4 table 4: extended makeups 1792–2560 — shared by both
  // colors
  private val sharedCodes =
    """1792:00000001000 1856:00000001100 1920:00000001101
      |1984:000000010010 2048:000000010011 2112:000000010100
      |2176:000000010101 2240:000000010110 2304:000000010111
      |2368:000000011100 2432:000000011101 2496:000000011110
      |2560:000000011111""".stripMargin

  private def parseTable(src: String): Seq[(Int, String)] =
    src.split("\\s+").toSeq.filter(_.nonEmpty).map { tok =>
      val Array(run, bits) = tok.split(":")
      (run.toInt, bits)
    }

  // decode maps: (len << 16) | code -> run length
  private def decodeMap(codes: Seq[(Int, String)]): Map[Int, Int] =
    codes.map { case (run, bits) =>
      ((bits.length << 16) | Integer.parseInt(bits, 2), run)
    }.toMap

  private val whiteTable = parseTable(whiteCodes) ++ parseTable(sharedCodes)
  private val blackTable = parseTable(blackCodes) ++ parseTable(sharedCodes)
  private val whiteDecode = decodeMap(whiteTable)
  private val blackDecode = decodeMap(blackTable)
  // encode maps: run -> bitstring (terminating 0–63 + makeups)
  private val whiteEncode = whiteTable.toMap
  private val blackEncode = blackTable.toMap
  private val makeups: Array[Int] = // descending, for greedy makeup emit
    (whiteTable.map(_._1).filter(_ >= 64).sorted.reverse).toArray

  private val maxCodeLen = 13

  // row-position trace for cross-decoder desync probes (the r17 LZW
  // method: decode both streams with one reader, diff code-by-code)
  private val trace = sys.env.contains("GRAFT_CCITT_TRACE")

  // ------------------------------------------------------- bit reader

  private final class Reader(bytes: Array[Byte], off: Int, len: Int) {
    var pos = 0L // bit position
    val end: Long = len.toLong * 8
    def bitsLeft: Long = end - pos
    def peek(n: Int): Int = { // zero-padded past end (callers check pos)
      var v = 0
      var i = 0
      while (i < n) {
        val b = pos + i
        v = (v << 1) | (if (b < end)
          (bytes(off + (b >> 3).toInt) >> (7 - (b & 7).toInt)) & 1 else 0)
        i += 1
      }
      v
    }
    def bit(): Int = {
      require(pos < end, "CCITT stream ends mid-code")
      val v = (bytes(off + (pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      v
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
  }

  /** One color run: zero or more makeup codes (≥ 64) followed by a
    * terminating code (< 64) — T.4 §4.2.1.2; runs > 2560 arrive as
    * consecutive makeups. */
  private def readRun(r: Reader, white: Boolean): Int = {
    val table = if (white) whiteDecode else blackDecode
    def code(): Int = {
      var acc = 0
      var len = 0
      var run = -1
      while (run < 0) {
        require(len < maxCodeLen, s"invalid CCITT ${if (white) "white"
          else "black"} code (no match in $maxCodeLen bits)")
        acc = (acc << 1) | r.bit()
        len += 1
        run = table.getOrElse((len << 16) | acc, -1)
      }
      run
    }
    var total = 0
    var run = code()
    while (run >= 64) { total += run; run = code() }
    total + run
  }

  // EOL = 000000000001; fill bits (zeros) may precede it
  private def expectEol(r: Reader): Unit = {
    var zeros = 0
    var b = r.bit()
    while (b == 0) { zeros += 1; require(zeros <= 64, "runaway EOL fill"); b = r.bit() }
    require(zeros >= 11, s"bad EOL (only $zeros zero bits before the 1)")
  }

  private def tryEol(r: Reader): Boolean = {
    // non-consuming probe for an EOL (fill zeros then 000000000001):
    // the position is restored on BOTH outcomes — the caller consumes
    // via expectEol (the first cut returned true with the EOL already
    // eaten, so the follow-up expectEol read the next bit as a failed
    // EOL — caught by the JDK T.4 RTC)
    val save = r.pos
    var zeros = 0
    var result = false
    var done = false
    while (!done) {
      if (r.bitsLeft == 0 || zeros > 64) done = true
      else if (r.bit() == 1) { result = zeros >= 11; done = true }
      else zeros += 1
    }
    r.pos = save
    result
  }

  // ----------------------------------------------------------- decode

  /** Decode `rows`×`width` pixels from a CCITT segment.
    * `scheme`: 2 = Modified Huffman (each row independent,
    * byte-aligned), 3 = T.4 (EOL-framed; 2D when `t4TwoD`),
    * 4 = T.6 (pure 2D, optional EOFB).
    * @return one byte per pixel, 0 = white, 1 = black. */
  def decode(bytes: Array[Byte], off: Int, len: Int, width: Int,
      rows: Int, scheme: Int, t4TwoD: Boolean = false,
      lenientTail: Boolean = false): Array[Byte] = {
    require(width > 0 && rows > 0, s"bad geometry ${width}x$rows")
    val r = new Reader(bytes, off, len)
    val out = new Array[Byte](width * rows)
    // reference line as changing elements; initial imaginary line is
    // all white (no changes)
    var ref = Array.empty[Int]
    var y = 0
    while (y < rows) {
      val changes: Array[Int] = scheme match {
        case 2 =>
          r.alignByte()
          decode1d(r, width)
        case 3 =>
          expectEol(r)
          if (!t4TwoD) decode1d(r, width)
          else if (r.bit() == 1) decode1d(r, width) // tag bit: 1 = 1D
          else decode2d(r, ref, width)
        case 4 => decode2d(r, ref, width)
        case s => throw new IllegalArgumentException(s"CCITT scheme $s")
      }
      if (trace)
        println(s"row $y: pos=${r.pos} changes=${changes.mkString(",")}")
      // render the line: alternate colors from white at each change
      var x = 0
      var ci = 0
      while (x < width) {
        val nextChange = if (ci < changes.length) changes(ci) else width
        val color = (ci & 1).toByte // even # of changes passed = white
        while (x < nextChange) { out(y * width + x) = color; x += 1 }
        ci += 1
      }
      ref = changes
      y += 1
    }
    // trailing content: T.6 allows an optional EOFB (EOL EOL); T.4 an
    // optional RTC (6 EOLs); MH pads the last byte. Anything else past
    // the last row is a named reject (strict posture) — EXCEPT under
    // `lenientTail`, the PDF CCITTFaxDecode posture: /Rows states the
    // exact geometry, real scanner encoders pad the segment tail with
    // arbitrary fill (the round-19 corpus probe measured it), and the
    // spec's EncodedByteAlign/EOL machinery doesn't govern what
    // follows the last row. TIFF callers stay strict.
    if (lenientTail) return out
    if (scheme == 4 || scheme == 3) {
      var eols = 0
      while (tryEol(r)) {
        expectEol(r)
        // RTC EOLs in a 2D T.4 stream each carry the 1D tag bit
        if (scheme == 3 && t4TwoD) require(r.bit() == 1,
          "RTC EOL in a 2D stream missing its 1D tag bit")
        eols += 1
        require(eols <= 6, "more than an RTC's worth of trailing EOLs")
      }
    }
    require(r.bitsLeft < 8 && r.peek(math.max(r.bitsLeft.toInt, 0)) == 0,
      s"CCITT segment carries ${r.bitsLeft} trailing bits past the last row")
    out
  }

  /** 1D (MH) line: alternating white-first runs to exactly `width`;
    * returns the changing-element positions. */
  private def decode1d(r: Reader, width: Int): Array[Int] = {
    val changes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var x = 0
    var white = true
    while (x < width) {
      val run = readRun(r, white)
      x += run
      require(x <= width, s"CCITT run overruns row ($x > $width)")
      changes += x
      white = !white
    }
    // changes at exactly `width` carry no pixels and no information
    // for a following 2D line's b1/b2 search (a not-found element
    // defaults to width with the same parity-independent effect) —
    // strip them so the representation is canonical
    while (changes.nonEmpty && changes.last == width)
      changes.remove(changes.length - 1)
    changes.toArray
  }

  /** 2D line (T.4 2D / T.6 vertical/horizontal/pass modes) against the
    * reference line's changing elements. */
  private def decode2d(r: Reader, ref: Array[Int], width: Int): Array[Int] = {
    val changes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var a0 = -1 // imaginary white pixel before the line
    var white = true
    while (a0 < width) {
      // b1: first ref change > a0 whose color is opposite to the
      // current color. Ref changes alternate starting white→black
      // (even index = transition to black); when coding white the next
      // transition of interest is to black (even index), else odd.
      var bi = 0
      while (bi < ref.length &&
        (ref(bi) <= a0 || (bi & 1) != (if (white) 0 else 1))) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else width
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else width
      // mode code
      if (r.bit() == 1) { // V0
        require(b1 <= width, "V0 past row end")
        changes += b1
        a0 = b1; white = !white
      } else if (r.bit() == 1) { // 01x: VL1 (010) / VR1 (011)
        val a1 = if (r.bit() == 1) b1 + 1 else b1 - 1
        require(a1 >= 0 && a1 <= width, s"V1 position $a1 out of row")
        changes += a1
        a0 = a1; white = !white
      } else if (r.bit() == 1) { // 001: horizontal
        val base = if (a0 < 0) 0 else a0
        val r1 = readRun(r, white)
        val r2 = readRun(r, !white)
        val a1 = base + r1
        val a2 = a1 + r2
        require(a2 <= width, s"H runs overrun row ($a2 > $width)")
        changes += a1 += a2
        a0 = a2 // color unchanged
      } else if (r.bit() == 1) { // 0001: pass
        require(b2 <= width, "pass past row end")
        a0 = b2 // color unchanged, no new change recorded
      } else { // 00001x / 000001x: VR2/VL2/VR3/VL3 (or extension = reject)
        val second = r.bit()
        if (second == 1) { // 00001x
          val a1 = if (r.bit() == 1) b1 + 2 else b1 - 2
          require(a1 >= 0 && a1 <= width, s"V2 position $a1 out of row")
          changes += a1
          a0 = a1; white = !white
        } else { // 000001x (V3) or 0000001... (extension)
          require(r.bit() == 1,
            "CCITT 2D extension code (0000001xxx) unsupported")
          val a1 = if (r.bit() == 1) b1 + 3 else b1 - 3
          require(a1 >= 0 && a1 <= width, s"V3 position $a1 out of row")
          changes += a1
          a0 = a1; white = !white
        }
      }
      require(changes.isEmpty || changes.length < 2 ||
        changes(changes.length - 1) >= changes(changes.length - 2),
        "CCITT 2D changing elements not monotonic")
    }
    require(a0 == width || changes.lastOption.contains(width),
      s"2D line decoded past the row ($a0 > $width)")
    // canonicalize like decode1d: width-positioned changes are inert
    while (changes.nonEmpty && changes.last == width)
      changes.remove(changes.length - 1)
    changes.toArray
  }

  // ----------------------------------------------------------- encode

  private def emitRun(bits: BitWriter, run0: Int, white: Boolean): Unit = {
    var run = run0
    val enc = if (white) whiteEncode else blackEncode
    while (run >= 64) {
      var mi = 0
      while (makeups(mi) > run) mi += 1
      val m = makeups(mi)
      bits.write(enc(m))
      run -= m
    }
    bits.write(enc(run))
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def write(bitstr: String): Unit = {
      var i = 0
      while (i < bitstr.length) {
        acc = (acc << 1) | (if (bitstr.charAt(i) == '1') 1 else 0)
        n += 1
        if (n == 8) { out.write(acc.toInt & 0xff); acc = 0; n = 0 }
        i += 1
      }
    }
    def alignByte(): Unit = if (n > 0) { out.write((acc << (8 - n)).toInt & 0xff); acc = 0; n = 0 }
    def result(): Array[Byte] = { alignByte(); out.toByteArray }
  }

  /** Changing elements of a 0/1 pixel line. */
  private def changesOf(px: Array[Byte], rowOff: Int, width: Int): Array[Int] = {
    val c = scala.collection.mutable.ArrayBuffer.empty[Int]
    var prev: Byte = 0
    var x = 0
    while (x < width) {
      val v = px(rowOff + x)
      require(v == 0 || v == 1, s"pixel value $v (CCITT input must be 0/1)")
      if (v != prev) { c += x; prev = v }
      x += 1
    }
    c.toArray
  }

  private def encode1d(bits: BitWriter, changes: Array[Int], width: Int): Unit = {
    var x = 0
    var white = true
    var ci = 0
    var done = false
    while (!done) {
      val next = if (ci < changes.length) changes(ci) else width
      emitRun(bits, next - x, white)
      x = next
      white = !white
      ci += 1
      done = x >= width
    }
  }

  private def encode2d(bits: BitWriter, cur: Array[Int], ref: Array[Int],
      width: Int): Unit = {
    var a0 = -1
    var white = true
    while (a0 < width) {
      var bi = 0
      while (bi < ref.length &&
        (ref(bi) <= a0 || (bi & 1) != (if (white) 0 else 1))) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else width
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else width
      var ai = 0
      while (ai < cur.length && cur(ai) <= a0) ai += 1
      val a1 = if (ai < cur.length) cur(ai) else width
      if (b2 < a1) { // pass
        bits.write("0001")
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) { // vertical
        (a1 - b1) match {
          case 0 => bits.write("1")
          case 1 => bits.write("011")
          case 2 => bits.write("000011")
          case 3 => bits.write("0000011")
          case -1 => bits.write("010")
          case -2 => bits.write("000010")
          case _ => bits.write("0000010")
        }
        a0 = a1; white = !white
      } else { // horizontal
        val a2 = if (ai + 1 < cur.length) cur(ai + 1) else width
        bits.write("001")
        val base = if (a0 < 0) 0 else a0
        emitRun(bits, a1 - base, white)
        emitRun(bits, a2 - a1, !white)
        a0 = a2
      }
    }
  }

  /** Encode `rows`×`width` pixels (one byte each, 0 = white,
    * 1 = black). Scheme as in [[decode]]; T.6 output ends with EOFB,
    * T.4 rows are EOL-framed (2D rows carry the tag bit). */
  def encode(px: Array[Byte], width: Int, rows: Int, scheme: Int,
      t4TwoD: Boolean = false): Array[Byte] = {
    require(px.length == width * rows, "pixel count")
    val bits = new BitWriter
    var ref = Array.empty[Int]
    var y = 0
    while (y < rows) {
      val cur = changesOf(px, y * width, width)
      scheme match {
        case 2 =>
          bits.alignByte()
          encode1d(bits, cur, width)
        case 3 =>
          bits.write("000000000001") // EOL
          if (t4TwoD) {
            // T.4 §4.2.1: the first line after a 1D tag must be 1D —
            // a 2D line needs a real reference line (the imaginary
            // all-white line is a T.6 concept; the JDK decoder rejects
            // a 2D first line with "No reference line present")
            if (y == 0) { bits.write("1"); encode1d(bits, cur, width) }
            else { bits.write("0"); encode2d(bits, cur, ref, width) }
          } else encode1d(bits, cur, width)
        case 4 => encode2d(bits, cur, ref, width)
        case s => throw new IllegalArgumentException(s"CCITT scheme $s")
      }
      ref = cur
      y += 1
    }
    if (scheme == 4) { bits.write("000000000001"); bits.write("000000000001") } // EOFB
    bits.result()
  }
}
