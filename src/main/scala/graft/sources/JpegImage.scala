package graft.sources

/** Pure-JVM baseline JPEG codec (ITU-T T.81 / ISO 10918-1: baseline
  * sequential DCT, SOF0) — the most common real-corpus image format,
  * and the third compression family in the codec ladder after zlib
  * (PNG) and LZW (GIF): Huffman-coded DCT coefficients. Same strict
  * discipline as the other codecs: implement the PUBLIC spec
  * byte-by-byte, validate loudly, never emit garbage pixels.
  *
  * Scope (documented, not hidden): baseline sequential (SOF0/SOF1)
  * AND progressive (SOF2, round 16 — spectral selection + successive
  * approximation, the single most common real-corpus layout a
  * baseline-only decoder quarantines); arithmetic coding,
  * hierarchical and lossless modes reject with named errors; 8-bit
  * precision; 1 component (grayscale) or 3 components (YCbCr) at
  * 4:4:4, 4:2:0 or 4:2:2 (round 20 — the common camera/scanner
  * 2x1 factor; other sampling grids reject by name).
  * Subsampled chroma upsamples by REPLICATION — T.81 leaves the filter
  * implementation-defined, so the choice is documented rather than
  * hidden, and the exactness aperture below sidesteps it entirely
  * (constant chroma upsamples identically under any filter); restart
  * markers (DRI/RSTn) supported; APPn/COM segments length-validated
  * and skipped. The entropy layer is strict: Huffman codes must
  * resolve within 16 bits, coefficient runs must not overflow the
  * block, every MCU must decode, padding bits must be 1s, EOI must
  * follow, nothing may trail it.
  *
  * JPEG is lossy BY DESIGN, so exactness is engineered where the
  * format allows it: a block-constant image encoded with DC quant 8
  * survives the full pipeline EXACTLY (DCT of a constant block is
  * DC-only; 8c/8 = c), which is what the oracle-gated query rides on;
  * general content is validated against the JDK's own libjpeg-based
  * codec within the IDCT tolerance the standard itself allows.
  *
  * Reference semantics: the reference treats media as opaque binary
  * and delegates decode to external services (sanctioned stub
  * boundary); this closes the decode half for the dominant compressed
  * photo container.
  */
object JpegImage {

  /** Decoded image: 0xAARRGGBB face (alpha 0xff; grayscale decodes
    * with R = G = B) — [[PngImage.Png]]/[[GifImage.Gif]] parity. */
  final case class Jpeg(width: Int, height: Int, channels: Int,
      pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x) & 0xffffff
  }

  /** Rec.601 full-range YCbCr codes → 0xRRGGBB (T.871's matrix and
    * rounding) — ONE copy, shared by the JPEG color path and the
    * native-YCbCr TIFF arm (TIFF 6.0 §21 defaults to the same CCIR 601
    * coefficients with centered full-range chroma). */
  private[sources] def yccToRgb(yv: Int, cb0: Int, cr0: Int): Int = {
    val cb = cb0 - 128; val cr = cr0 - 128
    def c8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    val r = c8(math.round(yv + 1.402 * cr).toInt)
    val g = c8(math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt)
    val b = c8(math.round(yv + 1.772 * cb).toInt)
    (r << 16) | (g << 8) | b
  }

  /** RGB → Rec.601 full-range YCbCr codes — [[yccToRgb]]'s generator
    * half (T.871 forward matrix), shared with the native-YCbCr TIFF
    * encoder. Gray-valued input (R = G = B = c) maps to (c, 128, 128)
    * exactly, the aperture the graded lanes ride. */
  private[sources] def rgbToYcc(px: Int): (Int, Int, Int) = {
    val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
    def c8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    (c8(math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt),
      c8(math.round(-0.168736 * r - 0.331264 * g + 0.5 * b).toInt + 128),
      c8(math.round(0.5 * r - 0.418688 * g - 0.081312 * b).toInt + 128))
  }

  /** Zigzag scan order (T.81 Figure 5), generated from the diagonal
    * rule rather than transcribed: position k in the scan maps to
    * block index Zigzag(k) = row·8 + col. */
  private val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    for (s <- 0 to 14) {
      val rs = if (s % 2 == 1) 0 to s else s to 0 by -1
      for (r <- rs) {
        val c = s - r
        if (r <= 7 && c <= 7) { out(k) = r * 8 + c; k += 1 }
      }
    }
    require(k == 64 && out.distinct.length == 64, "zigzag generation")
    out
  }

  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ------------------------------------------------------------ tables

  /** Canonical Huffman table: BITS (count of codes per length 1..16)
    * + symbol values in code order — exactly the DHT wire form. */
  private final case class HuffSpec(bits: Array[Int], vals: Array[Int])

  // encoder-side fixed tables: flat canonical codes (valid prefix
  // codes by construction, never the all-ones code since the symbol
  // count is strictly below the capacity of the length)
  private val DcSpec: HuffSpec = {
    val bits = new Array[Int](17); bits(4) = 12
    HuffSpec(bits, (0 to 11).toArray)
  }
  private val AcSpec: HuffSpec = {
    val bits = new Array[Int](17); bits(8) = 162
    val vals = Array(0x00, 0xf0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)
    HuffSpec(bits, vals.toArray)
  }
  /** Progressive AC table: the baseline symbols plus the EOBn run
    * symbols (r<<4 for r = 0..14, T.81 G.1.2.2) progressive AC scans
    * need for end-of-band runs. 176 symbols, all length 8 — a valid
    * canonical prefix code (strictly below the 255-code capacity, so
    * the all-ones code is never assigned). */
  private val AcSpecProg: HuffSpec = {
    val bits = new Array[Int](17); bits(8) = 176
    val vals = (0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)
    HuffSpec(bits, vals.toArray)
  }

  /** Amplitude magnitude category (T.81 F.1.2.1.2). */
  private def sizeOf(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Entropy-layer bit writer with 0xFF byte stuffing (T.81 F.1.2.3),
    * shared by the baseline and progressive encoder halves. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var accBits = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); accBits += len
      while (accBits >= 8) {
        val b = ((acc >> (accBits - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        accBits -= 8
      }
    }
    /** Pad to a byte boundary with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (accBits > 0) {
      val pad = 8 - accBits
      putBits((1 << pad) - 1, pad)
    }
    def putSym(t: Array[Int], sym: Int): Unit = {
      val e = t(sym)
      require(e >= 0, s"symbol $sym not in table")
      putBits(e & 0xffffff, e >>> 24)
    }
    def putAmp(v: Int, size: Int): Unit =
      if (size > 0) putBits(if (v >= 0) v else v - 1 + (1 << size), size)
  }

  /** Encoder view: symbol → (code, length). */
  private def encTable(spec: HuffSpec): Array[Int] = {
    // packed as (len << 24) | code, indexed by symbol
    val out = new Array[Int](256)
    java.util.Arrays.fill(out, -1)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < spec.bits(len)) {
        out(spec.vals(k)) = (len << 24) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out
  }

  /** Decoder view (T.81 F.2.2.3): mincode/maxcode/valptr per length. */
  private final class HuffDec(spec: HuffSpec) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val vals: Array[Int] = spec.vals
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        valPtr(len) = k
        minCode(len) = code
        code += spec.bits(len); k += spec.bits(len)
        maxCode(len) = if (spec.bits(len) == 0) -1 else code - 1
        code <<= 1
      }
    }
  }

  // ------------------------------------------------------------ encode

  /** Level-shifted YCbCr (or gray) component planes on the MCU-aligned
    * grid, edge-replicated; chroma averaged 2x2 when subsampling (exact
    * for block-constant chroma). Shared by the baseline and progressive
    * encoder halves — the two modes differ only in how coefficients are
    * entropy-ordered, never in what the coefficients are.
    * @return (nComp, sampH, sampV, mcusX, mcusY, planes, planeW) */
  private def buildPlanes(width: Int, height: Int, pixels: Array[Int],
      grayscale: Boolean, subsample: Boolean, adobeYcck: Boolean = false,
      subsample422: Boolean = false):
      (Int, Array[Int], Array[Int], Int, Int,
        Array[Array[Double]], Array[Int]) = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    require(!(grayscale && (subsample || subsample422)),
      "grayscale has no chroma to subsample")
    require(!(adobeYcck && (grayscale || subsample || subsample422)),
      "adobeYcck is its own 4-component 4:4:4 mode")
    require(!(subsample && subsample422), "pick ONE subsampling grid")
    val nComp = if (adobeYcck) 4 else if (grayscale) 1 else 3
    // sampling factors per component: 4:4:4 = all 1x1; 4:2:0 = luma
    // 2x2, chroma 1x1 (per-MCU: 4 Y blocks + Cb + Cr); 4:2:2 = luma
    // 2x1, chroma 1x1 (2 Y blocks + Cb + Cr, chroma halved
    // horizontally only — the common camera/scanner factor)
    val sampH =
      if (subsample || subsample422) Array(2, 1, 1)
      else Array.fill(nComp)(1)
    val sampV = if (subsample) Array(2, 1, 1) else Array.fill(nComp)(1)
    val maxH = sampH(0); val maxV = sampV(0)
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    val alignW = mcusX * 8 * maxH; val alignH = mcusY * 8 * maxV

    // full-resolution YCbCr (or gray), level-shifted, edge-replicated
    // to the MCU-aligned grid
    val full = Array.ofDim[Double](nComp, alignW * alignH)
    var y = 0
    while (y < alignH) {
      val sy = math.min(y, height - 1)
      var x = 0
      while (x < alignW) {
        val sx = math.min(x, width - 1)
        val p = pixels(sy * width + sx)
        val o = y * alignW + x
        if (adobeYcck) {
          // YCCK at K = 0 (stored directly, the corpus-pinned
          // convention): YCC of the INVERTED CMY of gray content g is
          // (g, 128, 128) — level-shifted planes (g-128, 0, 0) — and
          // the K plane is 0 ink (level-shifted -128)
          full(0)(o) = (p & 0xff) - 128.0
          full(1)(o) = 0.0
          full(2)(o) = 0.0
          full(3)(o) = -128.0
        } else if (grayscale) full(0)(o) = (p & 0xff) - 128.0
        else {
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
          val b = p & 0xff
          full(0)(o) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          full(1)(o) = -0.168736 * r - 0.331264 * g + 0.5 * b
          full(2)(o) = 0.5 * r - 0.418688 * g - 0.081312 * b
        }
        x += 1
      }
      y += 1
    }
    // per-component planes at their own resolution (chroma box-averaged
    // by the per-axis factor — 2x2 for 4:2:0, 2x1 for 4:2:2; exact for
    // block-constant chroma)
    val planeW = Array.tabulate(nComp)(c => mcusX * 8 * sampH(c))
    val planes = Array.tabulate(nComp) { c =>
      val fx = maxH / sampH(c); val fy = maxV / sampV(c)
      if (fx == 1 && fy == 1) {
        require(planeW(c) == alignW, "full-res plane grid")
        full(c)
      } else {
        val pw = planeW(c); val ph = mcusY * 8 * sampV(c)
        val out = new Array[Double](pw * ph)
        var yy = 0
        while (yy < ph) {
          var xx = 0
          while (xx < pw) {
            var s = 0.0
            var dy = 0
            while (dy < fy) {
              var dx = 0
              while (dx < fx) {
                s += full(c)((fy * yy + dy) * alignW + fx * xx + dx)
                dx += 1
              }
              dy += 1
            }
            out(yy * pw + xx) = s / (fx * fy)
            xx += 1
          }
          yy += 1
        }
        out
      }
    }
    (nComp, sampH, sampV, mcusX, mcusY, planes, planeW)
  }

  /** Forward DCT + quantization of one 8x8 block into `coef`, zigzag
    * order (shared by both encoder halves). */
  private def fdctQuantBlock(plane: Array[Double], pw: Int, blockX: Int,
      blockY: Int, quant: Array[Int], coef: Array[Int]): Unit = {
    var k = 0
    while (k < 64) {
      val r = Zigzag(k) / 8; val col = Zigzag(k) % 8
      var s = 0.0
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          s += plane((blockY * 8 + yy) * pw + blockX * 8 + xx) *
            CosT(xx)(col) * CosT(yy)(r)
          xx += 1
        }
        yy += 1
      }
      val f = 0.25 * C(col) * C(r) * s
      coef(k) = math.round(f / quant(Zigzag(k))).toInt
      k += 1
    }
  }

  /** Encode a baseline JPEG. `pixels` are 0xRRGGBB (or gray via
    * `grayscale = true`, using each pixel's low byte). `quant` is the
    * 64-entry quantization table in NATURAL (row-major) order, used
    * for every component; entries 1..255. `restartInterval` > 0 emits
    * DRI + RSTn markers every that many MCUs. The generator half for
    * the decoder: block-constant content with quant(0) = 8 round-trips
    * exactly (see object doc). */
  def encode(width: Int, height: Int, pixels: Array[Int],
      grayscale: Boolean = false,
      quant: Array[Int] = Array.fill(64)(8),
      restartInterval: Int = 0,
      subsample: Boolean = false,
      adobeYcck: Boolean = false,
      subsample422: Boolean = false): Array[Byte] = {
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"bad restart interval $restartInterval")
    val (nComp, sampH, sampV, mcusX, mcusY, planes, planeW) =
      buildPlanes(width, height, pixels, grayscale, subsample, adobeYcck,
        subsample422)

    val dcT = encTable(DcSpec); val acT = encTable(AcSpec)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    if (adobeYcck) {
      // APP14 "Adobe", transform 2 (YCCK) — the 4-component streams
      // real scanners emit (round-19 corpus)
      marker(0xee)
      u16(2 + 12)
      "Adobe".foreach(ch => u8(ch))
      u16(100); u16(0); u16(0) // version, flags0, flags1
      u8(2) // transform: YCCK
    }
    marker(0xdb) // DQT
    u16(2 + 1 + 64)
    u8(0) // Pq=0 (8-bit), Tq=0
    for (k <- 0 until 64) u8(quant(Zigzag(k)))
    marker(0xc0) // SOF0
    u16(8 + 3 * nComp)
    u8(8); u16(height); u16(width); u8(nComp)
    for (c <- 0 until nComp) {
      u8(c + 1); u8((sampH(c) << 4) | sampV(c)); u8(0)
    }
    for ((spec, cls) <- Seq((DcSpec, 0), (AcSpec, 1))) {
      marker(0xc4) // DHT
      u16(2 + 1 + 16 + spec.vals.length)
      u8(cls << 4) // table id 0
      for (len <- 1 to 16) u8(spec.bits(len))
      spec.vals.foreach(u8)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda) // SOS
    u16(6 + 2 * nComp)
    u8(nComp)
    for (c <- 0 until nComp) { u8(c + 1); u8(0) } // DC table 0, AC table 0
    u8(0); u8(63); u8(0) // Ss, Se, AhAl (baseline fixed)

    // entropy-coded data with byte stuffing
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    def encodeBlock(c: Int, blockX: Int, blockY: Int): Unit = {
      fdctQuantBlock(planes(c), planeW(c), blockX, blockY, quant, coef)
      val diff = coef(0) - dcPred(c)
      dcPred(c) = coef(0)
      val dsz = sizeOf(diff)
      require(dsz <= 11, s"DC diff $diff out of baseline range")
      bw.putSym(dcT, dsz); bw.putAmp(diff, dsz)
      var kk = 1
      var run = 0
      while (kk < 64) {
        if (coef(kk) == 0) run += 1
        else {
          while (run >= 16) { bw.putSym(acT, 0xf0); run -= 16 }
          val asz = sizeOf(coef(kk))
          require(asz <= 10, s"AC coefficient ${coef(kk)} out of range")
          bw.putSym(acT, (run << 4) | asz); bw.putAmp(coef(kk), asz)
          run = 0
        }
        kk += 1
      }
      if (run > 0) bw.putSym(acT, 0x00) // EOB
    }
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nComp) {
          var v = 0
          while (v < sampV(c)) {
            var hh = 0
            while (hh < sampH(c)) {
              encodeBlock(c, mx * sampH(c) + hh, my * sampV(c) + v)
              hh += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // -------------------------------------------------- progressive encode

  /** One progressive scan descriptor: `comps` are 0-based component
    * indices in frame order, `ss..se` the spectral band (0,0 = DC),
    * `ah`/`al` the successive-approximation bit positions (ah = 0 is a
    * band's first pass at precision al; otherwise a refinement of bit
    * al = ah − 1). */
  final case class ProgScan(comps: Seq[Int], ss: Int, se: Int,
      ah: Int, al: Int)

  /** The standard spectral-selection + successive-approximation script
    * (the shape real progressive encoders emit): interleaved DC first
    * at Al=1, low-frequency luma band early, chroma in one band each,
    * then refinement passes down to full precision for every
    * coefficient of every component. */
  def defaultProgScans(nComp: Int): Seq[ProgScan] =
    if (nComp == 1) Seq(
      ProgScan(Seq(0), 0, 0, 0, 1),
      ProgScan(Seq(0), 1, 5, 0, 2),
      ProgScan(Seq(0), 6, 63, 0, 2),
      ProgScan(Seq(0), 1, 63, 2, 1),
      ProgScan(Seq(0), 0, 0, 1, 0),
      ProgScan(Seq(0), 1, 63, 1, 0))
    else Seq(
      ProgScan(Seq(0, 1, 2), 0, 0, 0, 1),
      ProgScan(Seq(0), 1, 5, 0, 2),
      ProgScan(Seq(2), 1, 63, 0, 1),
      ProgScan(Seq(1), 1, 63, 0, 1),
      ProgScan(Seq(0), 6, 63, 0, 2),
      ProgScan(Seq(0), 1, 63, 2, 1),
      ProgScan(Seq(0, 1, 2), 0, 0, 1, 0),
      ProgScan(Seq(2), 1, 63, 1, 0),
      ProgScan(Seq(1), 1, 63, 1, 0),
      ProgScan(Seq(0), 1, 63, 1, 0))

  /** Validate a scan script against the progression rules the decoder
    * enforces (T.81 G.1.1.1): per coefficient one first pass, then
    * refinements stepping Al down by exactly one; a component's DC
    * first pass precedes its AC scans; AC scans single-component; and
    * COMPLETENESS — every coefficient refined to Al = 0, so this
    * encoder can never synthesize a partial file. */
  private def validateScript(scans: Seq[ProgScan], nComp: Int): Unit = {
    val state = Array.fill(nComp, 64)(-1)
    for (sc <- scans) {
      require(sc.comps.nonEmpty && sc.comps.forall(c => c >= 0 && c < nComp),
        s"scan components ${sc.comps} out of range")
      require(sc.comps.distinct == sc.comps, "duplicate scan component")
      require(sc.al >= 0 && sc.al <= 13, s"Al=${sc.al} out of range")
      require(sc.ah == 0 || sc.ah == sc.al + 1,
        s"Ah=${sc.ah}/Al=${sc.al}: refinement must step one bit")
      if (sc.ss == 0) require(sc.se == 0, "DC scan must have Se=0")
      else {
        require(sc.comps.length == 1, "AC scan must be single-component")
        require(sc.ss <= sc.se && sc.se <= 63,
          s"bad band ${sc.ss}..${sc.se}")
        require(state(sc.comps.head)(0) != -1,
          "AC scan before the component's DC scan")
      }
      for (c <- sc.comps; k <- sc.ss to sc.se) {
        if (sc.ah == 0) require(state(c)(k) == -1,
          s"coefficient $k coded twice at first pass")
        else require(state(c)(k) == sc.ah,
          s"refinement Ah=${sc.ah} does not chain from ${state(c)(k)}")
        state(c)(k) = sc.al
      }
    }
    for (c <- 0 until nComp; k <- 0 until 64)
      require(state(c)(k) == 0,
        s"script leaves coefficient $k of component $c at " +
          s"Al=${state(c)(k)} (must reach 0)")
  }

  /** Encode a PROGRESSIVE JPEG (SOF2) — the generator half for the
    * progressive decoder, driven by an explicit scan script (default:
    * [[defaultProgScans]]). Same parameters and exact aperture as
    * [[encode]]: block-constant content with quant(0) = 8 survives the
    * full pipeline bit-for-bit — the DC value's low bits travel through
    * the refinement scans and the AC bands carry pure EOB runs.
    * `restartInterval` > 0 emits DRI + RSTn every that many MCUs
    * (interleaved scans) or blocks (single-component scans). */
  def encodeProgressive(width: Int, height: Int, pixels: Array[Int],
      grayscale: Boolean = false,
      quant: Array[Int] = Array.fill(64)(8),
      scans: Seq[ProgScan] = Nil,
      restartInterval: Int = 0,
      subsample: Boolean = false): Array[Byte] = {
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"bad restart interval $restartInterval")
    val (nComp, sampH, sampV, mcusX, mcusY, planes, planeW) =
      buildPlanes(width, height, pixels, grayscale, subsample)
    val script = if (scans.nonEmpty) scans else defaultProgScans(nComp)
    validateScript(script, nComp)

    // all coefficient blocks up front (interleaved-grid layout, zigzag
    // order per block): progressive scans revisit them band by band
    val blocksW = Array.tabulate(nComp)(c => mcusX * sampH(c))
    val blocksH = Array.tabulate(nComp)(c => mcusY * sampV(c))
    val coefs = Array.tabulate(nComp) { c =>
      val arr = new Array[Int](blocksW(c) * blocksH(c) * 64)
      val tmp = new Array[Int](64)
      var by = 0
      while (by < blocksH(c)) {
        var bx = 0
        while (bx < blocksW(c)) {
          fdctQuantBlock(planes(c), planeW(c), bx, by, quant, tmp)
          System.arraycopy(tmp, 0, arr, (by * blocksW(c) + bx) * 64, 64)
          bx += 1
        }
        by += 1
      }
      arr
    }
    // non-interleaved scan geometry: the component's OWN sampled dims
    // ceil'd to blocks (T.81 A.2.2) — fewer than the interleaved grid
    // at the right/bottom edge (dummy blocks are interleaved-only)
    val maxH = sampH.max; val maxV = sampV.max
    val nbW = Array.tabulate(nComp)(c =>
      (((width * sampH(c) + maxH - 1) / maxH) + 7) / 8)
    val nbH = Array.tabulate(nComp)(c =>
      (((height * sampV(c) + maxV - 1) / maxV) + 7) / 8)

    val dcT = encTable(DcSpec); val acT = encTable(AcSpecProg)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb) // DQT
    u16(2 + 1 + 64)
    u8(0)
    for (k <- 0 until 64) u8(quant(Zigzag(k)))
    marker(0xc2) // SOF2 — progressive DCT, Huffman
    u16(8 + 3 * nComp)
    u8(8); u16(height); u16(width); u8(nComp)
    for (c <- 0 until nComp) {
      u8(c + 1); u8((sampH(c) << 4) | sampV(c)); u8(0)
    }
    for ((spec, cls) <- Seq((DcSpec, 0), (AcSpecProg, 1))) {
      marker(0xc4) // DHT
      u16(2 + 1 + 16 + spec.vals.length)
      u8(cls << 4) // table id 0
      for (len <- 1 to 16) u8(spec.bits(len))
      spec.vals.foreach(u8)
    }
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }

    val bw = new BitWriter(out)
    for (sc <- script) {
      marker(0xda) // SOS
      u16(6 + 2 * sc.comps.length)
      u8(sc.comps.length)
      for (c <- sc.comps) { u8(c + 1); u8(0) } // DC table 0, AC table 0
      u8(sc.ss); u8(sc.se); u8((sc.ah << 4) | sc.al)

      val isDC = sc.ss == 0
      val dcPred = new Array[Int](nComp)
      var eobrun = 0
      val runPend = scala.collection.mutable.ArrayBuffer.empty[Int]
      def emitEobrun(): Unit = if (eobrun > 0) {
        val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
        require(nbits <= 14, s"EOB run $eobrun too long")
        bw.putSym(acT, nbits << 4)
        if (nbits > 0) bw.putBits(eobrun, nbits) // low bits; top implied
        eobrun = 0
        runPend.foreach(b => bw.putBits(b, 1)); runPend.clear()
      }
      var rstIdx = 0 // RSTn numbering restarts at each scan (T.81 E.1.4)
      var unit = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          if (!isDC) emitEobrun() // EOB runs must not cross a restart
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
      def emitDcFirst(c: Int, base: Int): Unit = {
        val v = coefs(c)(base) >> sc.al // arithmetic shift: point transform
        val diff = v - dcPred(c)
        dcPred(c) = v
        val dsz = sizeOf(diff)
        require(dsz <= 11, s"DC diff $diff out of range")
        bw.putSym(dcT, dsz); bw.putAmp(diff, dsz)
      }
      def emitDcRefine(c: Int, base: Int): Unit =
        bw.putBits((coefs(c)(base) >> sc.al) & 1, 1)
      def emitAcFirst(c: Int, base: Int): Unit = {
        var r = 0
        var k = sc.ss
        while (k <= sc.se) {
          val v0 = coefs(c)(base + k)
          // point transform: sign-preserving magnitude shift
          val t = if (v0 >= 0) v0 >> sc.al else -((-v0) >> sc.al)
          if (t == 0) r += 1
          else {
            emitEobrun()
            while (r > 15) { bw.putSym(acT, 0xf0); r -= 16 }
            val asz = sizeOf(t)
            require(asz <= 10, s"AC coefficient $t out of range")
            bw.putSym(acT, (r << 4) | asz); bw.putAmp(t, asz)
            r = 0
          }
          k += 1
        }
        if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) emitEobrun() }
      }
      def emitAcRefine(c: Int, base: Int): Unit = {
        // last NEWLY-nonzero position: zeros and already-nonzero
        // (history) coefficients after it fold into the EOB run
        var eobPos = sc.ss - 1
        var k = sc.ss
        while (k <= sc.se) {
          if ((math.abs(coefs(c)(base + k)) >> sc.al) == 1) eobPos = k
          k += 1
        }
        var r = 0
        val blockPend = scala.collection.mutable.ArrayBuffer.empty[Int]
        k = sc.ss
        while (k <= sc.se) {
          val v0 = coefs(c)(base + k)
          val a = math.abs(v0) >> sc.al
          if (a == 0) r += 1
          else {
            // ZRLs — but only when not foldable into the EOB run
            while (r > 15 && k <= eobPos) {
              emitEobrun()
              bw.putSym(acT, 0xf0); r -= 16
              blockPend.foreach(b => bw.putBits(b, 1)); blockPend.clear()
            }
            if (a > 1) blockPend += (a & 1) // history: correction bit
            else {
              emitEobrun()
              bw.putSym(acT, (r << 4) | 1)
              bw.putBits(if (v0 >= 0) 1 else 0, 1) // sign: 1 = positive
              blockPend.foreach(b => bw.putBits(b, 1)); blockPend.clear()
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || blockPend.nonEmpty) {
          eobrun += 1
          runPend ++= blockPend
          if (eobrun == 0x7fff) emitEobrun()
        }
      }

      if (isDC && sc.comps.length > 1) {
        // interleaved DC scan: frame MCU walk (incl. dummy edge blocks)
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            for (c <- sc.comps; v <- 0 until sampV(c);
                 hh <- 0 until sampH(c)) {
              val base = ((my * sampV(c) + v) * blocksW(c) +
                mx * sampH(c) + hh) * 64
              if (sc.ah == 0) emitDcFirst(c, base) else emitDcRefine(c, base)
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan over the component's own block grid
        val c = sc.comps.head
        var by = 0
        while (by < nbH(c)) {
          var bx = 0
          while (bx < nbW(c)) {
            maybeRestart()
            val base = (by * blocksW(c) + bx) * 64
            if (isDC) {
              if (sc.ah == 0) emitDcFirst(c, base) else emitDcRefine(c, base)
            } else {
              if (sc.ah == 0) emitAcFirst(c, base) else emitAcRefine(c, base)
            }
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
      if (!isDC) emitEobrun()
      bw.flush()
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------ EXIF orientation

  /** Where upright pixel (x, y) reads from in a stored w×h image under
    * EXIF orientation `o` (Exif 2.32 §4.6.4 tag 274) — ONE copy of the
    * mapping, shared by [[normalizeOrientation]] and the fixture
    * generators/tests (which write through it, so generation and
    * normalization are exact inverses by construction and the mapping
    * itself is pinned by hand-derived fixtures). */
  private[graft] def exifSource(o: Int, x: Int, y: Int, w: Int,
      h: Int): (Int, Int) = o match {
    case 1 => (x, y)
    case 2 => (w - 1 - x, y) // mirrored horizontal
    case 3 => (w - 1 - x, h - 1 - y) // rotated 180
    case 4 => (x, h - 1 - y) // mirrored vertical
    case 5 => (y, x) // transposed
    case 6 => (y, h - 1 - x) // rotate 90 CW to display upright
    case 7 => (w - 1 - y, h - 1 - x) // transverse
    case 8 => (w - 1 - y, x) // rotate 90 CCW to display upright
  }

  /** Store an upright w×h canonical pixel array under EXIF orientation
    * `o`: returns (storedW, storedH, stored) such that
    * [[normalizeOrientation]] of the stored image recovers the canon
    * exactly — the generation half of the orientation lane, ONE copy
    * (was duplicated across the q160/q161/q157 synthesizers). Writes
    * through [[exifSource]], which is itself pinned by hand-derived
    * fixtures, so generation and normalization stay exact inverses. */
  private[graft] def exifStore(o: Int, w: Int, h: Int,
      canon: Array[Int]): (Int, Int, Array[Int]) = {
    val (sw, sh) = if (o >= 5) (h, w) else (w, h)
    val stored = new Array[Int](sw * sh)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (sx, sy) = exifSource(o, x, y, sw, sh)
        stored(sy * sw + sx) = canon(y * w + x)
        x += 1
      }
      y += 1
    }
    (sw, sh, stored)
  }

  /** Apply EXIF orientation `o` (1..8): returns the UPRIGHT image (for
    * o >= 5 width and height swap). Orientation-normalization is what
    * makes a decoded-image face usable for near-dup work — a rotated
    * re-upload of the same photo must produce the same pixels (and
    * hence the same phash) as the original. */
  def normalizeOrientation(img: Jpeg, o: Int): Jpeg = {
    require(o >= 1 && o <= 8, s"bad EXIF orientation $o")
    if (o == 1) return img
    val w = img.width; val h = img.height
    val (nw, nh) = if (o >= 5) (h, w) else (w, h)
    val out = new Array[Int](nw * nh)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val (sx, sy) = exifSource(o, x, y, w, h)
        out(y * nw + x) = img.pixels(sy * w + sx)
        x += 1
      }
      y += 1
    }
    Jpeg(nw, nh, img.channels, out)
  }

  /** Read the EXIF orientation tag (274) from the APP1 Exif segment:
    * 1 (the spec default) when no Exif APP1 or no orientation tag is
    * present; a PRESENT Exif payload is parsed STRICTLY (TIFF byte
    * order, the 42 magic, in-bounds IFD0, entry type/count/value) —
    * a segment that claims to be Exif and lies is a named reject, not
    * a silent default (the corpus-triage posture: wrong orientation
    * silently poisons every normalized phash downstream). */
  def parseOrientation(bytes: Array[Byte]): Int = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "missing SOI marker")
    var off = 2
    while (off + 4 <= bytes.length) {
      require((bytes(off) & 0xff) == 0xff, s"expected marker at $off")
      val m = bytes(off + 1) & 0xff
      if (m == 0xda || m == 0xd9) return 1 // scan reached: no Exif APP1
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { off += 2 } // bare markers
      else {
        val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
        require(len >= 2 && off + 2 + len <= bytes.length,
          f"segment 0x$m%02x overruns file")
        if (m == 0xe1 && len >= 2 + 6 &&
          bytes(off + 4) == 'E' && bytes(off + 5) == 'x' &&
          bytes(off + 6) == 'i' && bytes(off + 7) == 'f' &&
          bytes(off + 8) == 0 && bytes(off + 9) == 0) {
          return exifOrientation(bytes, off + 10, len - 2 - 6)
        }
        off += 2 + len
      }
    }
    1
  }

  /** Strict TIFF walk of an Exif payload at `tiff` (`n` bytes): IFD0's
    * orientation SHORT, or 1 if the tag is absent. */
  private def exifOrientation(bytes: Array[Byte], tiff: Int, n: Int): Int = {
    require(n >= 8, s"Exif TIFF header truncated ($n bytes)")
    val big = (bytes(tiff) & 0xff, bytes(tiff + 1) & 0xff) match {
      case ('M', 'M') => true
      case ('I', 'I') => false
      case (a, b) => throw new IllegalArgumentException(
        f"Exif TIFF byte order 0x$a%02x$b%02x (need II or MM)")
    }
    def u16(o: Int): Int = {
      require(o >= tiff && o + 2 <= tiff + n, "Exif read out of bounds")
      if (big) ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      else (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    }
    def u32(o: Int): Long = {
      require(o >= tiff && o + 4 <= tiff + n, "Exif read out of bounds")
      if (big) ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      else (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    }
    require(u16(tiff + 2) == 42, s"Exif TIFF magic ${u16(tiff + 2)} (need 42)")
    val ifd = u32(tiff + 4)
    require(ifd >= 8 && ifd <= n - 2, s"Exif IFD0 offset $ifd out of range")
    val base = tiff + ifd.toInt
    val count = u16(base)
    require(base + 2 + 12 * count <= tiff + n,
      s"Exif IFD0 declares $count entries, overruns payload")
    var i = 0
    while (i < count) {
      val e = base + 2 + 12 * i
      if (u16(e) == 274) { // orientation
        require(u16(e + 2) == 3 && u32(e + 4) == 1L,
          s"Exif orientation entry malformed (type ${u16(e + 2)}, " +
            s"count ${u32(e + 4)})")
        val v = u16(e + 8) // SHORT rides the value field's first bytes
        require(v >= 1 && v <= 8, s"Exif orientation $v out of range")
        return v
      }
      i += 1
    }
    1
  }

  /** Splice a minimal APP1 Exif segment (TIFF header + a one-entry
    * IFD0 carrying orientation tag 274) right after SOI — the writer
    * half for the orientation lane, in the chosen byte order so both
    * TIFF endiannesses are exercised corpus-wide. */
  def withExif(jpeg: Array[Byte], orientation: Int,
      bigEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8,
      s"bad EXIF orientation $orientation")
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    val t = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (bigEndian) { t.write((v >> 8) & 0xff); t.write(v & 0xff) }
      else { t.write(v & 0xff); t.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit =
      if (bigEndian) { u16(v >>> 16); u16(v & 0xffff) }
      else { u16(v & 0xffff); u16(v >>> 16) }
    t.write(if (bigEndian) 'M' else 'I'); t.write(if (bigEndian) 'M' else 'I')
    u16(42); u32(8) // IFD0 directly after the header
    u16(1) // one entry
    u16(274); u16(3); u32(1) // orientation, SHORT, count 1
    u16(orientation); u16(0) // value field: SHORT + 2 pad bytes
    u32(0) // no next IFD
    val tiff = t.toByteArray
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  // ------------------------------------------------------------ decode

  /** Low-order-bits sign extension (T.81 F.2.2.1 EXTEND). */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  /** Dequantize + inverse-DCT one block: zigzag-order coefficients at
    * `coefs(base .. base+63)` scaled by `q` (natural order), samples
    * (+128, unclamped) written into the component plane. Shared by the
    * baseline streaming scan and the progressive finalize — the two
    * modes differ only in how coefficients ARRIVE. */
  private def idctBlock(coefs: Array[Int], base: Int, q: Array[Int],
      plane: Array[Int], pw: Int, blockX: Int, blockY: Int): Unit = {
    val block = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val v = coefs(base + i)
      if (v != 0) block(Zigzag(i)) = v.toDouble * q(Zigzag(i))
      i += 1
    }
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = block(v * 8 + u)
            if (f != 0.0)
              s += C(u) * C(v) * f * CosT(xx)(u) * CosT(yy)(v)
            u += 1
          }
          v += 1
        }
        plane((blockY * 8 + yy) * pw + blockX * 8 + xx) =
          math.round(0.25 * s).toInt + 128
        xx += 1
      }
      yy += 1
    }
  }

  /** DeviceCMYK → RGB by the multiplicative device convention
    * R = (255−C)(255−K)/255 — ONE copy (libtiff tif_getimage's),
    * shared by the 4-component JPEG face, the PDF raster arms and the
    * TIFF photometric-5 arm. Exactly invertible at K = 0. */
  private[sources] def cmykToRgb(c: Int, m: Int, y: Int, k: Int): Int = {
    val kk = 255 - k
    ((((255 - c) * kk) / 255) << 16) | ((((255 - m) * kk) / 255) << 8) |
      (((255 - y) * kk) / 255)
  }

  /** Upsample (replication) + color-convert component planes to the
    * 0xAARRGGBB face (shared by both decode modes). `adobeTransform`
    * is APP14's transform byte (−1 = no APP14): 4-component streams
    * are CMYK (0) or YCCK (2). For transform 2 the file carries the
    * YCC transform of the INVERTED CMY channels (the Photoshop
    * inversion is baked into the transform), so C = 255 − R_ycc
    * recovers true ink and K passes through UN-inverted — pinned
    * empirically on the round-19 corpus (the banner's white knockout
    * text must carry ZERO black ink, which only this reading
    * satisfies; it is also pdf.js's _convertYcckToCmyk arithmetic:
    * 434.456 − Y − 1.402·Cr = 255 − R_ycc). Transform 0 / absent =
    * plain CMYK samples. */
  private def composePixels(planes: Array[Array[Int]], planeW: Array[Int],
      sampH: Array[Int], sampV: Array[Int], width: Int, height: Int,
      nComp: Int, adobeTransform: Int = -1): Array[Int] = {
    val maxH = sampH.max; val maxV = sampV.max
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    require(nComp != 4 || adobeTransform == 0 || adobeTransform == 2 ||
      adobeTransform == -1,
      s"4-component JPEG with Adobe transform $adobeTransform unsupported")
    // per-component sample lookup with replication upsampling: image
    // (x, y) reads component sample (x·h_c/maxH, y·v_c/maxV)
    def sample(c: Int, x: Int, y: Int): Int =
      planes(c)((y * sampV(c) / maxV) * planeW(c) + x * sampH(c) / maxH)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        px(y * width + x) =
          if (nComp == 1) {
            val g = clamp(sample(0, x, y))
            0xff000000 | (g << 16) | (g << 8) | g
          } else if (nComp == 4) {
            val (c0, m0, y0) =
              if (adobeTransform == 2) {
                val rgb = yccToRgb(sample(0, x, y), sample(1, x, y),
                  sample(2, x, y))
                (255 - ((rgb >> 16) & 0xff), 255 - ((rgb >> 8) & 0xff),
                  255 - (rgb & 0xff))
              } else (clamp(sample(0, x, y)), clamp(sample(1, x, y)),
                clamp(sample(2, x, y)))
            0xff000000 | cmykToRgb(c0, m0, y0, clamp(sample(3, x, y)))
          } else 0xff000000 |
            yccToRgb(sample(0, x, y), sample(1, x, y), sample(2, x, y))
        x += 1
      }
      y += 1
    }
    px
  }

  /** Strict parse. Rejects loudly: bad/missing SOI, unsupported frame
    * types (arithmetic, 12-bit, exotic subsampling), malformed
    * DQT/DHT/SOF/SOS/DRI segments, Huffman codes that do not resolve
    * in 16 bits, coefficient runs overflowing a block, restart markers
    * out of sequence, truncation anywhere, non-1 padding bits, a
    * missing EOI, or bytes after it. */
  def parse(bytes: Array[Byte]): Jpeg = {
    require(bytes.length >= 4, s"not a JPEG: ${bytes.length} bytes")
    require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "missing SOI marker")
    var off = 2
    def u8(): Int = {
      require(off < bytes.length, s"truncated at $off (${bytes.length} bytes)")
      val v = bytes(off) & 0xff; off += 1; v
    }
    def u16(): Int = (u8() << 8) | u8()

    val quant = Array.ofDim[Int](4, 64) // natural order; 0 = unset
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var width = 0; var height = 0; var nComp = 0
    var compQ: Array[Int] = null
    var compSamp: Array[Int] = null
    var compIds: Array[Int] = null
    var restartInterval = 0
    var adobeTransform = -1 // APP14 transform byte; -1 = absent
    var sawSof = false
    var result: Jpeg = null
    // progressive (SOF2) state: coefficients ACCUMULATE across scans
    // (spectral bands × successive-approximation bits) and the IDCT
    // runs once at EOI — vs baseline's single streaming scan
    var progressive = false
    var sampHArr: Array[Int] = null; var sampVArr: Array[Int] = null
    var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null; var blocksH: Array[Int] = null
    var nbW: Array[Int] = null; var nbH: Array[Int] = null
    var coefStore: Array[Array[Int]] = null // per comp: grid blocks × 64, zigzag
    var alStateArr: Array[Array[Int]] = null // per comp × 64: current Al, -1 unseen
    var anyScan = false
    var eoiConsumed = false

    /** Entropy-decode one progressive scan into the coefficient store;
      * returns the offset of the byte after the scan data. The four
      * block procedures mirror T.81 G.2 (and the interoperable libjpeg
      * realization of its refinement ambiguities — correction bits in
      * coefficient order, EOB runs counting the current block). */
    def decodeProgScan(start: Int, scanComps: Array[Int], ss: Int,
        se: Int, ah: Int, al: Int, dcSel: Array[HuffDec],
        acSel: Array[HuffDec]): Int = {
      var o = start
      var acc = 0; var accBits = 0
      def fillBits(need: Int): Unit = {
        while (accBits < need) {
          require(o < bytes.length, "entropy data truncated")
          val b = bytes(o) & 0xff
          if (b == 0xff) {
            require(o + 1 < bytes.length, "entropy data truncated at 0xFF")
            val b2 = bytes(o + 1) & 0xff
            require(b2 == 0x00, f"marker 0x$b2%02x inside entropy data")
            o += 2
          } else o += 1
          acc = (acc << 8) | b; accBits += 8
        }
      }
      def takeBits(n: Int): Int = {
        fillBits(n)
        val v = (acc >>> (accBits - n)) & ((1 << n) - 1)
        accBits -= n
        v
      }
      def decodeSym(t: HuffDec): Int = {
        var code = takeBits(1)
        var len = 1
        while (t.maxCode(len) < 0 || code > t.maxCode(len)) {
          len += 1
          require(len <= 16, "Huffman code does not resolve in 16 bits")
          code = (code << 1) | takeBits(1)
        }
        t.vals(t.valPtr(len) + code - t.minCode(len))
      }
      val dcPred = new Array[Int](nComp)
      var eobrun = 0
      var rstIdx = 0
      var unit = 0 // MCUs (interleaved) or blocks (single-component)
      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          require(eobrun == 0, "EOB run crosses a restart boundary")
          if (accBits > 0) {
            val n = accBits
            val pad = takeBits(n)
            require(pad == (1 << n) - 1,
              "non-1 padding bits before restart marker")
          }
          require(o + 2 <= bytes.length, "truncated at restart marker")
          require((bytes(o) & 0xff) == 0xff &&
            (bytes(o + 1) & 0xff) == (0xd0 + rstIdx),
            f"expected RST$rstIdx, found " +
              f"0x${bytes(o) & 0xff}%02x${bytes(o + 1) & 0xff}%02x")
          o += 2
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
      def dcFirst(si: Int, c: Int, base: Int): Unit = {
        val dsz = decodeSym(dcSel(si))
        require(dsz <= 11, s"DC size $dsz out of range")
        dcPred(c) += extend(takeBits(dsz), dsz)
        coefStore(c)(base) = dcPred(c) << al
      }
      def dcRefine(c: Int, base: Int): Unit =
        if (takeBits(1) == 1) coefStore(c)(base) |= (1 << al)
      def acFirst(si: Int, c: Int, base: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        while (k <= se) {
          val rs = decodeSym(acSel(si))
          val r = rs >> 4; val sz = rs & 0x0f
          if (sz == 0) {
            if (r == 15) { // ZRL: 16 zeros, a coefficient must follow
              k += 16
              require(k <= se, "ZRL overflows the band")
            } else {
              // EOBn: run of 2^r + ext bits all-EOB blocks, INCLUDING
              // this one (consumed now; the rest skip at block entry)
              eobrun = (1 << r) - 1 + (if (r > 0) takeBits(r) else 0)
              k = 64
            }
          } else {
            k += r
            require(k <= se, s"AC run overflows the band at index $k")
            require(sz <= 10, s"AC size $sz out of range")
            coefStore(c)(base + k) = extend(takeBits(sz), sz) << al
            k += 1
          }
        }
      }
      def acRefine(si: Int, c: Int, base: Int): Unit = {
        val p1 = 1 << al
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (k <= se && !brk) {
            val rs = decodeSym(acSel(si))
            var r = rs >> 4; val sz = rs & 0x0f
            var newval = 0
            if (sz == 0) {
              if (r < 15) {
                eobrun = (1 << r) + (if (r > 0) takeBits(r) else 0)
                brk = true // current block's tail refines below
              }
              // r == 15 (ZRL): advance over 16 zero-HISTORY coefficients
            } else {
              require(sz == 1, s"AC refinement size $sz (must be 1)")
              newval = if (takeBits(1) == 1) p1 else -p1
            }
            if (!brk) {
              // advance over r zero-history positions; nonzero-history
              // coefficients read one correction bit each (in order)
              var placed = false
              while (k <= se && !placed) {
                val cur = coefStore(c)(base + k)
                if (cur != 0) {
                  if (takeBits(1) == 1 && (cur & p1) == 0)
                    coefStore(c)(base + k) =
                      cur + (if (cur >= 0) p1 else -p1)
                  k += 1
                } else if (r == 0) {
                  if (newval != 0) coefStore(c)(base + k) = newval
                  k += 1
                  placed = true
                } else { r -= 1; k += 1 }
              }
              require(placed || newval == 0,
                "AC refinement run overflows the band")
            }
          }
        }
        if (eobrun > 0) {
          // block inside an EOB run: only correction bits for already-
          // nonzero coefficients in the (remaining) band
          while (k <= se) {
            val cur = coefStore(c)(base + k)
            if (cur != 0 && takeBits(1) == 1 && (cur & p1) == 0)
              coefStore(c)(base + k) = cur + (if (cur >= 0) p1 else -p1)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (ss == 0 && scanComps.length > 1) {
        // interleaved DC scan: frame MCU walk (incl. dummy edge blocks)
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var si = 0
            while (si < scanComps.length) {
              val c = scanComps(si)
              var v = 0
              while (v < sampVArr(c)) {
                var hh = 0
                while (hh < sampHArr(c)) {
                  val base = ((my * sampVArr(c) + v) * blocksW(c) +
                    mx * sampHArr(c) + hh) * 64
                  if (ah == 0) dcFirst(si, c, base) else dcRefine(c, base)
                  hh += 1
                }
                v += 1
              }
              si += 1
            }
            unit += 1
            mx += 1
          }
          my += 1
        }
      } else {
        // single-component scan: the component's OWN block grid
        val c = scanComps(0)
        var by = 0
        while (by < nbH(c)) {
          var bx = 0
          while (bx < nbW(c)) {
            maybeRestart()
            val base = (by * blocksW(c) + bx) * 64
            if (ss == 0) {
              if (ah == 0) dcFirst(0, c, base) else dcRefine(c, base)
            } else {
              if (ah == 0) acFirst(0, c, base) else acRefine(0, c, base)
            }
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
      require(eobrun == 0, "EOB run extends past the last block of the scan")
      // padding to the byte boundary must be 1-bits (T.81 F.1.2.3)
      if (accBits > 0) {
        val pad = acc & ((1 << accBits) - 1)
        require(pad == (1 << accBits) - 1,
          s"non-1 padding bits at end of scan ($accBits bits)")
      }
      o
    }

    /** At EOI: the scan script must have coded every coefficient of
      * every component (a complete frame); dequantize + IDCT the
      * accumulated store and compose pixels — the same two kernels the
      * baseline scan streams through.
      *
      * SCOPE (stricter than T.81, deliberately): the spec permits scan
      * scripts that never code some AC bands at all — real decoders
      * render the never-coded coefficients as zero. This parser
      * REQUIRES completeness: a script that leaves a coefficient
      * uncoded is a named reject, not a silent zero-fill, because in
      * the corpus-triage posture a partial script is indistinguishable
      * from a truncated file and zero-filling would silently alter
      * pixels an oracle grades. (Contrast the Al > 0 final-pass case,
      * which IS tolerated: there every coefficient was coded, just at
      * reduced precision, so the rendered face is the spec-defined
      * successive-approximation preview.) */
    def finishProgressive(): Jpeg = {
      for (c <- 0 until nComp; k <- 0 until 64)
        require(alStateArr(c)(k) != -1,
          s"progressive scan script leaves coefficient $k of component " +
            s"$c uncoded")
      for (c <- 0 until nComp)
        require(quant(compQ(c)).forall(_ >= 1),
          s"component $c references undefined quant table")
      val planeW = Array.tabulate(nComp)(c => blocksW(c) * 8)
      val planes = Array.tabulate(nComp)(c =>
        new Array[Int](blocksW(c) * blocksH(c) * 64))
      for (c <- 0 until nComp) {
        val q = quant(compQ(c))
        var by = 0
        while (by < blocksH(c)) {
          var bx = 0
          while (bx < blocksW(c)) {
            idctBlock(coefStore(c), (by * blocksW(c) + bx) * 64, q,
              planes(c), planeW(c), bx, by)
            bx += 1
          }
          by += 1
        }
      }
      Jpeg(width, height, nComp, composePixels(planes, planeW,
        sampHArr, sampVArr, width, height, nComp, adobeTransform))
    }

    while (result == null) {
      require(u8() == 0xff, s"expected marker at ${off - 1}")
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes are legal before a marker
      m match {
        case 0xdb => // DQT
          var len = u16() - 2
          while (len > 0) {
            val pqTq = u8()
            require((pqTq >> 4) == 0, "only 8-bit quant tables (Pq=0)")
            val tq = pqTq & 0x0f
            require(tq < 4, s"bad quant table id $tq")
            for (k <- 0 until 64) {
              val q = u8()
              require(q >= 1, "zero quantization entry")
              quant(tq)(Zigzag(k)) = q
            }
            len -= 65
          }
          require(len == 0, "DQT length inconsistent")
        case 0xc4 => // DHT
          var len = u16() - 2
          while (len > 0) {
            val tcTh = u8()
            val tc = tcTh >> 4; val th = tcTh & 0x0f
            require(tc <= 1 && th < 4, s"bad DHT id ${tcTh}")
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = u8(); total += bits(l) }
            require(total >= 1 && total <= 256, s"DHT carries $total symbols")
            val vals = Array.fill(total)(u8())
            val dec = new HuffDec(HuffSpec(bits, vals))
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
            len -= 1 + 16 + total
          }
          require(len == 0, "DHT length inconsistent")
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 (sequential) / SOF2 (progressive)
          require(!sawSof, "duplicate SOF")
          sawSof = true
          progressive = m == 0xc2
          val len = u16()
          require(u8() == 8, "only 8-bit precision")
          height = u16(); width = u16()
          require(width > 0 && height > 0, s"bad dims ${width}x$height")
          nComp = u8()
          require(nComp == 1 || nComp == 3 ||
            (nComp == 4 && !progressive),
            s"$nComp components (only 1=gray, 3=YCbCr, 4=CMYK/YCCK " +
              "sequential)")
          require(len == 8 + 3 * nComp, "SOF length inconsistent")
          compQ = new Array[Int](nComp)
          compSamp = new Array[Int](nComp)
          compIds = new Array[Int](nComp)
          for (c <- 0 until nComp) {
            compIds(c) = u8()
            compSamp(c) = u8()
            val tq = u8()
            require(tq < 4, s"bad component quant id $tq")
            compQ(c) = tq
          }
          require(compIds.distinct.length == nComp, "duplicate component id")
          // the layouts real encoders emit: 4:4:4 (all 1x1), 4:2:0
          // (luma 2x2, chroma 1x1) and — round 20 — 4:2:2 (luma 2x1,
          // the common camera/scanner factor); anything else rejects
          // by name. The scan walk and the replication upsampler are
          // generic over (h, v), so the gate names the REVIEWED grids
          // rather than any structural limit.
          val all444 = compSamp.forall(_ == 0x11)
          val is420 = nComp == 3 && compSamp(0) == 0x22 &&
            compSamp(1) == 0x11 && compSamp(2) == 0x11
          val is422 = nComp == 3 && compSamp(0) == 0x21 &&
            compSamp(1) == 0x11 && compSamp(2) == 0x11
          // YCCK's 4:2:0 twin: luma AND K full-resolution (2x2),
          // chroma subsampled — the Photoshop CMYK layout (round-19
          // corpus)
          val is420Ycck = nComp == 4 && compSamp(0) == 0x22 &&
            compSamp(1) == 0x11 && compSamp(2) == 0x11 &&
            compSamp(3) == 0x22
          require(all444 || is420 || is422 || is420Ycck,
            s"subsampling ${compSamp.map(v => f"0x$v%02x").mkString("/")} " +
              "unsupported (only 4:4:4, 4:2:0 and 4:2:2)")
          if (progressive) {
            sampHArr = compSamp.map(_ >> 4)
            sampVArr = compSamp.map(_ & 0x0f)
            val maxH = sampHArr.max; val maxV = sampVArr.max
            mcusX = (width + 8 * maxH - 1) / (8 * maxH)
            mcusY = (height + 8 * maxV - 1) / (8 * maxV)
            // interleaved grid (incl. the dummy edge blocks interleaved
            // DC scans code) vs the component's OWN ceil'd block dims
            // non-interleaved scans walk (T.81 A.2.2/A.2.3)
            blocksW = Array.tabulate(nComp)(c => mcusX * sampHArr(c))
            blocksH = Array.tabulate(nComp)(c => mcusY * sampVArr(c))
            nbW = Array.tabulate(nComp)(c =>
              (((width * sampHArr(c) + maxH - 1) / maxH) + 7) / 8)
            nbH = Array.tabulate(nComp)(c =>
              (((height * sampVArr(c) + maxV - 1) / maxV) + 7) / 8)
            coefStore = Array.tabulate(nComp)(c =>
              new Array[Int](blocksW(c) * blocksH(c) * 64))
            alStateArr = Array.fill(nComp)(Array.fill(64)(-1))
          }
        case 0xc9 | 0xca | 0xcb => throw new IllegalArgumentException(
          f"arithmetic-coded JPEG (SOF 0x$m%02x) unsupported")
        case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 =>
          throw new IllegalArgumentException(
            f"frame type 0x$x%02x unsupported")
        case 0xdd => // DRI
          require(u16() == 4, "DRI length")
          restartInterval = u16()
        case 0xda => // SOS — decode one scan
          require(sawSof, "SOS before SOF")
          val len = u16()
          val ns = u8()
          if (!progressive) {
            require(ns == nComp, s"scan has $ns of $nComp components")
            require(len == 6 + 2 * ns, "SOS length inconsistent")
            val dcSel = new Array[HuffDec](nComp)
            val acSel = new Array[HuffDec](nComp)
            for (c <- 0 until nComp) {
              u8() // component selector — positional
              val tdTa = u8()
              // table ids are 2-bit in baseline/extended modes; an
              // out-of-range selector must reject by name, not index
              // out of the 4-slot table array (fuzz find, r16)
              require((tdTa >> 4) < 4 && (tdTa & 0x0f) < 4,
                s"bad scan Huffman table selector $tdTa")
              val dc = dcTabs(tdTa >> 4); val ac = acTabs(tdTa & 0x0f)
              require(dc != null && ac != null,
                s"scan references undefined Huffman table ${tdTa}")
              dcSel(c) = dc; acSel(c) = ac
            }
            require(u8() == 0 && u8() == 63 && u8() == 0,
              "non-baseline scan parameters (Ss/Se/AhAl)")
            for (c <- 0 until nComp)
              require(quant(compQ(c)).forall(_ >= 1),
                s"component $c references undefined quant table")
            result = decodeScan(bytes, off, width, height, nComp,
              compQ.map(quant), compSamp.map(_ >> 4), compSamp.map(_ & 0x0f),
              dcSel, acSel, restartInterval, adobeTransform) match {
              case (jpeg, end) => off = end; jpeg
            }
          } else {
            // progressive scan header: explicit band + successive-
            // approximation parameters, validated against the
            // progression rules (T.81 G.1.1.1) per coefficient
            require(ns >= 1 && ns <= nComp, s"scan has $ns components")
            require(len == 6 + 2 * ns, "SOS length inconsistent")
            val scanComps = new Array[Int](ns)
            val tdTaArr = new Array[Int](ns)
            for (i <- 0 until ns) {
              val cs = u8()
              val ci = compIds.indexOf(cs)
              require(ci >= 0,
                s"scan component selector $cs not declared in frame")
              require(!scanComps.take(i).contains(ci),
                s"duplicate scan component $cs")
              scanComps(i) = ci
              tdTaArr(i) = u8()
            }
            val ss = u8(); val se = u8()
            val ahal = u8(); val ah = ahal >> 4; val al = ahal & 0x0f
            if (ss == 0) require(se == 0,
              s"progressive DC scan with Se=$se (must be 0)")
            else {
              require(ns == 1,
                s"progressive AC scan must be single-component (has $ns)")
              require(se >= ss && se <= 63, s"bad spectral band $ss..$se")
            }
            require(al <= 13, s"point transform Al=$al out of range")
            require(ah == 0 || ah == al + 1,
              s"successive approximation Ah=$ah Al=$al must step one bit")
            val dcSelP = new Array[HuffDec](ns)
            val acSelP = new Array[HuffDec](ns)
            for (i <- 0 until ns) {
              val ci = scanComps(i)
              require((tdTaArr(i) >> 4) < 4 && (tdTaArr(i) & 0x0f) < 4,
                s"bad scan Huffman table selector ${tdTaArr(i)}")
              if (ss == 0 && ah == 0) {
                dcSelP(i) = dcTabs(tdTaArr(i) >> 4)
                require(dcSelP(i) != null,
                  s"scan references undefined DC table ${tdTaArr(i) >> 4}")
              }
              if (ss > 0) {
                acSelP(i) = acTabs(tdTaArr(i) & 0x0f)
                require(acSelP(i) != null,
                  s"scan references undefined AC table ${tdTaArr(i) & 0x0f}")
              }
              if (ss > 0) require(alStateArr(ci)(0) != -1,
                s"AC scan before component $ci's DC scan")
              for (k <- ss to se) {
                val cur = alStateArr(ci)(k)
                if (ah == 0) require(cur == -1,
                  s"coefficient $k of component $ci coded twice at first pass")
                else {
                  require(cur != -1,
                    s"refinement of never-coded coefficient $k")
                  require(cur == ah, s"refinement Ah=$ah does not chain " +
                    s"from prior Al=$cur at coefficient $k")
                }
                alStateArr(ci)(k) = al
              }
            }
            off = decodeProgScan(off, scanComps, ss, se, ah, al,
              dcSelP, acSelP)
            anyScan = true
          }
        case 0xd9 =>
          if (progressive && anyScan) {
            result = finishProgressive()
            eoiConsumed = true
          } else throw new IllegalArgumentException("EOI before scan")
        case x if (x >= 0xe0 && x <= 0xef) || x == 0xfe => // APPn / COM
          val len = u16()
          require(len >= 2 && off + len - 2 <= bytes.length,
            s"segment 0x${x.toHexString} overruns file")
          // APP14 "Adobe": the transform byte governs 4-component
          // interpretation (0 = CMYK, 2 = YCCK) and marks the samples
          // as Adobe-INVERTED (the Photoshop convention libjpeg
          // mirrors)
          if (x == 0xee && len >= 2 + 12 &&
              new String(bytes, off, 5, "US-ASCII") == "Adobe")
            adobeTransform = bytes(off + 11) & 0xff
          off += len - 2
        case other => throw new IllegalArgumentException(
          f"unsupported marker 0x$other%02x at ${off - 2}")
      }
    }
    if (eoiConsumed) {
      // progressive: the EOI was consumed by the marker loop
      require(off == bytes.length,
        s"${bytes.length - off} trailing bytes after EOI")
    } else {
      // baseline: after the single scan — EOI, then nothing
      require(off + 2 <= bytes.length, "missing EOI")
      require((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd9,
        f"expected EOI, found 0x${bytes(off) & 0xff}%02x${bytes(off + 1) & 0xff}%02x")
      require(off + 2 == bytes.length,
        s"${bytes.length - off - 2} trailing bytes after EOI")
    }
    result
  }

  /** Entropy-decode the single baseline scan; returns the image and
    * the offset of the byte after the scan data. */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
      height: Int, nComp: Int, quants: Array[Array[Int]],
      sampH: Array[Int], sampV: Array[Int],
      dcSel: Array[HuffDec], acSel: Array[HuffDec],
      restartInterval: Int, adobeTransform: Int): (Jpeg, Int) = {
    val maxH = sampH.max; val maxV = sampV.max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    var off = start
    var acc = 0; var accBits = 0

    def fillBits(need: Int): Unit = {
      while (accBits < need) {
        require(off < bytes.length, "entropy data truncated")
        val b = bytes(off) & 0xff
        if (b == 0xff) {
          require(off + 1 < bytes.length, "entropy data truncated at 0xFF")
          val b2 = bytes(off + 1) & 0xff
          require(b2 == 0x00,
            f"marker 0x$b2%02x inside entropy data")
          off += 2
        } else off += 1
        acc = (acc << 8) | b; accBits += 8
      }
    }
    def takeBits(n: Int): Int = {
      fillBits(n)
      val v = (acc >>> (accBits - n)) & ((1 << n) - 1)
      accBits -= n
      v
    }
    def decodeSym(t: HuffDec): Int = {
      var code = takeBits(1)
      var len = 1
      while (t.maxCode(len) < 0 || code > t.maxCode(len)) {
        len += 1
        require(len <= 16, "Huffman code does not resolve in 16 bits")
        code = (code << 1) | takeBits(1)
      }
      t.vals(t.valPtr(len) + code - t.minCode(len))
    }
    val planeW = Array.tabulate(nComp)(c => mcusX * 8 * sampH(c))
    val planes = Array.tabulate(nComp)(c =>
      new Array[Int](planeW(c) * mcusY * 8 * sampV(c)))
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    def decodeBlock(c: Int, blockX: Int, blockY: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      val dsz = decodeSym(dcSel(c))
      require(dsz <= 11, s"DC size $dsz out of baseline range")
      dcPred(c) += extend(takeBits(dsz), dsz)
      coef(0) = dcPred(c)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = decodeSym(acSel(c))
        val run = rs >> 4; val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) { k += 16 } // ZRL
          else {
            require(run == 0,
              s"AC symbol with size 0 and run $run (not EOB/ZRL)")
            eob = true
          }
        } else {
          k += run
          require(k < 64, s"AC run overflows block at index $k")
          require(size <= 10, s"AC size $size out of baseline range")
          coef(k) = extend(takeBits(size), size)
          k += 1
        }
      }
      require(k <= 64, "coefficient index overflows block")
      idctBlock(coef, 0, quants(c), planes(c), planeW(c), blockX, blockY)
    }
    var mcu = 0
    var rstIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align: discard padding (must be 1-bits), then RSTn
          if (accBits > 0) {
            val n = accBits
            val pad = takeBits(n)
            require(pad == (1 << n) - 1,
              "non-1 padding bits before restart marker")
          }
          require(off + 2 <= bytes.length, "truncated at restart marker")
          require((bytes(off) & 0xff) == 0xff &&
            (bytes(off + 1) & 0xff) == (0xd0 + rstIdx),
            f"expected RST$rstIdx, found " +
              f"0x${bytes(off) & 0xff}%02x${bytes(off + 1) & 0xff}%02x")
          off += 2
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nComp) {
          var v = 0
          while (v < sampV(c)) {
            var hh = 0
            while (hh < sampH(c)) {
              decodeBlock(c, mx * sampH(c) + hh, my * sampV(c) + v)
              hh += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // T.81 F.1.2.3 pads the scan to the byte boundary with 1-bits, but
    // real encoders (round-19 corpus probe: 11 scanner-produced DCT
    // streams) pad with 0-bits; libjpeg and the JDK never check. Every
    // MCU has decoded by this point, so the padding carries no data —
    // tolerate either convention.

    val px = composePixels(planes, planeW, sampH, sampV, width, height,
      nComp, adobeTransform)
    (Jpeg(width, height, nComp, px), off)
  }
}
