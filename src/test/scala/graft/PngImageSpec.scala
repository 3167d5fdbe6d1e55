package graft

import graft.sources.PngImage
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM PNG codec: exact pixel recovery through every filter
  * type × color type × IDAT split, decode of an INDEPENDENTLY assembled
  * container (the test builds chunks with its own writer, not the
  * encoder under test), and loud rejection of malformed files — the
  * BmpImageSpec/WavAudioSpec strict-codec discipline applied to the
  * compressed container. */
class PngImageSpec extends AnyFunSuite {

  private def pxPattern(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (seed * 7 + x * 13 + y * 31) & 0xff
      val g = (seed + x * 101 + y * 3) & 0xff
      val b = (seed * 3 + x + y * 57) & 0xff
      val a = (seed + x * 5 + y * 11) & 0xff
      (a << 24) | (r << 16) | (g << 8) | b
    }

  // independent chunk assembler (NOT the encoder under test)
  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    u32(data.length)
    out.write(ctype.getBytes("US-ASCII"))
    out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
    u32(crc.getValue)
    out.toByteArray
  }

  private val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def ihdr(w: Int, h: Int, depth: Int = 8, color: Int = 2,
      interlace: Int = 0): Array[Byte] = {
    val d = new Array[Byte](13)
    d(0) = ((w >>> 24) & 0xff).toByte; d(1) = ((w >>> 16) & 0xff).toByte
    d(2) = ((w >>> 8) & 0xff).toByte; d(3) = (w & 0xff).toByte
    d(4) = ((h >>> 24) & 0xff).toByte; d(5) = ((h >>> 16) & 0xff).toByte
    d(6) = ((h >>> 8) & 0xff).toByte; d(7) = (h & 0xff).toByte
    d(8) = depth.toByte; d(9) = color.toByte; d(12) = interlace.toByte
    d
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val df = new java.util.zip.Deflater()
    df.setInput(raw); df.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!df.finished()) out.write(tmp, 0, df.deflate(tmp))
    df.end()
    out.toByteArray
  }

  private def assemble(parts: Array[Byte]*): Array[Byte] =
    sig ++ parts.flatten

  test("round-trip recovers every pixel: 5 filters x RGB/RGBA x IDAT split") {
    for {
      filter <- 0 to 4
      withAlpha <- Seq(false, true)
      split <- Seq(Int.MaxValue, 7)
    } {
      val (w, h) = (6 + filter, 4 + (if (withAlpha) 2 else 0))
      val px = pxPattern(w, h, filter * 17 + (if (withAlpha) 5 else 0))
      val bytes = PngImage.encode(w, h, px, withAlpha,
        filterFor = _ => filter, idatChunkSize = split)
      val png = PngImage.parse(bytes)
      assert(png.width == w && png.height == h)
      assert(png.hasAlpha == withAlpha)
      val expected =
        if (withAlpha) px.toSeq
        else px.map(p => 0xff000000 | (p & 0xffffff)).toSeq
      assert(png.pixels.toSeq == expected,
        s"pixel mismatch filter=$filter alpha=$withAlpha split=$split")
    }
  }

  test("grayscale round-trip: types 0 and 4, all filters, R=G=B face") {
    for {
      filter <- 0 to 4
      withAlpha <- Seq(false, true)
    } {
      val (w, h) = (7 + filter, 5)
      val gray = Array.tabulate(w * h)(i => (i * 37 + filter * 11) & 0xff)
      val alpha =
        if (withAlpha) Array.tabulate(w * h)(i => (i * 53 + 9) & 0xff)
        else Array.emptyIntArray
      val png = PngImage.parse(PngImage.encodeGray(w, h, gray, alpha,
        filterFor = _ => filter, idatChunkSize = 13))
      assert(png.width == w && png.height == h)
      assert(png.hasAlpha == withAlpha)
      for (y <- 0 until h; x <- 0 until w) {
        val g = gray(y * w + x)
        assert(png.pixel(x, y) == ((g << 16) | (g << 8) | g),
          s"gray mismatch at ($x,$y) filter=$filter alpha=$withAlpha")
        val expA = if (withAlpha) alpha(y * w + x) else 0xff
        assert(png.alpha(x, y) == expA)
      }
    }
  }

  test("independently assembled GRAYSCALE container decodes") {
    // 3x2 type-0, filter Sub on row 1 — hand-reconstructable:
    // row 0 raw: f=0, 10, 20, 30; row 1 raw: f=1, 100, 5, 250
    // row 1 recon: 100, 105, 105+250=355 & 0xff = 99
    val raw = Array[Byte](0, 10, 20, 30, 1, 100, 5, 250.toByte)
    val png = PngImage.parse(assemble(chunk("IHDR", ihdr(3, 2, color = 0)),
      chunk("IDAT", deflate(raw)), chunk("IEND", Array.emptyByteArray)))
    assert(!png.hasAlpha)
    assert(Seq(png.pixel(0, 0), png.pixel(1, 0), png.pixel(2, 0))
      .map(_ & 0xff) == Seq(10, 20, 30))
    assert(Seq(png.pixel(0, 1), png.pixel(1, 1), png.pixel(2, 1))
      .map(_ & 0xff) == Seq(100, 105, 99))
    assert((0 until 3).forall(x => png.alpha(x, 0) == 0xff))
  }

  test("mixed per-row filters round-trip (every row a different type)") {
    val (w, h) = (9, 10)
    val px = pxPattern(w, h, 42)
    for (withAlpha <- Seq(false, true)) {
      val png = PngImage.parse(PngImage.encode(w, h, px, withAlpha,
        filterFor = y => y % 5, idatChunkSize = 11))
      val expected =
        if (withAlpha) px.toSeq
        else px.map(p => 0xff000000 | (p & 0xffffff)).toSeq
      assert(png.pixels.toSeq == expected)
    }
  }

  test("independently assembled container decodes; pixel() masks alpha") {
    // 2x2 RGBA, filter None on both rows, assembled by the test's own
    // chunk writer — catches an encoder+parser agreeing on a SHARED
    // container mistake (the round-trip blind spot)
    val raw = Array[Byte](
      0, 10, 20, 30, 0x40, 50, 60, 70, 0x50.toByte, // row 0: f=0, 2 px
      0, 90, 100, 110, 0x60, 5, 15, 25, 0x70)
    val bytes = assemble(chunk("IHDR", ihdr(2, 2, color = 6)),
      chunk("IDAT", deflate(raw)), chunk("IEND", Array.emptyByteArray))
    val png = PngImage.parse(bytes)
    assert(png.hasAlpha)
    assert(png.pixel(0, 0) == ((10 << 16) | (20 << 8) | 30))
    assert(png.alpha(0, 0) == 0x40)
    assert(png.pixel(1, 1) == ((5 << 16) | (15 << 8) | 25))
    assert(png.alpha(1, 1) == 0x70)
  }

  test("ancillary chunks are CRC-checked and skipped") {
    val px = pxPattern(3, 3, 7)
    val good = PngImage.encode(3, 3, px)
    // splice a tEXt chunk between IHDR and IDAT
    val ihdrEnd = 8 + 12 + 13
    val text = chunk("tEXt", ("Comment".getBytes("US-ASCII") :+ 0.toByte) ++
      "hello".getBytes("US-ASCII"))
    val spliced = good.take(ihdrEnd) ++ text ++ good.drop(ihdrEnd)
    assert(PngImage.parse(spliced).pixels.toSeq ==
      px.map(p => 0xff000000 | (p & 0xffffff)).toSeq)
    // same chunk with one flipped payload byte → CRC rejection
    val bad = spliced.clone()
    bad(ihdrEnd + 9) = (bad(ihdrEnd + 9) ^ 1).toByte
    val e = intercept[IllegalArgumentException](PngImage.parse(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("malformed containers are rejected loudly") {
    val px = pxPattern(4, 3, 9)
    val good = PngImage.encode(4, 3, px)
    // bad signature
    val badSig = good.clone(); badSig(1) = 'X'.toByte
    intercept[IllegalArgumentException](PngImage.parse(badSig))
    // IDAT payload bit-flip → CRC mismatch
    val badCrc = good.clone()
    badCrc(8 + 25 + 8 + 2) = (badCrc(8 + 25 + 8 + 2) ^ 0x10).toByte
    assert(intercept[IllegalArgumentException](PngImage.parse(badCrc))
      .getMessage.contains("CRC"))
    // truncation mid-chunk
    intercept[IllegalArgumentException](
      PngImage.parse(java.util.Arrays.copyOf(good, good.length - 5)))
    // trailing garbage after IEND
    intercept[IllegalArgumentException](
      PngImage.parse(good ++ Array[Byte](1, 2, 3)))
    // unsupported/invalid headers: sub-8 depth ON TRUECOLOR (spec-valid
    // only for gray/palette — §11.2.2), a depth valid for NO type (3),
    // PLTE-less palette color, 16-bit PALETTE (spec-invalid — palette
    // depths are {1,2,4,8}), interlace method 2, zero dims (each with a
    // VALID CRC via the independent assembler, so the header gate—not
    // the CRC gate—must reject)
    val idat = chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3)))
    val iend = chunk("IEND", Array.emptyByteArray)
    for (hdr <- Seq(ihdr(1, 1, depth = 4), ihdr(1, 1, depth = 3),
        ihdr(1, 1, color = 3),
        ihdr(1, 1, depth = 16, color = 3),
        ihdr(1, 1, interlace = 2), ihdr(0, 1), ihdr(1, 0))) {
      intercept[IllegalArgumentException](
        PngImage.parse(assemble(chunk("IHDR", hdr), idat, iend)))
    }
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, depth = 16, color = 3)), idat, iend)))
      .getMessage.contains("invalid for color type 3"))
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, interlace = 2)), idat, iend)))
      .getMessage.contains("interlace"))
    // missing IDAT entirely
    intercept[IllegalArgumentException](
      PngImage.parse(assemble(chunk("IHDR", ihdr(1, 1)), iend)))
    // IHDR not first
    intercept[IllegalArgumentException](
      PngImage.parse(assemble(chunk("tEXt", "x".getBytes),
        chunk("IHDR", ihdr(1, 1)), idat, iend)))
    // unknown CRITICAL chunk
    intercept[IllegalArgumentException](
      PngImage.parse(assemble(chunk("IHDR", ihdr(1, 1)),
        chunk("ABCD", Array[Byte](1)), idat, iend)))
  }

  test("zlib/scanline-layer corruption is rejected (valid CRCs throughout)") {
    val iend = chunk("IEND", Array.emptyByteArray)
    def one(rawRows: Array[Byte], w: Int = 1, h: Int = 1): Array[Byte] =
      assemble(chunk("IHDR", ihdr(w, h)), chunk("IDAT", deflate(rawRows)),
        iend)
    // filter byte out of range
    assert(intercept[IllegalArgumentException](
      PngImage.parse(one(Array[Byte](5, 1, 2, 3))))
      .getMessage.contains("filter"))
    // inflated size too small (missing a byte)
    intercept[IllegalArgumentException](
      PngImage.parse(one(Array[Byte](0, 1, 2))))
    // inflated size too large (extra row)
    intercept[IllegalArgumentException](
      PngImage.parse(one(Array[Byte](0, 1, 2, 3, 0, 4, 5, 6))))
    // compressed garbage instead of a zlib stream
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1)),
      chunk("IDAT", Array[Byte](0x12, 0x34, 0x56, 0x78, 0x0a)), iend)))
      .getMessage.toLowerCase.contains("zlib"))
    // trailing compressed garbage after the zlib stream end
    intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1)),
      chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3)) ++ Array[Byte](9, 9)),
      iend)))
    // non-contiguous IDAT: tEXt spliced between two IDAT chunks
    val z = deflate(Array[Byte](0, 1, 2, 3))
    val (z1, z2) = z.splitAt(z.length / 2)
    val kv = ("k".getBytes("US-ASCII") :+ 0.toByte) ++
      "v".getBytes("US-ASCII")
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1)), chunk("IDAT", z1),
      chunk("tEXt", kv),
      chunk("IDAT", z2), iend)))
      .getMessage.contains("IDAT"))
    // ...even when the first IDAT is ZERO-LENGTH (legal by itself): the
    // run is defined by chunks seen, not bytes accumulated (review find)
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1)), chunk("IDAT", Array.emptyByteArray),
      chunk("tEXt", kv),
      chunk("IDAT", z), iend)))
      .getMessage.contains("IDAT"))
    // ...while the SAME split with contiguous IDATs parses fine
    val ok = PngImage.parse(assemble(chunk("IHDR", ihdr(1, 1)),
      chunk("IDAT", z1), chunk("IDAT", z2), iend))
    assert(ok.pixel(0, 0) == ((1 << 16) | (2 << 8) | 3))
  }

  test("palette round-trip: 5 filters x tRNS/opaque x IDAT split") {
    for {
      filter <- 0 to 4
      withTrns <- Seq(false, true)
      split <- Seq(Int.MaxValue, 32)
    } {
      val w = 9; val h = 6; val nPal = 17
      val pal = Array.tabulate(nPal) { j =>
        val a = if (withTrns && j % 3 == 0) (j * 29) & 0xff else 0xff
        (a << 24) | (((j * 37) & 0xff) << 16) | (((j * 91) & 0xff) << 8) |
          ((j * 13) & 0xff)
      }
      val idx = Array.tabulate(w * h)(i => (i * 7 + filter) % nPal)
      val png = PngImage.parse(PngImage.encodePalette(w, h, idx, pal,
        filterFor = _ => filter, idatChunkSize = split))
      assert(png.width == w && png.height == h)
      assert(png.hasAlpha == withTrns)
      for (y <- 0 until h; x <- 0 until w) {
        val want = pal(idx(y * w + x))
        assert(png.pixel(x, y) == (want & 0xffffff) &&
          png.alpha(x, y) == ((want >>> 24) & 0xff),
          s"palette mismatch at ($x,$y) filter=$filter trns=$withTrns")
      }
    }
  }

  test("independently assembled PALETTE container decodes (PLTE + tRNS)") {
    // 3x2, palette of 4; tRNS covers only the first 2 entries
    val plte = Array[Byte](
      10, 20, 30,   100,110, 120,   (200 - 256).toByte, 0, 50,   1, 2, 3)
    val raw = Array[Byte](0, 0, 1, 2, /*row1*/ 0, 3, 2, 1)
    val png = PngImage.parse(assemble(chunk("IHDR", ihdr(3, 2, color = 3)),
      chunk("PLTE", plte), chunk("tRNS", Array[Byte](40, (200 - 256).toByte)),
      chunk("IDAT", deflate(raw)), chunk("IEND", Array.emptyByteArray)))
    assert(png.hasAlpha)
    assert(png.pixel(0, 0) == ((10 << 16) | (20 << 8) | 30))
    assert(png.alpha(0, 0) == 40)
    assert(png.pixel(1, 0) == ((100 << 16) | (110 << 8) | 120))
    assert(png.alpha(1, 0) == 200)
    assert(png.pixel(2, 0) == ((200 << 16) | (0 << 8) | 50))
    assert(png.alpha(2, 0) == 255) // beyond tRNS -> opaque default
    assert(png.pixel(0, 1) == ((1 << 16) | (2 << 8) | 3))
    assert(png.alpha(0, 1) == 255)
  }

  test("palette layout violations are rejected loudly") {
    val iend = chunk("IEND", Array.emptyByteArray)
    val plte3 = chunk("PLTE", Array[Byte](9, 9, 9)) // 1-entry palette
    val idat0 = chunk("IDAT", deflate(Array[Byte](0, 0))) // 1x1 index 0
    // type 3 without PLTE
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)), idat0, iend)))
      .getMessage.contains("PLTE"))
    // PLTE length not a multiple of 3
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)),
      chunk("PLTE", Array[Byte](9, 9)), idat0, iend)))
      .getMessage.contains("PLTE length"))
    // duplicate PLTE
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)), plte3, plte3, idat0, iend)))
      .getMessage.contains("duplicate PLTE"))
    // PLTE after first IDAT
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)), idat0, plte3, iend)))
      .getMessage.contains("IDAT"))
    // PLTE forbidden for grayscale
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 0)), plte3,
      chunk("IDAT", deflate(Array[Byte](0, 7))), iend)))
      .getMessage.contains("forbidden"))
    // tRNS before PLTE
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)),
      chunk("tRNS", Array[Byte](1)), plte3, idat0, iend)))
      .getMessage.contains("tRNS before PLTE"))
    // tRNS longer than the palette
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)), plte3,
      chunk("tRNS", Array[Byte](1, 2)), idat0, iend)))
      .getMessage.contains("tRNS"))
    // tRNS forbidden for alpha color types (4/6)
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 6)),
      chunk("tRNS", Array[Byte](1)),
      chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3, 4))), iend)))
      .getMessage.contains("forbidden"))
    // out-of-range palette index in the pixel data
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)), plte3,
      chunk("IDAT", deflate(Array[Byte](0, 5))), iend)))
      .getMessage.contains("out of range"))
    // ...while the minimal VALID palette file parses fine
    val ok = PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 1, color = 3)), plte3, idat0, iend))
    assert(ok.pixel(0, 0) == ((9 << 16) | (9 << 8) | 9) && !ok.hasAlpha)
  }

  test("Adam7 interlaced decode equals non-interlaced, every color type") {
    // sizes straddle the 8x8 tile so sub-8 images exercise EMPTY passes
    // (zero bytes, not even filter bytes) and 9..16 exercise multi-tile;
    // filters cycle per OUTPUT scanline so every pass sees several types.
    // Equality against the non-interlaced decode of the SAME pixels is
    // the strongest oracle here: a wrong pass origin/stride would leave
    // holes or double-writes, not just scramble.
    for ((w, h) <- Seq((1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (8, 8),
        (9, 10), (16, 5), (7, 13))) {
      val px = pxPattern(w, h, w * 31 + h)
      for (withAlpha <- Seq(false, true)) {
        val plain = PngImage.parse(PngImage.encode(w, h, px, withAlpha,
          y => y % 5, 11))
        val inter = PngImage.parse(PngImage.encode(w, h, px, withAlpha,
          y => y % 5, 11, interlaced = true))
        assert(inter.pixels.toSeq == plain.pixels.toSeq,
          s"rgb(a=$withAlpha) interlaced mismatch at ${w}x$h")
      }
      val gray = Array.tabulate(w * h)(i => (i * 37 + 5) & 0xff)
      val ga = Array.tabulate(w * h)(i => (i * 53 + 9) & 0xff)
      for (alpha <- Seq(Array.emptyIntArray, ga)) {
        val plain = PngImage.parse(PngImage.encodeGray(w, h, gray, alpha,
          y => (y + 2) % 5, 9))
        val inter = PngImage.parse(PngImage.encodeGray(w, h, gray, alpha,
          y => (y + 2) % 5, 9, interlaced = true))
        assert(inter.pixels.toSeq == plain.pixels.toSeq,
          s"gray(alpha=${alpha.nonEmpty}) interlaced mismatch at ${w}x$h")
      }
      val nPal = 1 + (w * h) % 200
      val pal = Array.tabulate(nPal) { j =>
        val a = if (j % 4 == 1) (j * 29) & 0xff else 0xff
        (a << 24) | (((j * 37) & 0xff) << 16) | (((j * 91) & 0xff) << 8) |
          ((j * 13) & 0xff)
      }
      val idx = Array.tabulate(w * h)(i => (i * 7 + 3) % nPal)
      val plain = PngImage.parse(PngImage.encodePalette(w, h, idx, pal,
        y => (y + 4) % 5, 17))
      val inter = PngImage.parse(PngImage.encodePalette(w, h, idx, pal,
        y => (y + 4) % 5, 17, interlaced = true))
      assert(inter.pixels.toSeq == plain.pixels.toSeq,
        s"palette interlaced mismatch at ${w}x$h")
    }
  }

  test("independently assembled Adam7 container decodes (hand-derived)") {
    // 3x3 grayscale, g(x,y) = 10 + x + 3y. Non-empty passes in spec
    // order for w=h=3: p1 -> (0,0); p4 (2,0,4,4) -> (2,0); p5 (0,2,2,4)
    // -> (0,2),(2,2); p6 (1,0,2,2) -> (1,0),(1,2); p7 (0,1,1,2) ->
    // (0,1),(1,1),(2,1). p2 (x0=4) and p3 (y0=4) are EMPTY and carry no
    // bytes. Filters exercised WITHIN passes: p5 row uses Sub, p6's
    // second row uses Up (prior = p6's own row 0, recon 11).
    val raw = Array[Byte](
      0, 10, // p1
      0, 12, // p4
      1, 16, 2, // p5: Sub -> 16, 16+2=18
      0, 11, 2, 6, // p6 rows: 11 then Up -> 11+6=17
      0, 13, 14, 15) // p7
    val png = PngImage.parse(assemble(
      chunk("IHDR", ihdr(3, 3, color = 0, interlace = 1)),
      chunk("IDAT", deflate(raw)), chunk("IEND", Array.emptyByteArray)))
    for (y <- 0 until 3; x <- 0 until 3) {
      val g = 10 + x + 3 * y
      assert(png.pixel(x, y) == ((g << 16) | (g << 8) | g),
        s"hand-derived Adam7 mismatch at ($x,$y)")
    }
  }

  test("16-bit round-trip: high-byte face, low bytes carried then dropped") {
    val (w, h) = (9, 6)
    val n = w * h
    def hiLo(seed: Int): Array[Int] =
      Array.tabulate(n)(i => (((i * 37 + seed) & 0xff) << 8) |
        ((i * 113 + seed * 7) & 0xff))
    for (colorType <- Seq(0, 2, 4, 6); inter <- Seq(false, true)) {
      val nCh = colorType match { case 0 => 1; case 2 => 3; case 4 => 2
        case _ => 4 }
      val chans = Array.tabulate(nCh)(c => hiLo(c * 19 + colorType))
      val png = PngImage.parse(PngImage.encode16(w, h, chans, colorType,
        y => y % 5, 23, interlaced = inter))
      assert(png.width == w && png.height == h)
      assert(png.hasAlpha == (colorType == 4 || colorType == 6))
      var k = 0
      while (k < n) {
        val want = colorType match {
          case 0 =>
            val g = chans(0)(k) >> 8
            0xff000000 | (g << 16) | (g << 8) | g
          case 2 =>
            0xff000000 | ((chans(0)(k) >> 8) << 16) |
              ((chans(1)(k) >> 8) << 8) | (chans(2)(k) >> 8)
          case 4 =>
            val g = chans(0)(k) >> 8
            ((chans(1)(k) >> 8) << 24) | (g << 16) | (g << 8) | g
          case _ =>
            ((chans(3)(k) >> 8) << 24) | ((chans(0)(k) >> 8) << 16) |
              ((chans(1)(k) >> 8) << 8) | (chans(2)(k) >> 8)
        }
        assert(png.pixels(k) == want,
          s"16-bit face mismatch type=$colorType inter=$inter at $k")
        k += 1
      }
      // same high bytes, DIFFERENT low bytes -> identical 8-bit face:
      // the low byte flows through the filter/size machinery (a missing
      // byte would shift every later sample) and is then dropped
      val chans2 = chans.map(_.map(v => (v & 0xff00) | ((v * 31 + 7) & 0xff)))
      val png2 = PngImage.parse(PngImage.encode16(w, h, chans2, colorType,
        y => (y + 1) % 5, 41, interlaced = inter))
      assert(png2.pixels.toSeq == png.pixels.toSeq,
        s"low-byte variation leaked into the face, type=$colorType")
    }
  }

  test("independently assembled 16-BIT container decodes") {
    // 1x2 grayscale-16: 0x1234 then 0xABCD; row 1 uses Up on BOTH bytes
    // of the big-endian sample (filters are bytewise, bpp=2)
    val raw = Array[Byte](0, 0x12, 0x34,
      2, 0x99.toByte, 0x99.toByte) // 0x12+0x99=0xAB, 0x34+0x99=0xCD
    val png = PngImage.parse(assemble(
      chunk("IHDR", ihdr(1, 2, depth = 16, color = 0)),
      chunk("IDAT", deflate(raw)), chunk("IEND", Array.emptyByteArray)))
    assert(png.pixel(0, 0) == ((0x12 << 16) | (0x12 << 8) | 0x12))
    assert(png.pixel(0, 1) == ((0xAB << 16) | (0xAB << 8) | 0xAB))
  }

  test("interlace flag changes the EXACT expected stream size") {
    // 4x3 RGB: non-interlaced filtered size is 3*(1+12)=39; Adam7 is 42
    // (p1 4 + p4 4 + p5 7 + p6 14 + p7 13). A 39-byte stream under an
    // interlace=1 header must reject on size, not half-decode.
    val raw39 = new Array[Byte](39)
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(4, 3, interlace = 1)),
      chunk("IDAT", deflate(raw39)), chunk("IEND", Array.emptyByteArray))))
      .getMessage.contains("expected 42"))
    // and the bomb guard covers interlaced headers too (dims inside
    // the r17 pixel budget so the EXPANSION gate is the one under test)
    val e = intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1 << 13, 1 << 13, interlace = 1)),
      chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3))),
      chunk("IEND", Array.emptyByteArray))))
    assert(e.getMessage.contains("max deflate expansion"))
  }

  test("dimension-bomb header is rejected before allocation") {
    // valid CRCs, in-budget IHDR dims (2^13 x 2^13 = 2^26 px at bpp 3
    // -> ~201 MB raw, under the Int.MaxValue size gate), but a tiny
    // IDAT that could never inflate to that: must reject CHEAPLY before
    // the raw + pixel allocations (advisor find, r14 —
    // memory-amplification guard)
    val e = intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1 << 13, 1 << 13)),
      chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3))),
      chunk("IEND", Array.emptyByteArray))))
    assert(e.getMessage.contains("max deflate expansion"))
    // headers past the r17 pixel budget reject even earlier, by name
    assert(intercept[IllegalArgumentException](PngImage.parse(assemble(
      chunk("IHDR", ihdr(1 << 20, 512)),
      chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3))),
      chunk("IEND", Array.emptyByteArray))))
      .getMessage.contains("pixel budget"))
  }

  test("sub-8 HAND FIXTURE: MSB-first packing + the 1-byte filter floor") {
    // The Adam7 lesson applied to bit depths: self-consistent
    // encoder+decoder round-trips cannot catch a wrong packing
    // convention, so the container is assembled BY HAND from
    // spec-derived bytes. Depth-4 gray, 3×2, filters Sub then Up.
    //   row0 samples [1, 10, 15]  → packed 0x1A, 0xF0 (§7.2 MSB-first)
    //   row1 samples [3, 7, 2]    → packed 0x37, 0x20
    //   Sub  (bpp FLOORS AT 1 per §9.2): 0x1A, 0xF0−0x1A = 0xD6
    //   Up:                              0x37−0x1A = 0x1D, 0x20−0xF0 = 0x30
    val raw = Array[Byte](1, 0x1A, 0xD6.toByte, 2, 0x1D, 0x30)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!d.finished()) zBuf.write(tmp, 0, d.deflate(tmp))
    d.end()
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u32(v: Long): Unit = {
        out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
        out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      u32(data.length.toLong)
      out.write(ctype.getBytes("US-ASCII"))
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      u32(crc.getValue)
      out.toByteArray
    }
    val ihdr = Array[Byte](0, 0, 0, 3, 0, 0, 0, 2, 4, 0, 0, 0, 0)
    val file = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
      0x0a) ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zBuf.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val p = PngImage.parse(file)
    assert(p.width == 3 && p.height == 2)
    // §12.5 rescale ×17 for depth 4
    val expect = Seq(1, 10, 15, 3, 7, 2).map(_ * 17)
    for (k <- 0 until 6)
      assert((p.pixels(k) & 0xff) == expect(k),
        s"hand-fixture gray mismatch at $k: ${p.pixels(k) & 0xff}")
    // and the encoder must reproduce the identical filtered stream
    val enc = PngImage.parse(PngImage.encodeGray(3, 2,
      Array(1, 10, 15, 3, 7, 2), filterFor = y => y + 1, depth = 4))
    assert(enc.pixels.toSeq == p.pixels.toSeq)
  }

  test("sub-8 gray round-trips: depths 1/2/4 × filters × interlace") {
    val rnd = new scala.util.Random(4161)
    for (t <- 0 until 30) {
      val depth = Seq(1, 2, 4)(t % 3)
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(12)
      val inter = t % 2 == 1
      val vals = Array.fill(w * h)(rnd.nextInt(1 << depth))
      val filters = Array.fill(2 * h + 8)(rnd.nextInt(5))
      val p = PngImage.parse(PngImage.encodeGray(w, h, vals,
        filterFor = y => filters(y), interlaced = inter, depth = depth))
      assert(p.width == w && p.height == h && !p.hasAlpha)
      val scale = 255 / ((1 << depth) - 1)
      for (k <- 0 until w * h)
        assert(p.pixels(k) == (0xff000000 | (vals(k) * scale * 0x10101)),
          s"sub-8 gray mismatch at $k (d=$depth ${w}x$h inter=$inter)")
    }
  }

  test("sub-8 palette round-trips, including tRNS alpha") {
    val rnd = new scala.util.Random(4261)
    for (t <- 0 until 30) {
      val depth = Seq(1, 2, 4)(t % 3)
      val nPal = 1 + rnd.nextInt(1 << depth)
      val pal = Array.fill(nPal)(rnd.nextInt())
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(12)
      val inter = t % 2 == 0
      val idx = Array.fill(w * h)(rnd.nextInt(nPal))
      val filters = Array.fill(2 * h + 8)(rnd.nextInt(5))
      val p = PngImage.parse(PngImage.encodePalette(w, h, idx, pal,
        filterFor = y => filters(y), interlaced = inter, depth = depth))
      assert(p.width == w && p.height == h)
      for (k <- 0 until w * h)
        assert(p.pixels(k) == pal(idx(k)),
          s"sub-8 palette mismatch at $k (d=$depth ${w}x$h inter=$inter)")
    }
  }

  test("sub-8 cross-decoder: ImageIO agrees on gray and palette") {
    val rnd = new scala.util.Random(4361)
    for (t <- 0 until 20) {
      val depth = Seq(1, 2, 4)(t % 3)
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(16)
      val inter = t % 4 == 2
      if (t % 2 == 0) {
        val vals = Array.fill(w * h)(rnd.nextInt(1 << depth))
        val bytes = PngImage.encodeGray(w, h, vals,
          filterFor = y => (y + t) % 5, interlaced = inter, depth = depth)
        val ours = PngImage.parse(bytes)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        assert(img != null && img.getWidth == w && img.getHeight == h)
        // raster samples carry the UNSCALED d-bit value (and dodge the
        // JDK's gray color management) — ours is the §12.5 rescale
        val scale = 255 / ((1 << depth) - 1)
        for (y <- 0 until h; x <- 0 until w)
          assert((ours.pixels(y * w + x) & 0xff) ==
            img.getRaster.getSample(x, y, 0) * scale,
            s"ImageIO gray disagrees at ($x,$y) d=$depth t=$t")
      } else {
        val nPal = 1 + rnd.nextInt(1 << depth)
        val pal = Array.fill(nPal)(0xff000000 | (rnd.nextInt() & 0xffffff))
        val idx = Array.fill(w * h)(rnd.nextInt(nPal))
        val bytes = PngImage.encodePalette(w, h, idx, pal,
          filterFor = y => (y + t) % 5, interlaced = inter, depth = depth)
        val ours = PngImage.parse(bytes)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        assert(img != null && img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w)
          assert((ours.pixels(y * w + x) & 0xffffff) ==
            (img.getRGB(x, y) & 0xffffff),
            s"ImageIO palette disagrees at ($x,$y) d=$depth t=$t")
      }
    }
  }

  test("sub-8 gates: invalid depth/type pairings and oversized palettes") {
    // depth 4 truecolor is spec-INVALID (§11.2.2) — the q144 class
    intercept[IllegalArgumentException] {
      val good = PngImage.encode(4, 2, Array.fill(8)(0xff112233))
      val b = good.clone(); b(24) = 4
      // re-CRC IHDR so only the depth gate can fire
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 17)
      val v = crc.getValue; val o = 29
      b(o) = ((v >>> 24) & 0xff).toByte; b(o + 1) = ((v >>> 16) & 0xff).toByte
      b(o + 2) = ((v >>> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
      PngImage.parse(b)
    }
    // encoder refuses an out-of-depth palette or gray value
    intercept[IllegalArgumentException](
      PngImage.encodePalette(2, 2, Array(0, 1, 2, 3),
        Array.fill(5)(0xff000000), depth = 2))
    intercept[IllegalArgumentException](
      PngImage.encodeGray(2, 2, Array(0, 1, 2, 4), depth = 2))
    // decoder rejects a depth-2 palette index past a 2-entry PLTE:
    // encode with a 4-entry palette, then SPLICE the PLTE down to 2
    // entries (re-lengthed, re-CRC'd) so only the index gate can fire
    val good = PngImage.encodePalette(2, 2, Array(0, 1, 2, 3),
      Array(0xff111111, 0xff222222, 0xff333333, 0xff444444), depth = 2)
    val plteAt = 8 + 25 // after signature + IHDR chunk
    val shrunk = new java.io.ByteArrayOutputStream()
    shrunk.write(good, 0, plteAt)
    val plteData = java.util.Arrays.copyOfRange(good, plteAt + 8,
      plteAt + 8 + 6) // first two RGB triples
    def u32b(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    shrunk.write(u32b(6))
    shrunk.write("PLTE".getBytes("US-ASCII"))
    shrunk.write(plteData)
    val crc2 = new java.util.zip.CRC32()
    crc2.update("PLTE".getBytes("US-ASCII")); crc2.update(plteData)
    shrunk.write(u32b(crc2.getValue))
    val afterPlte = plteAt + 8 + 12 + 4 // len/type + 12 data + CRC
    shrunk.write(good, afterPlte, good.length - afterPlte)
    assert(intercept[IllegalArgumentException](
      PngImage.parse(shrunk.toByteArray))
      .getMessage.contains("palette index"))
  }

  test("pixel budget: IHDR dims whose product wraps Int are a named reject") {
    // 1048576 x 2048 passes BOTH per-dim caps but the pixel count is
    // 2^31 — pre-guard the allocation was a NegativeArraySizeException
    // in an executor task, not the named gate the quarantine lane maps
    // (advisor r17, TIFF find applied family-wide)
    val bad = assemble(chunk("IHDR", ihdr(1 << 20, 2048, 8, 0)),
      chunk("IDAT", deflate(new Array[Byte](8))),
      chunk("IEND", Array.emptyByteArray))
    assert(intercept[IllegalArgumentException](PngImage.parse(bad))
      .getMessage.contains("pixel budget"))
    // the reachable pre-guard wrap: at depth 1 the Long `expected` for
    // 2^20 x 2^11 is only ~2^28 (inside the Int.MaxValue gate), yet
    // width*height = 2^31 wrapped the pixel-array allocation
    val oneBit = assemble(chunk("IHDR", ihdr(1 << 20, 1 << 11, 1, 0)),
      chunk("IDAT", deflate(new Array[Byte](8))),
      chunk("IEND", Array.emptyByteArray))
    assert(intercept[IllegalArgumentException](PngImage.parse(oneBit))
      .getMessage.contains("pixel budget"))
  }
}

/** Container-independence of the perceptual-hash seam: the SAME
  * synthesized pixels round-tripped through the compressed container
  * (PNG: all five filters, RGBA mix, multi-IDAT) must hash identically
  * to the uncompressed one (BMP) — this is what lets q136/q138 carry a
  * PNG path without a second oracle. */
class PngPhashParitySpec extends SparkSuite {
  test("imageHashesOf(png) equals imageHashesOf(bmp) corpus-wide") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bmp = graft.operators.Multimodal.imageHashesOf(docs, "bmp")
    val png = graft.operators.Multimodal.imageHashesOf(docs, "png")
    assert(bmp.count() > 0)
    assert(bmp.exceptAll(png).isEmpty && png.exceptAll(bmp).isEmpty,
      "phash differs between BMP and PNG containers")
  }
}
