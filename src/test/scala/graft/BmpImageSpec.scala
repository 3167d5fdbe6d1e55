package graft

import graft.sources.BmpImage
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM BMP codec against hand-built byte vectors — the
  * WavAudioSpec discipline for the image half of the multimodal decode:
  * exact pixel recovery through both storage orientations, row padding
  * built byte-by-byte (not via the encoder under test), and loud
  * rejection of malformed containers. */
class BmpImageSpec extends AnyFunSuite {

  test("24-bit round-trip recovers every pixel, both orientations") {
    val (w, h) = (5, 3) // stride 16 = 15 data + 1 pad byte per row
    val px = Array.tabulate(w * h)(i => (i * 0x010203 + 0x102030) & 0xffffff)
    for (topDown <- Seq(false, true)) {
      val bmp = BmpImage.parse(BmpImage.encode24(w, h, px, topDown))
      assert(bmp.width == w && bmp.height == h)
      assert(bmp.topDown == topDown)
      assert(bmp.pixels.toSeq == px.toSeq,
        s"pixel mismatch for topDown=$topDown")
    }
  }

  test("hand-built bottom-up BMP with padding decodes top-down") {
    // 2x2, stride 8 (6 data + 2 pad); storage rows BOTTOM-UP with
    // nonzero pad bytes that must be ignored. API pixel (0,0) is the
    // TOP-left, i.e. the LAST storage row's first pixel.
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + 16)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // storage row 0 = API bottom row: pixels (B,G,R) then junk pad
    bb.put(Array[Byte](1, 2, 3, 4, 5, 6, 99.toByte, 98.toByte))
    // storage row 1 = API top row
    bb.put(Array[Byte](7, 8, 9, 10, 11, 12, 97.toByte, 96.toByte))
    val bmp = BmpImage.parse(
      java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(bmp.width == 2 && bmp.height == 2 && !bmp.topDown)
    // BGR in storage → 0xRRGGBB in API
    assert(bmp.pixel(0, 0) == 0x090807)
    assert(bmp.pixel(1, 0) == 0x0c0b0a)
    assert(bmp.pixel(0, 1) == 0x030201)
    assert(bmp.pixel(1, 1) == 0x060504)
  }

  test("malformed containers are rejected loudly") {
    val good = BmpImage.encode24(3, 2, Array.fill(6)(0x123456))
    def corrupt(off: Int, value: Byte): Array[Byte] = {
      val c = good.clone(); c(off) = value; c
    }
    // bad magic
    intercept[IllegalArgumentException](BmpImage.parse(corrupt(0, 'X')))
    // truncated mid-pixel-array
    intercept[IllegalArgumentException](
      BmpImage.parse(java.util.Arrays.copyOf(good, good.length - 3)))
    // not even header-sized
    intercept[IllegalArgumentException](
      BmpImage.parse(Array[Byte]('B', 'M', 1, 2)))
    // bpp patched to 8 on a 24-bit file: since round 16 8-bit IS
    // supported, the reject moves to the color-table gate (a 256-entry
    // default table cannot fit before dataOff = 54)
    assert(intercept[IllegalArgumentException](
      BmpImage.parse(corrupt(28, 8)))
      .getMessage.contains("color table"))
    // compressed (BI_RLE8)
    intercept[IllegalArgumentException](BmpImage.parse(corrupt(30, 1)))
    // OS/2 BITMAPCOREHEADER size
    intercept[IllegalArgumentException](BmpImage.parse(corrupt(14, 12)))
    // zero width
    val zw = good.clone()
    zw(18) = 0; zw(19) = 0; zw(20) = 0; zw(21) = 0
    intercept[IllegalArgumentException](BmpImage.parse(zw))
    // declared file size below the pixel-array end
    val small = good.clone()
    small(2) = 10; small(3) = 0; small(4) = 0; small(5) = 0
    intercept[IllegalArgumentException](BmpImage.parse(small))
  }

  test("pixel offset may skip extra gap bytes before the array") {
    // dataOff > 54 is legal (palettes/gaps live there); parser must
    // honor the declared offset, not assume 54
    val base = BmpImage.encode24(2, 1, Array(0xaabbcc, 0x112233))
    val gap = 8
    val out = java.nio.ByteBuffer.allocate(base.length + gap)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(base, 0, 54)
    out.put(Array.fill(gap)(0x7f.toByte)) // junk gap
    out.put(base, 54, base.length - 54)
    val bytes = out.array()
    // patch file size and data offset
    def put32(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xff).toByte; bytes(off + 1) = ((v >> 8) & 0xff).toByte
      bytes(off + 2) = ((v >> 16) & 0xff).toByte
      bytes(off + 3) = ((v >> 24) & 0xff).toByte
    }
    put32(2, bytes.length)
    put32(10, 54 + gap)
    val bmp = BmpImage.parse(bytes)
    assert(bmp.pixels.toSeq == Seq(0xaabbcc, 0x112233))
  }

  test("8-bit palette round-trips: both row orders, stride residues") {
    val rnd = new scala.util.Random(561)
    for (t <- 0 until 25) {
      val w = 1 + rnd.nextInt(17) // sweeps stride padding 0..3
      val h = 1 + rnd.nextInt(9)
      val nPal = 1 + rnd.nextInt(256)
      val pal = Array.fill(nPal)(rnd.nextInt() & 0xffffff)
      val idx = Array.fill(w * h)(rnd.nextInt(nPal))
      val topDown = t % 2 == 0
      val b = BmpImage.parse(BmpImage.encode8(w, h, idx, pal, topDown))
      assert(b.width == w && b.height == h && b.topDown == topDown)
      for (k <- 0 until w * h)
        assert(b.pixels(k) == pal(idx(k)),
          s"palette mismatch at $k (t=$t ${w}x$h topDown=$topDown)")
    }
  }

  test("8-bit palette: ImageIO parity in both directions") {
    import javax.imageio.ImageIO
    val rnd = new scala.util.Random(661)
    for (t <- 0 until 12) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(12)
      val nPal = 2 + rnd.nextInt(254)
      val pal = Array.fill(nPal)(rnd.nextInt() & 0xffffff)
      val idx = Array.fill(w * h)(rnd.nextInt(nPal))
      // forward: our 8-bit container through the JDK reader
      val bytes = BmpImage.encode8(w, h, idx, pal, topDown = t % 2 == 1)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == pal(idx(y * w + x)),
          s"ImageIO disagrees at ($x,$y) t=$t")
      // reverse: a JDK-WRITTEN indexed BMP decodes through our parser
      val cm = new java.awt.image.IndexColorModel(8, nPal,
        pal.map(p => ((p >> 16) & 0xff).toByte),
        pal.map(p => ((p >> 8) & 0xff).toByte),
        pal.map(p => (p & 0xff).toByte))
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w)
        bi.getRaster.setSample(x, y, 0, idx(y * w + x))
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(bi, "bmp", bos))
      val ours = BmpImage.parse(bos.toByteArray)
      assert(ours.width == w && ours.height == h)
      for (k <- 0 until w * h)
        assert(ours.pixels(k) == pal(idx(k)),
          s"JDK-written indexed BMP mismatch at $k (t=$t)")
    }
  }

  test("8-bit palette gates: short tables, oversized biClrUsed, overlap") {
    val pal = Array(0x111111, 0x222222, 0x333333, 0x444444)
    val good = BmpImage.encode8(3, 2, Array(0, 1, 2, 3, 0, 1), pal)
    assert(BmpImage.parse(good).pixels(3) == 0x444444) // sanity
    // biClrUsed shrunk to 2: indices 2/3 must reject by name, and the
    // pixel offset keeps pointing past the ORIGINAL table so only the
    // index gate can fire
    val shrunk = good.clone(); shrunk(46) = 2
    assert(intercept[IllegalArgumentException](BmpImage.parse(shrunk))
      .getMessage.contains("palette index"))
    // biClrUsed above 256
    val big = good.clone(); big(47) = 1 // 258
    assert(intercept[IllegalArgumentException](BmpImage.parse(big))
      .getMessage.contains("biClrUsed"))
    // color table overrunning the pixel offset (biClrUsed raised past
    // the written table)
    val over = good.clone(); over(46) = 200.toByte
    assert(intercept[IllegalArgumentException](BmpImage.parse(over))
      .getMessage.contains("color table"))
  }

  test("pixel budget: dims whose product wraps Int are a named reject") {
    // width/height each inside the per-dim cap, product 2^31 — the
    // allocation must never be reached (advisor r17, TIFF find applied
    // family-wide)
    val good = BmpImage.encode24(4, 4, Array.fill(16)(0x336699))
    val bad = good.clone()
    def putI32(off: Int, v: Int): Unit = {
      bad(off) = (v & 0xff).toByte; bad(off + 1) = ((v >> 8) & 0xff).toByte
      bad(off + 2) = ((v >> 16) & 0xff).toByte
      bad(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putI32(18, 1 << 20); putI32(22, 2048)
    assert(intercept[IllegalArgumentException](BmpImage.parse(bad))
      .getMessage.contains("pixel budget"))
  }
}
