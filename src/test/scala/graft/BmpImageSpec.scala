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
    // unsupported bit depth (8-bit palette)
    intercept[IllegalArgumentException](BmpImage.parse(corrupt(28, 8)))
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
}
