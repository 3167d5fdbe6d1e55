package graft

import graft.sources.{BmpImage, GifImage, JpegImage, MediaCodec, PngImage}
import org.scalatest.funsuite.AnyFunSuite

/** Container sniffing + unified dispatch: every codec's output routes
  * to the right decoder by magic bytes alone, mislabeled/truncated
  * bytes land in named errors, and the dispatched face equals the
  * direct decoder's face exactly. */
class MediaCodecSpec extends AnyFunSuite {

  private val px = Array.tabulate(12)(i => (i * 37) & 0xffffff)

  test("sniff identifies every container from magic bytes") {
    assert(MediaCodec.sniff(PngImage.encode(4, 3, px)) == "png")
    assert(MediaCodec.sniff(GifImage.encode(4, 3,
      Array.fill(12)(0), Array(0xff123456))) == "gif")
    assert(MediaCodec.sniff(BmpImage.encode24(4, 3, px,
      topDown = true)) == "bmp")
    assert(MediaCodec.sniff(JpegImage.encode(4, 3,
      Array.fill(12)(70), grayscale = true)) == "jpeg")
    assert(MediaCodec.sniff(graft.sources.TiffImage.encode(4, 3, px))
      == "tiff")
    assert(MediaCodec.sniff(graft.sources.TiffImage.encode(4, 3, px,
      bigEndian = true)) == "tiff")
    // an Exif JPEG embeds a TIFF payload but must still sniff as jpeg
    assert(MediaCodec.sniff(JpegImage.withExif(
      JpegImage.encode(8, 8, Array.fill(64)(50), grayscale = true), 3,
      bigEndian = true)) == "jpeg")
    assert(MediaCodec.sniff("plain text".getBytes("UTF-8")) == "unknown")
    assert(MediaCodec.sniff(Array.emptyByteArray) == "unknown")
    // near misses: a PNG signature with one wrong byte; GIF90a
    val p = PngImage.encode(4, 3, px); p(5) = 'X'.toByte
    assert(MediaCodec.sniff(p) == "unknown")
    assert(MediaCodec.sniff("GIF90a".getBytes("US-ASCII")) == "unknown")
  }

  test("dispatch face normalizes EXIF orientation to the upright image") {
    // canonical 16×8, two block-constant tiles (exact JPEG aperture):
    // left tile 40, right tile 200 — stored rotated under o=6 (8×16),
    // both dispatch faces must hand back the upright 16×8 canon
    val canon = Array.tabulate(16 * 8)(i => if (i % 16 < 8) 40 else 200)
    val (sw, sh, stored) = JpegImage.exifStore(6, 16, 8, canon)
    assert((sw, sh) == (8, 16))
    val bytes = JpegImage.withExif(
      JpegImage.encode(sw, sh, stored, grayscale = true), 6,
      bigEndian = true)
    val m = MediaCodec.decodeImage(bytes)
    assert(m.container == "jpeg" && m.width == 16 && m.height == 8)
    assert(m.pixels.map(_ & 0xff).toSeq == canon.toSeq)
    val MediaCodec.ImageItem("jpeg", w, h, px2) = MediaCodec.decodeMedia(bytes)
    assert(w == 16 && h == 8 && px2.map(_ & 0xff).toSeq == canon.toSeq)
    // EXIF-less JPEGs are untouched (orientation defaults to 1)
    val plain = JpegImage.encode(16, 8, canon, grayscale = true)
    assert(MediaCodec.decodeImage(plain).pixels.toSeq ==
      JpegImage.parse(plain).pixels.toSeq)
  }

  test("TIFF routes through both dispatch faces, orientation-normalized") {
    import graft.sources.TiffImage
    val canon = Array.tabulate(6 * 4)(i => ((i * 41 + 7) % 256) * 0x010101)
    val (sw, sh, stored) = JpegImage.exifStore(8, 6, 4, canon)
    val bytes = TiffImage.encode(sw, sh, stored, photometric = 2,
      compression = 32773, orientation = 8, bigEndian = true)
    val m = MediaCodec.decodeImage(bytes)
    assert(m.container == "tiff" && m.width == 6 && m.height == 4)
    assert(m.pixels.map(_ & 0xffffff).toSeq == canon.toSeq)
    assert(m.pixels.forall(p => (p >>> 24) == 0xff)) // opaque face
    val MediaCodec.ImageItem("tiff", w2, h2, px2) = MediaCodec.decodeMedia(bytes)
    assert(w2 == 6 && h2 == 4 && px2.map(_ & 0xffffff).toSeq == canon.toSeq)
    // a MULTI-page TIFF at the single-image faces is a NAMED
    // quarantine row, never a silent first-page decode
    val multi = TiffImage.encodePages(Seq(
      TiffImage.Page(4, 3, Array.fill(12)(7), photometric = 1),
      TiffImage.Page(4, 3, Array.fill(12)(9), photometric = 1)))
    assert(MediaCodec.sniff(multi) == "tiff")
    assert(intercept[IllegalArgumentException](MediaCodec.decodeImage(multi))
      .getMessage.contains("multi-page"))
    assert(intercept[IllegalArgumentException](MediaCodec.decodeMedia(multi))
      .getMessage.contains("multi-page"))
  }

  test("dispatch equals the direct decoder, face-normalized") {
    val png = PngImage.encode(4, 3, px)
    assert(MediaCodec.decodeImage(png).pixels.toSeq ==
      PngImage.parse(png).pixels.toSeq)
    val bmp = BmpImage.encode24(4, 3, px, topDown = false)
    assert(MediaCodec.decodeImage(bmp).pixels.toSeq ==
      BmpImage.parse(bmp).pixels.map(0xff000000 | _).toSeq)
    val gif = GifImage.encode(3, 4, Array.tabulate(12)(_ % 5),
      Array.tabulate(5)(j => 0xff000000 | (j * 0x224466)))
    assert(MediaCodec.decodeImage(gif).container == "gif")
    assert(MediaCodec.decodeImage(gif).pixels.toSeq ==
      GifImage.parse(gif).pixels.toSeq)
    val jpg = JpegImage.encode(8, 8, Array.fill(64)(0x55), grayscale = true)
    assert(MediaCodec.decodeImage(jpg).pixels.toSeq ==
      JpegImage.parse(jpg).pixels.toSeq)
  }

  test("quarantine classes carry their own named errors") {
    // unknown container
    assert(intercept[IllegalArgumentException](
      MediaCodec.decodeImage("not an image".getBytes("UTF-8")))
      .getMessage.contains("unknown container"))
    // a KNOWN container, damaged: the family's own strict error
    // surfaces (so triage can distinguish "unknown" from "broken png")
    val png = PngImage.encode(4, 3, px)
    val cut = java.util.Arrays.copyOf(png, png.length - 4)
    val e = intercept[IllegalArgumentException](MediaCodec.decodeImage(cut))
    assert(!e.getMessage.contains("unknown container"))
  }
}
