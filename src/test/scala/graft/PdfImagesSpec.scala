package graft

import graft.sources.PdfImages
import graft.sources.PdfImages.PageEnc
import org.scalatest.funsuite.AnyFunSuite

/** PDF embedded-image extraction: round-trips across every filter arm
  * (raw/Flate-gray8/Flate-1bit/DCT/CCITT-G4/CCITT-2D/CCITT-MH/
  * Flate-RGB), container-axis invariance (filter name vs array form;
  * BlackIs1 + /Decode [1 0] vs the default convention), decoy-stream
  * skipping (the per-page content stream has no /Subtype /Image),
  * mixed-arm multi-page documents, and named rejects. The DCT arm
  * uses the r15 block-constant aperture so the lossy codec round-trips
  * bit-exactly and the assertion can be equality, not tolerance. */
class PdfImagesSpec extends AnyFunSuite {

  /** Block-constant bilevel page (8×8 cells, each all-0 or all-255):
    * legal for EVERY arm — bilevel for CCITT/1-bit, block-constant
    * for the exact DCT aperture. */
  private def bilevelPage(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h) { i =>
      val cell = (i % w) / 8 + ((i / w) / 8) * ((w + 7) / 8)
      var z = (seed * 1009 + cell) * 0x9E3779B97F4A7C15L
      z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 32)
      val c = if ((z & 1) == 0) 0 else 255
      (c << 16) | (c << 8) | c
    }

  private def grayPage(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h) { i =>
      val c = ((seed * 31 + i * 7) % 256).toInt
      (c << 16) | (c << 8) | c
    }

  private def rgbPage(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h)(i => ((seed + i) * 0x9E3779B9).toInt & 0xffffff)

  private def assertPixels(img: PdfImages.Img, w: Int, h: Int,
      px: Array[Int], label: String): Unit = {
    assert(img.width == w && img.height == h, s"$label dims")
    var i = 0
    while (i < w * h) {
      assert((img.pixels(i) & 0xffffff) == (px(i) & 0xffffff),
        s"$label pixel $i")
      i += 1
    }
  }

  test("every filter arm round-trips exactly") {
    for (arm <- 0 to 26) {
      val (w, h) = (24, 16)
      val px = arm match {
        case 2 | 4 | 5 | 6 | 11 | 12 | 14 | 15 | 23 | 24 | 25 | 26 =>
          bilevelPage(w, h, arm)
        // block-constant: the exact DCT aperture (gray, YCCK, 4:2:2)
        case 3 | 13 | 19 => bilevelPage(w, h, arm)
        case 7 | 16 => rgbPage(w, h, arm)
        case 9 => rgbPage(w, h, arm).map(_ & 0xc0c0c0) // <= 64 colors
        case _ => grayPage(w, h, arm)
      }
      val pdf = PdfImages.encodePdf(Seq(PageEnc(w, h, px, arm)))
      val imgs = PdfImages.extract(pdf)
      assert(imgs.length == 1, s"arm $arm image count")
      assertPixels(imgs.head, w, h, px, s"arm $arm")
    }
  }

  test("non-byte-multiple widths pad 1-bit rows correctly") {
    for (w <- Seq(9, 15, 17, 23); arm <- Seq(2, 4, 5, 6)) {
      val h = 11
      val px = Array.tabulate(w * h) { i =>
        var z = (i * 2654435761L + w * 97) * 0x9E3779B97F4A7C15L
        z ^= (z >>> 31)
        val c = if ((z & 1) == 0) 0 else 255
        (c << 16) | (c << 8) | c
      }
      val pdf = PdfImages.encodePdf(Seq(PageEnc(w, h, px, arm)))
      assertPixels(PdfImages.extract(pdf).head, w, h, px, s"w=$w arm=$arm")
    }
  }

  test("container axes are pixel-invariant: filter array form, BlackIs1+Decode") {
    val (w, h) = (32, 24)
    val px = bilevelPage(w, h, 7)
    val base = PdfImages.extract(
      PdfImages.encodePdf(Seq(PageEnc(w, h, px, 4)))).head
    for (arr <- Seq(false, true); b1 <- Seq(false, true);
         arm <- Seq(4, 5, 6)) {
      val v = PdfImages.extract(PdfImages.encodePdf(Seq(
        PageEnc(w, h, px, arm, filterAsArray = arr, blackIs1 = b1)))).head
      assert(v.pixels.toSeq == base.pixels.toSeq,
        s"arm=$arm array=$arr blackIs1=$b1 split from the name-form G4 decode")
    }
  }

  test("multi-page mixed-arm document extracts every page in order") {
    for (objStm <- Seq(false, true)) {
      val pages = (0 to 26).map { arm =>
        val px = arm match {
          case 0 | 1 | 8 | 10 | 17 | 18 | 20 | 21 | 22 =>
            grayPage(16, 16, arm + 10)
          case 7 | 16 => rgbPage(16, 16, 3)
          case 9 => rgbPage(16, 16, 5).map(_ & 0xc0c0c0)
          case _ => bilevelPage(16, 16, arm + 20)
        }
        PageEnc(16, 16, px, arm)
      }
      // the ObjStm axis: arm 9/10's indirect colorspace objects travel
      // inside a PDF 1.5 object stream — resolution must be identical
      val imgs = PdfImages.extract(PdfImages.encodePdf(pages, objStm))
      assert(imgs.length == 27, s"objStm=$objStm")
      pages.zip(imgs).zipWithIndex.foreach { case ((p, img), i) =>
        assertPixels(img, 16, 16, p.pixels, s"page $i objStm=$objStm")
      }
    }
  }

  test("predictor arms: width sweep, ignored-predictor guard, named rejects") {
    // widths crossing the bpp/row boundary both for TIFF differencing
    // (arm 16, RGB) and the PNG per-row filters (arm 17, gray)
    for (w <- Seq(1, 2, 9, 23); arm <- Seq(16, 17)) {
      val h = 7
      val px = if (arm == 16) rgbPage(w, h, w + arm) else grayPage(w, h, w)
      val pdf = PdfImages.encodePdf(Seq(PageEnc(w, h, px, arm)))
      assertPixels(PdfImages.extract(pdf).head, w, h, px, s"arm=$arm w=$w")
    }
    // the r19 advisor hole: a TIFF-predicted stream whose /Predictor
    // entry is DROPPED is length-preserving — decode must differ from
    // the true pixels only because the predictor was applied (i.e. the
    // engine does not ignore /Predictor)
    val (w, h) = (16, 8)
    val px = rgbPage(w, h, 3)
    val s = new String(PdfImages.encodePdf(Seq(PageEnc(w, h, px, 16))),
      "ISO-8859-1")
    val dropped = s.replace("/Predictor 2 ", "")
    val raw = PdfImages.extract(dropped.getBytes("ISO-8859-1")).head
    assert(!raw.pixels.sameElements(
      PdfImages.extract(s.getBytes("ISO-8859-1")).head.pixels),
      "predictor had no effect — /Predictor is being ignored")
    // unsupported predictor value is a named reject
    val bad = s.replace("/Predictor 2 ", "/Predictor 3 ")
    val e = intercept[IllegalArgumentException] {
      PdfImages.extract(bad.getBytes("ISO-8859-1"))
    }
    assert(e.getMessage.contains("/Predictor 3"))
    // a predictor /Columns lie is a named reject, not silent garbage
    val lied = s.replace(s"/Columns $w", s"/Columns ${w + 1}")
    val e2 = intercept[IllegalArgumentException] {
      PdfImages.extract(lied.getBytes("ISO-8859-1"))
    }
    assert(e2.getMessage.contains("/Columns"))
  }

  test("inline images: rotation, multi-frame streams, false positives, rejects") {
    // the inline arm under the /Rotate axis (rotation resolves via
    // /Contents, not /XObject)
    for (rot <- Seq(0, 90, 180, 270)) {
      val (w, h) = (24, 16)
      val px = grayPage(w, h, rot + 5)
      val pdf = PdfImages.encodePdf(Seq(PageEnc(w, h, px, 18, rotate = rot)))
      assertPixels(PdfImages.extract(pdf).head, w, h, px, s"inline rot=$rot")
    }
    // a binary stream containing the letters "BI" must not be read as
    // an inline image (frame validation: /W //H must parse)
    val decoy = ("%PDF-1.4\n1 0 obj\n<< /Length 20 >>\nstream\n" +
      "xx BI not an image EI\nendstream\nendobj\n%%EOF")
      .getBytes("ISO-8859-1")
    assert(PdfImages.extract(decoy).isEmpty)
    // two inline images in ONE content stream both extract, in order
    val (w, h) = (8, 8)
    val px1 = grayPage(w, h, 1); val px2 = grayPage(w, h, 2)
    def flate(px: Array[Int]): String = {
      val d = new java.util.zip.Deflater()
      d.setInput(px.map(p => (p & 0xff).toByte)); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      new String(out.toByteArray, "ISO-8859-1")
    }
    val content = s"q BI /W $w /H $h /BPC 8 /CS /G /F /Fl ID\n${flate(px1)}" +
      s"\nEI Q q BI /W $w /H $h /BPC 8 /CS /G /F /Fl ID\n${flate(px2)}\nEI Q"
    val doc = (s"%PDF-1.4\n1 0 obj\n<< /Length ${content.length} >>\n" +
      s"stream\n$content\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val two = PdfImages.extract(doc)
    assert(two.length == 2)
    assertPixels(two(0), w, h, px1, "inline 1")
    assertPixels(two(1), w, h, px2, "inline 2")
    // named rejects with per-image isolation: an unsupported inline
    // filter on page 2 must not hide page 1's XObject image
    val goodPx = grayPage(w, h, 3)
    val s0 = new String(PdfImages.encodePdf(Seq(
      PageEnc(w, h, goodPx, 1), PageEnc(w, h, grayPage(w, h, 4), 18))),
      "ISO-8859-1")
    val badFilter = s0.replace("/F /Fl ID", "/F /DCT ID")
    val (okImgs, rejects) = PdfImages.extractWithRejects(
      badFilter.getBytes("ISO-8859-1"))
    assert(okImgs.length == 1 && rejects.length == 1)
    assert(rejects.head.contains("unsupported inline image filter /DCT"))
    assertPixels(okImgs.head, w, h, goodPx, "surviving XObject page")
    // a missing EI terminator is a named reject, not silent garbage
    val noEi = s0.replace("\nEI Q", "\nXX Q")
    val (_, rej2) = PdfImages.extractWithRejects(noEi.getBytes("ISO-8859-1"))
    assert(rej2.exists(_.contains("not terminated by EI")), rej2.toString)
  }

  test("a non-right-angle /Rotate quarantines per image, not per document") {
    // page 1 rotated 45 degrees (occurs in the wild), page 2 clean:
    // the clean page must still extract (the S9 isolation contract)
    val px1 = grayPage(8, 8, 1); val px2 = grayPage(8, 8, 2)
    val pdf = new String(PdfImages.encodePdf(Seq(
      PageEnc(8, 8, px1, 1, rotate = 90), PageEnc(8, 8, px2, 1))),
      "ISO-8859-1")
    val bent = pdf.replace("/Rotate 90", "/Rotate 45")
    val (imgs, rejects) = PdfImages.extractWithRejects(
      bent.getBytes("ISO-8859-1"))
    assert(rejects.length == 1 && rejects.head.contains("not a right angle"))
    assert(imgs.length == 1)
    assertPixels(imgs.head, 8, 8, px2, "surviving page")
  }

  test("page /Rotate normalizes to the upright face across arms") {
    // the scanner shape: the image is STORED sideways and the page
    // carries the compensating clockwise display rotation — extraction
    // must return the upright pixels (the TIFF tag-274 posture)
    val (w, h) = (24, 16) // non-square so a missed transpose is loud
    for (rot <- Seq(0, 90, 180, 270); arm <- Seq(1, 4, 12)) {
      val px = bilevelPage(w, h, rot + arm)
      val pdf = PdfImages.encodePdf(Seq(PageEnc(w, h, px, arm, rotate = rot)))
      if (rot != 0)
        assert(new String(pdf, "ISO-8859-1").contains(s"/Rotate $rot"))
      assertPixels(PdfImages.extract(pdf).head, w, h, px,
        s"rot=$rot arm=$arm")
    }
    // a negative/mod-360 rotation value normalizes like a reader would
    val px = bilevelPage(w, h, 5)
    val pdf = new String(PdfImages.encodePdf(
      Seq(PageEnc(w, h, px, 1, rotate = 90))), "ISO-8859-1")
    val neg = pdf.replace("/Rotate 90", "/Rotate -270") // same display
    assertPixels(PdfImages.extract(neg.getBytes("ISO-8859-1")).head,
      w, h, px, "rot=-270")
  }

  test("a PDF with text streams but no images yields an empty set") {
    val textPdf = ("%PDF-1.4\n1 0 obj\n<< /Length 44 >>\nstream\n" +
      "BT /F1 12 Tf 72 712 Td (Hello world) Tj ET\nstream-free\nendstream\nendobj\n" +
      "%%EOF").getBytes("ISO-8859-1")
    assert(PdfImages.extract(textPdf).isEmpty)
  }

  test("named rejects: unsupported filter, geometry mismatch, bad flate") {
    val px = grayPage(8, 8, 1)
    val pdf = PdfImages.encodePdf(Seq(PageEnc(8, 8, px, 1)))
    val s = new String(pdf, "ISO-8859-1")
    // unsupported filter name (round 20: LZW decodes now — JPEG2000
    // is the named-reject representative)
    val jpx = s.replace("/Filter /FlateDecode", "/Filter /JPXDecode ")
    val e1 = intercept[IllegalArgumentException] {
      PdfImages.extract(jpx.getBytes("ISO-8859-1"))
    }
    assert(e1.getMessage.contains("unsupported image filter"))
    // dict geometry no longer matches the payload raster
    val wrongW = s.replace("/Width 8", "/Width 9")
      .replace("/Columns 8", "/Columns 9")
    intercept[IllegalArgumentException] {
      PdfImages.extract(wrongW.getBytes("ISO-8859-1"))
    }
    // CCITT K=0 with neither EncodedByteAlign nor EndOfLine
    val ccitt = new String(PdfImages.encodePdf(
      Seq(PageEnc(8, 8, bilevelPage(8, 8, 2), 6))), "ISO-8859-1")
    val unframed = ccitt.replace(" /EncodedByteAlign true", "")
    val e2 = intercept[IllegalArgumentException] {
      PdfImages.extract(unframed.getBytes("ISO-8859-1"))
    }
    assert(e2.getMessage.contains("K=0"))
  }

  test("DCT arm dims must match the dict") {
    val px = bilevelPage(16, 16, 3)
    val pdf = new String(PdfImages.encodePdf(Seq(PageEnc(16, 16, px, 3))),
      "ISO-8859-1")
    val lied = pdf.replace("/Width 16", "/Width 24")
    val e = intercept[IllegalArgumentException] {
      PdfImages.extract(lied.getBytes("ISO-8859-1"))
    }
    assert(e.getMessage.contains("DCT geometry"))
  }
}
