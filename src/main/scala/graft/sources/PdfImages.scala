package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}

/** Embedded-image extraction from PDF files — the image half of the
  * reference's scanned-document corpus shape (its 51 label PDFs are
  * re-scanned pages whose content is carried as image XObjects;
  * /root/reference/epa_ingestion.py:763-764's PARSE_DOCUMENT LAYOUT
  * mode covers such image-bearing pages). [[PdfText]] owns the text
  * half; this object walks the same raw object structure for stream
  * objects with `/Subtype /Image` (ISO 32000-1 §8.9.5) and decodes the
  * three filters scanned PDFs actually use — all through codecs the
  * engine already owns:
  *
  *  - `/DCTDecode`       → [[JpegImage]] (the house baseline decoder)
  *  - `/CCITTFaxDecode`  → [[CcittCodec]] (T.4/T.6, K<0 / K=0 / K>0
  *                          mapped per §7.4.6 Table 11, BlackIs1 and
  *                          EncodedByteAlign honored)
  *  - `/FlateDecode`     → java.util.zip (1- and 8-bit gray, 8-bit
  *                          RGB raster rows, byte-padded per §8.9.3)
  *
  * plus unfiltered raw samples. Per-image decoding is STRICT (the
  * q139/q164 posture: geometry, payload length and filter framing must
  * all agree — a dented image is a named IllegalArgumentException, so
  * the dedup lane upstream can quarantine the document rather than
  * hash garbage). The container walk itself honors `/Length` when the
  * dict states it inline (binary payloads may contain `endstream`
  * look-alikes; a stated length sidesteps the token scan) and falls
  * back to the token scan otherwise — the same tolerance
  * [[PdfText.extract]] applies.
  *
  * The encoder half ([[encodePdf]]) is the generator for specs, fuzz
  * and the q176 fixture: a minimal but structurally real PDF (catalog,
  * page tree, per-page content stream drawing the image — a stream
  * object with NO /Subtype /Image, so the walk's skip branch is always
  * exercised — image XObject, xref table, trailer).
  */
object PdfImages {

  /** Decoded embedded image: 0xAARRGGBB face, [[JpegImage.Jpeg]]
    * parity (alpha 0xff, gray decodes R = G = B). */
  final case class Img(width: Int, height: Int, pixels: Array[Int])

  /** Filter arms for [[encodePdf]] — one embedded image per page.
    * `pixels` are 0xRRGGBB; gray arms read the low byte; bilevel arms
    * (CCITT, 1-bit Flate) require every pixel 0 or 255 gray.
    *
    * filter: 0 = raw 8-bit gray, 1 = Flate 8-bit gray, 2 = Flate
    * 1-bit gray, 3 = DCTDecode (gray JPEG), 4 = CCITT G4 (K = −1),
    * 5 = CCITT T.4 2D (K > 0), 6 = CCITT MH (K = 0, EncodedByteAlign),
    * 7 = Flate 8-bit RGB.
    *
    * `filterAsArray` writes `/Filter [/X]` + `/DecodeParms [<<…>>]`
    * (the array singleton form, §7.4) instead of the name form;
    * `blackIs1` flips the CCITT sample convention and writes the
    * compensating `/Decode [1 0]` so decoded pixels are IDENTICAL
    * either way — a pure container axis. */
  final case class PageEnc(width: Int, height: Int, pixels: Array[Int],
      filter: Int, filterAsArray: Boolean = false, blackIs1: Boolean = false)

  private val MaxInflatedBytes = 64 << 20

  // ------------------------------------------------------------ decode

  /** Extract every image XObject, in object-number order (the dedup
    * lane consumes the page set, so document order beyond determinism
    * is immaterial). Strict per image; a PDF with no images yields an
    * empty Seq. */
  def extract(pdf: Array[Byte]): Seq[Img] = {
    require(pdf != null && pdf.length >= 8, "not a PDF: too short")
    val whole = new String(pdf, ISO_8859_1)
    objectStreams(whole).flatMap { case (dict, payload) =>
      if (!ImageSubtype.findFirstIn(dict).isDefined) None
      else Some(decodeImageObject(dict, payload))
    }
  }

  private val ImageSubtype = """/Subtype\s*/Image\b""".r
  private val ObjHdr = """(\d{1,7})\s+(\d+)\s+obj\b""".r
  private val IntKey = """\s+(\d{1,9})""" // after a /Name
  private val FilterName =
    """/Filter\s*(?:\[\s*)?/([A-Za-z0-9]+)""".r
  private val DecodeArr =
    """/Decode\s*\[\s*([0-9.]+)\s+([0-9.]+)\s*\]""".r

  /** Sequential scan for `N G obj` headers; for each stream object
    * returns (dict text, payload bytes as ISO-8859-1 chars). The
    * payload end comes from an inline /Length when it verifiably lands
    * on `endstream` (optional EOL first), else the token scan. */
  private def objectStreams(whole: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var pos = 0
    var m = ObjHdr.findFirstMatchIn(whole.substring(pos))
    while (m.isDefined) {
      val hdrEnd = pos + m.get.end
      val streamAt = whole.indexOf("stream", hdrEnd)
      val endobjAt = whole.indexOf("endobj", hdrEnd)
      if (endobjAt >= 0 && (streamAt < 0 || endobjAt < streamAt)) {
        pos = endobjAt + "endobj".length // plain object: no stream
      } else if (streamAt < 0) {
        pos = whole.length
      } else {
        val dict = whole.substring(hdrEnd, streamAt)
        var ds = streamAt + "stream".length
        if (ds < whole.length && whole.charAt(ds) == '\r') ds += 1
        if (ds < whole.length && whole.charAt(ds) == '\n') ds += 1
        val stated = intAfter(dict, "/Length")
        val de: Int =
          if (stated >= 0 && ds + stated <= whole.length &&
              atEndstream(whole, ds + stated)) ds + stated
          else {
            val e = whole.indexOf("endstream", ds)
            require(e >= 0, "stream without endstream")
            var t = e
            while (t > ds && (whole.charAt(t - 1) == '\n' ||
              whole.charAt(t - 1) == '\r')) t -= 1
            t
          }
        out += ((dict, whole.substring(ds, de)))
        val after = whole.indexOf("endstream", de)
        pos = if (after < 0) whole.length else after + "endstream".length
      }
      m = if (pos < whole.length)
        ObjHdr.findFirstMatchIn(whole.substring(pos)) else None
    }
    out.result()
  }

  private def atEndstream(whole: String, at: Int): Boolean = {
    var i = at
    while (i < whole.length && i < at + 2 &&
      (whole.charAt(i) == '\r' || whole.charAt(i) == '\n')) i += 1
    whole.startsWith("endstream", i)
  }

  private def intAfter(dict: String, key: String): Int =
    (java.util.regex.Pattern.quote(key) + IntKey).r
      .findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(-1)

  private def boolAfter(dict: String, key: String): Boolean =
    (java.util.regex.Pattern.quote(key) + """\s+true""").r
      .findFirstIn(dict).isDefined

  private def decodeImageObject(dict: String, payloadS: String): Img = {
    val w = intAfter(dict, "/Width")
    val h = intAfter(dict, "/Height")
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"bad image geometry ${w}x$h")
    val bpc = math.max(intAfter(dict, "/BitsPerComponent"), 1)
    val gray = dict.contains("/DeviceGray")
    val rgb = dict.contains("/DeviceRGB")
    val filter = FilterName.findFirstMatchIn(dict).map(_.group(1))
    val payload = payloadS.getBytes(ISO_8859_1)
    val pixels: Array[Int] = filter match {
      case Some("DCTDecode") =>
        val j = JpegImage.parse(payload)
        require(j.width == w && j.height == h,
          s"DCT geometry ${j.width}x${j.height} != dict ${w}x$h")
        return Img(w, h, j.pixels)
      case Some("CCITTFaxDecode") => decodeCcitt(dict, payload, w, h)
      case Some("FlateDecode") =>
        rasterPixels(inflateStrict(payload), w, h, bpc, gray, rgb, dict)
      case None =>
        rasterPixels(payload, w, h, bpc, gray, rgb, dict)
      case Some(f) =>
        throw new IllegalArgumentException(s"unsupported image filter /$f")
    }
    Img(w, h, pixels)
  }

  /** §7.4.6 Table 11: K < 0 → pure T.6 (G4); K > 0 → T.4 mixed 2D;
    * K = 0 → one-dimensional — with EncodedByteAlign the rows are
    * byte-aligned MH, with EndOfLine they are EOL-framed T.4 1D; the
    * unaligned/unframed combination is a named reject (no real scanner
    * emits it and there is no resynchronization point to trust).
    * BlackIs1 controls the sample value for black (§7.4.6); the
    * optional /Decode array then maps samples to gray per §8.9.5.2. */
  private def decodeCcitt(dict: String, payload: Array[Byte],
      w: Int, h: Int): Array[Int] = {
    val k = { val v = intAfter(dict, "/K")
      if (v >= 0) v
      else if (dict.contains("/K -")) -1
      else 0 }
    val cols = { val c = intAfter(dict, "/Columns"); if (c > 0) c else 1728 }
    require(cols == w, s"CCITT /Columns $cols != /Width $w")
    val rows = { val r = intAfter(dict, "/Rows"); if (r > 0) r else h }
    require(rows == h, s"CCITT /Rows $rows != /Height $h")
    val byteAlign = boolAfter(dict, "/EncodedByteAlign")
    val eol = boolAfter(dict, "/EndOfLine")
    val blackIs1 = boolAfter(dict, "/BlackIs1")
    val bw: Array[Byte] = // 0 = white, 1 = black
      if (k < 0) CcittCodec.decode(payload, 0, payload.length, w, h, 4)
      else if (k > 0)
        CcittCodec.decode(payload, 0, payload.length, w, h, 3, t4TwoD = true)
      else if (byteAlign)
        CcittCodec.decode(payload, 0, payload.length, w, h, 2)
      else if (eol)
        CcittCodec.decode(payload, 0, payload.length, w, h, 3)
      else throw new IllegalArgumentException(
        "CCITT K=0 without EncodedByteAlign or EndOfLine")
    val (d0, d1) = DecodeArr.findFirstMatchIn(dict)
      .map(m => (m.group(1).toDouble, m.group(2).toDouble))
      .getOrElse((0.0, 1.0))
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      val sample = if (bw(i) == 1) { if (blackIs1) 1 else 0 }
                   else { if (blackIs1) 0 else 1 }
      val g = math.round((if (sample == 0) d0 else d1) * 255).toInt
      out(i) = 0xff000000 | (g << 16) | (g << 8) | g
      i += 1
    }
    out
  }

  /** Raw raster samples → pixels: rows are byte-padded (§8.9.3), bits
    * MSB-first. Supported: 1/8-bit DeviceGray, 8-bit DeviceRGB. */
  private def rasterPixels(data: Array[Byte], w: Int, h: Int, bpc: Int,
      gray: Boolean, rgb: Boolean, dict: String): Array[Int] = {
    val out = new Array[Int](w * h)
    if (gray && bpc == 8) {
      require(data.length == w * h, s"gray8 payload ${data.length} != ${w * h}")
      var i = 0
      while (i < out.length) {
        val g = data(i) & 0xff
        out(i) = 0xff000000 | (g << 16) | (g << 8) | g
        i += 1
      }
    } else if (gray && bpc == 1) {
      val rowBytes = (w + 7) / 8
      require(data.length == rowBytes * h,
        s"gray1 payload ${data.length} != ${rowBytes * h}")
      val (d0, d1) = DecodeArr.findFirstMatchIn(dict)
        .map(m => (m.group(1).toDouble, m.group(2).toDouble))
        .getOrElse((0.0, 1.0))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bit = (data(y * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
          val g = math.round((if (bit == 0) d0 else d1) * 255).toInt
          out(y * w + x) = 0xff000000 | (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else if (rgb && bpc == 8) {
      require(data.length == 3 * w * h,
        s"rgb8 payload ${data.length} != ${3 * w * h}")
      var i = 0
      while (i < out.length) {
        out(i) = 0xff000000 | ((data(3 * i) & 0xff) << 16) |
          ((data(3 * i + 1) & 0xff) << 8) | (data(3 * i + 2) & 0xff)
        i += 1
      }
    } else throw new IllegalArgumentException(
      s"unsupported raster shape bpc=$bpc gray=$gray rgb=$rgb")
    out
  }

  /** Strict full inflate: the stream must terminate and fit the bomb
    * cap (unlike [[PdfText]]'s tolerant text path, an image raster has
    * an exact expected size — partial output is a defect). */
  private def inflateStrict(b: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(b)
    val out = new ByteArrayOutputStream(math.min(math.max(b.length * 4, 1024), 1 << 20))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = try inf.inflate(buf) catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(s"bad Flate data: ${e.getMessage}")
        }
        require(n > 0 || inf.finished(), "truncated Flate stream")
        require(out.size() + n <= MaxInflatedBytes, "Flate output over cap")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  // ------------------------------------------------------------ encode

  /** Encode one image per page into a structurally real PDF (header,
    * catalog, page tree, content stream per page, image XObjects,
    * xref, trailer). Deterministic: the same pages yield the same
    * bytes. */
  def encodePdf(pages: Seq[PageEnc]): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def bytes(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def obj(body: String): Unit = {
      offsets += out.size()
      bytes(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    def streamObj(dict: String, payload: Array[Byte]): Unit = {
      offsets += out.size()
      bytes(s"${offsets.length} 0 obj\n<< $dict /Length ${payload.length} >>\nstream\n")
      out.write(payload)
      bytes("\nendstream\nendobj\n")
    }
    bytes("%PDF-1.4\n%âãÏÓ\n")
    val n = pages.length
    // objects: 1 catalog, 2 pages, then per page i: 3+3i page,
    // 4+3i contents, 5+3i image
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [${
      (0 until n).map(i => s"${3 + 3 * i} 0 R").mkString(" ")
    }] /Count $n >>")
    pages.zipWithIndex.foreach { case (p, i) =>
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 ${p.width} ${p.height}]" +
        s" /Resources << /XObject << /Im0 ${5 + 3 * i} 0 R >> >>" +
        s" /Contents ${4 + 3 * i} 0 R >>")
      streamObj("", // the stream-but-not-image decoy the walk must skip
        s"q ${p.width} 0 0 ${p.height} 0 0 cm /Im0 Do Q"
          .getBytes(ISO_8859_1))
      streamObj(imageDict(p), imagePayload(p))
    }
    val xrefAt = out.size()
    bytes(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => bytes(f"$o%010d 00000 n \n"))
    bytes(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private def filterOf(p: PageEnc): String = p.filter match {
    case 0 => "" case 1 | 2 | 7 => "FlateDecode"
    case 3 => "DCTDecode" case 4 | 5 | 6 => "CCITTFaxDecode"
    case f => throw new IllegalArgumentException(s"filter arm $f")
  }

  private def imageDict(p: PageEnc): String = {
    val bpc = p.filter match { case 2 | 4 | 5 | 6 => 1; case _ => 8 }
    val cs = if (p.filter == 7) "/DeviceRGB" else "/DeviceGray"
    val f = filterOf(p)
    val filterPart =
      if (f.isEmpty) ""
      else if (p.filterAsArray) s" /Filter [ /$f ]" else s" /Filter /$f"
    val parms = p.filter match {
      case 4 | 5 | 6 =>
        val k = p.filter match { case 4 => -1; case 5 => 4; case 6 => 0 }
        val d = s"<< /K $k /Columns ${p.width} /Rows ${p.height}" +
          (if (p.filter == 6) " /EncodedByteAlign true" else "") +
          (if (p.blackIs1) " /BlackIs1 true" else "") + " >>"
        s" /DecodeParms ${if (p.filterAsArray) s"[ $d ]" else d}" +
          (if (p.blackIs1) " /Decode [1 0]" else "")
      case _ => ""
    }
    s"/Type /XObject /Subtype /Image /Width ${p.width} /Height ${p.height}" +
      s" /BitsPerComponent $bpc /ColorSpace $cs$filterPart$parms"
  }

  private def imagePayload(p: PageEnc): Array[Byte] = {
    def gray8 = p.pixels.map(px => (px & 0xff).toByte)
    def bilevel: Array[Byte] = p.pixels.map { px => // 0 = white, 1 = black
      val g = px & 0xff
      require(g == 0 || g == 255, s"bilevel arm needs 0/255 gray, got $g")
      if (g == 0) 1.toByte else 0.toByte
    }
    p.filter match {
      case 0 => gray8
      case 1 => deflate(gray8)
      case 2 =>
        val rowBytes = (p.width + 7) / 8
        val packed = new Array[Byte](rowBytes * p.height)
        val bw = bilevel
        var y = 0
        while (y < p.height) {
          var x = 0
          while (x < p.width) {
            // 1-bit gray, default /Decode: bit 1 = white
            if (bw(y * p.width + x) == 0)
              packed(y * rowBytes + (x >> 3)) =
                (packed(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7)))).toByte
            x += 1
          }
          y += 1
        }
        deflate(packed)
      case 3 => JpegImage.encode(p.width, p.height, p.pixels, grayscale = true)
      case 4 | 5 | 6 =>
        // the CCITT stream encodes white/black RUNS — BlackIs1 is a
        // property of the filter's decoded samples, not of the encoded
        // bits, so the payload is identical either way; the dict's
        // /Decode [1 0] compensates on the sample side
        val bw = bilevel
        p.filter match {
          case 4 => CcittCodec.encode(bw, p.width, p.height, 4)
          case 5 => CcittCodec.encode(bw, p.width, p.height, 3, t4TwoD = true)
          case 6 => CcittCodec.encode(bw, p.width, p.height, 2)
        }
      case 7 => deflate(p.pixels.flatMap(px => Array(
        ((px >> 16) & 0xff).toByte, ((px >> 8) & 0xff).toByte,
        (px & 0xff).toByte)))
    }
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(math.max(b.length / 2, 64))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
