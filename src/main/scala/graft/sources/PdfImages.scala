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
  * objects with `/Subtype /Image` (ISO 32000-1 §8.9.5) and decodes
  * EVERY filter the round-19 corpus probe found in those 48 readable
  * PDFs (573/573 images, zero rejects) — all through codecs the
  * engine owns:
  *
  *  - `/DCTDecode`       → [[JpegImage]] (gray/RGB baseline +
  *                          progressive, and 4-component Adobe
  *                          CMYK/YCCK with the APP14 transform)
  *  - `/CCITTFaxDecode`  → [[CcittCodec]] (T.4/T.6, K<0 / K=0 / K>0
  *                          mapped per §7.4.6 Table 11, BlackIs1 and
  *                          EncodedByteAlign honored, lenient segment
  *                          tails — /Rows states the geometry)
  *  - `/JBIG2Decode`     → [[Jbig2Codec]] (the minimal scanned
  *                          profile: arithmetic generic region)
  *  - `/FlateDecode`     → java.util.zip rasters (1/2/4/8-bit gray,
  *                          8-bit RGB and CMYK, byte-padded per
  *                          §8.9.3), with /ColorSpace resolution
  *                          through indirect refs: device names,
  *                          CalGray/CalRGB, ICCBased by /N, Indexed
  *                          palettes with string or stream lookups
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
    * 7 = Flate 8-bit RGB, 8 = Flate DeviceCMYK (K = 0, exactly
    * invertible), 9 = Flate Indexed (palette behind an indirect
    * colorspace ref + stream lookup — the real-corpus shape),
    * 10 = Flate gray behind [/ICCBased] (resolved by /N), 11 = Flate
    * 4-bit gray (17-step lattice values), 12 = JBIG2 (generic region,
    * template 0), 13 = Adobe YCCK DCTDecode (4-component, APP14
    * transform 2, K = 0 — the scanner shape, exact for gray
    * block-constant content), 14 = JBIG2 symbol/text profile (the
    * dominant real-world scanner coding: glyph dictionary + text
    * region), 15 = JBIG2 MMR generic region (fax-derived coding),
    * 16 = Flate RGB under TIFF /Predictor 2, 17 = Flate gray under
    * PNG predictors (per-row filter types cycling None/Sub/Up/
    * Average/Paeth), 18 = INLINE image (BI/ID/EI in the content
    * stream, abbreviated keys, /Fl — no image XObject at all),
    * 19 = color 4:2:2 DCTDecode (2x1 chroma subsampling, the common
    * camera/scanner factor; gray content keeps it exact), 20 = LZW
    * gray (PDF §7.4.4 = the TIFF algorithm, EarlyChange 1),
    * 21 = RunLength gray, 22 = the chained transport shape
    * `[/ASCII85Decode /FlateDecode]`, 23 = `[/ASCIIHexDecode
    * /CCITTFaxDecode]` with the parallel null-padded /DecodeParms
    * array, 24 = JBIG2 refinement (a deliberately damaged generic
    * base corrected by a generic refinement region — the
    * lossy-then-lossless scanner shape; decodes to the exact plane),
    * 25 = INLINE CCITT G4 stencil mask (/IM true /F /CCF — the real
    * scanner mask shape; spec/fuzz arm, outside the q176 walk),
    * 26 = JBIG2 HALFTONE (pattern dictionary + Gray-coded grid over
    * the page's 8x8 cells; spec/fuzz arm, dims must be 8-multiples).
    *
    * `filterAsArray` writes `/Filter [/X]` + `/DecodeParms [<<…>>]`
    * (the array singleton form, §7.4) instead of the name form;
    * `blackIs1` flips the CCITT sample convention and writes the
    * compensating `/Decode [1 0]` so decoded pixels are IDENTICAL
    * either way — a pure container axis. */
  final case class PageEnc(width: Int, height: Int, pixels: Array[Int],
      filter: Int, filterAsArray: Boolean = false, blackIs1: Boolean = false,
      rotate: Int = 0)

  private val MaxInflatedBytes = 64 << 20

  // ------------------------------------------------------------ decode

  /** Extract every image XObject, in object-number order (the dedup
    * lane consumes the page set, so document order beyond determinism
    * is immaterial). Strict per image; a PDF with no images yields an
    * empty Seq; the first undecodable image aborts the whole document
    * (the quarantine posture). For mixed real-world files use
    * [[extractWithRejects]]. */
  def extract(pdf: Array[Byte]): Seq[Img] = {
    val (imgs, rejects) = extractWithRejects(pdf)
    rejects.headOption.foreach(r => throw new IllegalArgumentException(r))
    imgs
  }

  /** Per-image fault isolation (the S9 FAILED-row pattern): decodable
    * images extract, undecodable ones become named reject strings —
    * real scanned PDFs routinely mix a JBIG2 page into an otherwise
    * CCITT/Flate document, and one unsupported codec must not hide
    * every other page from the dedup lane. */
  def extractWithRejects(pdf: Array[Byte]): (Seq[Img], Seq[String]) = {
    require(pdf != null && pdf.length >= 8, "not a PDF: too short")
    val whole = new String(pdf, ISO_8859_1)
    val objs = objectStreams(whole)
    val index: Map[Int, (String, String)] =
      objs.map { case (num, d, p) => num -> (d, p) }.toMap
    val rotates = pageRotations(objs, index)
    val contentRot = contentRotations(objs, index)
    val imgs = Seq.newBuilder[Img]
    val rejects = Seq.newBuilder[String]
    objs.foreach { case (num, dict, payload) =>
      if (ImageSubtype.findFirstIn(dict).isDefined) {
        try {
          val rot = rotates.getOrElse(num, 0)
          // graded INSIDE the per-image isolation: a page with a
          // non-right-angle /Rotate (they occur in the wild) must
          // quarantine its own images, not abort the whole document
          // (advisor find, r19)
          require(rot % 90 == 0, s"page /Rotate $rot not a right angle")
          imgs += upright(decodeImageObject(dict, payload, index), rot)
        } catch { case e: IllegalArgumentException =>
          rejects += s"image object $num: ${e.getMessage}"
        }
      } else if (payload.nonEmpty) {
        // ISO 32000-1 §8.9.7: small masks and scanner-app output travel
        // INLINE in content streams (BI … ID … EI), invisible to the
        // XObject walk — scan every non-image stream's decoded text,
        // with the same per-image isolation
        val (in, rej) = inlineImages(num, dict, payload,
          contentRot.getOrElse(num, 0))
        imgs ++= in
        rejects ++= rej
      }
    }
    (imgs.result(), rejects.result())
  }

  private val ContentsRef = """/Contents\s+(\d{1,7})\s+\d+\s+R""".r

  /** Content-stream object number → its page's /Rotate — the inline-
    * image analog of [[pageRotations]], keyed on /Contents. */
  private def contentRotations(objs: Seq[(Int, String, String)],
      index: Map[Int, (String, String)]): Map[Int, Int] = {
    val out = scala.collection.mutable.HashMap[Int, Int]()
    objs.foreach { case (_, body, _) =>
      if (body.contains("/Type") && body.contains("/Page") &&
          !body.contains("/Pages")) {
        val rot0 = PageRotate.findFirstMatchIn(body)
          .map(_.group(1).toInt).getOrElse(0)
        val rot = ((rot0 % 360) + 360) % 360
        if (rot != 0)
          for (m <- ContentsRef.findAllMatchIn(body))
            out.getOrElseUpdate(m.group(1).toInt, rot): Unit
      }
    }
    out.toMap
  }

  private def isPdfDelim(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == 0.toChar || c == '/' || c == '[' || c == ']' || c == '<' ||
      c == '>' || c == '(' || c == ')'

  private val InlineName = """\G/([A-Za-z0-9]+)""".r

  /** Parse the BI…ID inline-image dict starting just after `BI`
    * (ISO 32000-1 §8.9.7): `/Key value` pairs until the ID operator.
    * Returns (entries, data start) — the data begins one whitespace
    * byte after ID. None = this `BI` was not an inline image (content
    * streams and scanned binary can contain the two letters), detected
    * by the frame failing to parse or missing /W //H; only a
    * WELL-FORMED frame commits the strict decode path. */
  private def parseInlineDict(text: String,
      afterBi: Int): Option[(Map[String, String], Int)] = {
    val entries = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = afterBi
    def skipWs(): Unit = {
      while (i < text.length && (text.charAt(i) match {
        case ' ' | '\t' | '\r' | '\n' | '\f' => true
        case c => c == 0.toChar
      })) i += 1
    }
    var guard = 0
    while (guard < 32) {
      guard += 1
      skipWs()
      if (i + 2 <= text.length && text.startsWith("ID", i) &&
          (i + 2 == text.length || !text.charAt(i + 2).isLetterOrDigit)) {
        // exactly one whitespace byte separates ID from the data
        return if (entries.contains("W") && entries.contains("H") &&
            entries("W").forall(_.isDigit) && entries("H").forall(_.isDigit))
          Some((entries.toMap, i + 3))
        else None
      }
      if (i >= text.length || text.charAt(i) != '/') return None
      val nm = InlineName.findFirstMatchIn(text.substring(i)) match {
        case Some(m) => i += m.end; m.group(1)
        case None => return None
      }
      skipWs()
      if (i >= text.length) return None
      val vStart = i
      text.charAt(i) match {
        case '[' =>
          val close = text.indexOf(']', i)
          if (close < 0 || close - i > 200) return None
          i = close + 1
        case '<' if i + 1 < text.length && text.charAt(i + 1) == '<' =>
          val close = text.indexOf(">>", i)
          if (close < 0 || close - i > 400) return None
          i = close + 2
        case '/' =>
          i += 1
          while (i < text.length && !isPdfDelim(text.charAt(i))) i += 1
        case _ =>
          while (i < text.length && !isPdfDelim(text.charAt(i))) i += 1
          if (i == vStart) return None
      }
      entries(nm) = text.substring(vStart, i)
    }
    None
  }

  /** Inline-image dict keys have abbreviated twins (§8.9.7 table 93);
    * read either spelling. */
  private def inlineKey(e: Map[String, String], short: String,
      long: String): Option[String] = e.get(short).orElse(e.get(long))

  /** Scan one non-image stream for inline images (BI…ID…EI). The
    * stream text comes from the payload (inflated when the stream is
    * Flate — content streams usually are); a stream that fails to
    * inflate has no scannable content (PdfText's tolerant posture).
    * Each well-formed frame decodes STRICTLY with per-image isolation:
    * unsupported inline filters, colorspaces, masks, geometry lies and
    * missing EI terminators are named rejects. */
  private def inlineImages(num: Int, dict: String, payload: String,
      rot: Int): (Seq[Img], Seq[String]) = {
    val filter = FilterName.findFirstMatchIn(dict).map(_.group(1))
    val text: String = filter match {
      case Some("FlateDecode") =>
        try new String(inflateStrict(payload.getBytes(ISO_8859_1)),
          ISO_8859_1)
        catch { case _: IllegalArgumentException => return (Nil, Nil) }
      case Some(_) => return (Nil, Nil) // not a content-stream shape
      case None => payload
    }
    val imgs = Seq.newBuilder[Img]
    val rejects = Seq.newBuilder[String]
    var from = 0
    var n = 0
    while ({ from = text.indexOf("BI", from); from >= 0 }) {
      val boundedLeft = from == 0 || isPdfDelim(text.charAt(from - 1))
      val boundedRight = from + 2 < text.length &&
        !text.charAt(from + 2).isLetterOrDigit
      (if (boundedLeft && boundedRight)
        parseInlineDict(text, from + 2) else None) match {
        case None => from += 2
        case Some((entries, dataStart)) =>
          n += 1
          try {
            val (img, end) = decodeInline(entries, text, dataStart)
            require(rot % 90 == 0, s"page /Rotate $rot not a right angle")
            imgs += upright(img, rot)
            from = end
          } catch { case e: IllegalArgumentException =>
            rejects += s"inline image $n in stream $num: ${e.getMessage}"
            from = dataStart
          }
      }
    }
    (imgs.result(), rejects.result())
  }

  /** Every well-formed inline-image frame's dict entries, normalized —
    * a corpus-probe triage aid (what do real inline images carry?),
    * not a graded surface. */
  private[graft] def probeInlineDicts(pdf: Array[Byte]): Seq[String] = {
    val whole = new String(pdf, ISO_8859_1)
    objectStreams(whole).flatMap { case (_, dict, payload) =>
      if (ImageSubtype.findFirstIn(dict).isDefined || payload.isEmpty) Nil
      else {
        val text: String =
          FilterName.findFirstMatchIn(dict).map(_.group(1)) match {
            case Some("FlateDecode") =>
              try new String(inflateStrict(payload.getBytes(ISO_8859_1)),
                ISO_8859_1)
              catch { case _: IllegalArgumentException => "" }
            case Some(_) => ""
            case None => payload
          }
        val out = Seq.newBuilder[String]
        var from = 0
        while ({ from = text.indexOf("BI", from); from >= 0 }) {
          val ok = (from == 0 || isPdfDelim(text.charAt(from - 1))) &&
            from + 2 < text.length && !text.charAt(from + 2).isLetterOrDigit
          (if (ok) parseInlineDict(text, from + 2) else None) match {
            case Some((e, ds)) =>
              out += e.toSeq.sorted.map { case (k, v) =>
                if (k == "W" || k == "H") s"$k=*" else s"$k=$v"
              }.mkString(" ")
              from = ds
            case None => from += 2
          }
        }
        out.result()
      }
    }
  }

  /** Decode one inline image; returns the image and the offset just
    * past its EI terminator. Supported: no filter or /Fl (Flate, whose
    * compressed data self-delimits), gray/RGB/CMYK device spaces at
    * the raster depths [[rasterPixels]] owns, /D decode arrays and
    * /DP predictors (shared code paths with the XObject arms). */
  private def decodeInline(entries: Map[String, String], text: String,
      dataStart: Int): (Img, Int) = {
    val w = inlineKey(entries, "W", "Width").get.toInt
    val h = inlineKey(entries, "H", "Height").get.toInt
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"bad inline image geometry ${w}x$h")
    // stencil masks (§8.9.6.2) are the DOMINANT real inline-image
    // class (all 196 inline images in the reference corpus: raw 1-bit
    // IM frames). Extracted standalone, sample 0 = painted = black,
    // 1 = unpainted = white — exactly the 1-bit gray default, so the
    // shared raster path (incl. a /D [1 0] inversion) applies as-is.
    val isMask = inlineKey(entries, "IM", "ImageMask").contains("true")
    val bpc = inlineKey(entries, "BPC", "BitsPerComponent")
      .map(_.toInt).getOrElse(if (isMask) 1 else 8)
    if (isMask) require(bpc == 1, s"inline image mask at $bpc bpc")
    val cs =
      if (isMask) Cs(1, cmyk = false) // /CS is ignored on masks
      else inlineKey(entries, "CS", "ColorSpace") match {
        case None | Some("/G") | Some("/DeviceGray") => Cs(1, cmyk = false)
        case Some("/RGB") | Some("/DeviceRGB") => Cs(3, cmyk = false)
        case Some("/CMYK") | Some("/DeviceCMYK") => Cs(4, cmyk = true)
        case Some(other) => throw new IllegalArgumentException(
          s"inline image colorspace $other unsupported")
      }
    // synthesized dict text so the shared raster/predictor readers see
    // the same spellings the XObject path does
    val pseudo = inlineKey(entries, "D", "Decode")
      .map(d => s"/Decode $d ").getOrElse("") +
      inlineKey(entries, "DP", "DecodeParms").map(p => p + " ").getOrElse("")
    val fl = inlineKey(entries, "F", "Filter")
    val (data, dataEnd): (Array[Byte], Int) = fl match {
      case None =>
        val rowBytes = (cs.comps * bpc * w + 7) / 8
        val len = rowBytes * h
        require(dataStart + len <= text.length,
          "inline image data truncated")
        (text.substring(dataStart, dataStart + len).getBytes(ISO_8859_1),
          dataStart + len)
      case Some("/Fl") | Some("/FlateDecode") =>
        val raw = text.substring(dataStart).getBytes(ISO_8859_1)
        val inf = new Inflater()
        inf.setInput(raw)
        val out = new ByteArrayOutputStream(1024)
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val k = try inf.inflate(buf) catch {
              case e: java.util.zip.DataFormatException =>
                throw new IllegalArgumentException(
                  s"bad inline Flate data: ${e.getMessage}")
            }
            require(k > 0 || inf.finished(), "truncated inline Flate data")
            require(out.size() + k <= MaxInflatedBytes,
              "inline Flate output over cap")
            out.write(buf, 0, k)
          }
          (out.toByteArray, dataStart + (raw.length - inf.getRemaining))
        } finally inf.end()
      // the other byte filters all SELF-DELIMIT (LZW's EOD code, RL's
      // 128 byte, AHx's '>', A85's '~>'), so the EI scan stays exact
      case Some("/LZW") | Some("/LZWDecode") =>
        val raw = text.substring(dataStart).getBytes(ISO_8859_1)
        val early = intAfter(pseudo, "/EarlyChange") != 0 // default 1
        val (d, used) = lzwDecodePdf(raw, 0, early)
        (d, dataStart + used)
      case Some("/RL") | Some("/RunLengthDecode") =>
        val raw = text.substring(dataStart).getBytes(ISO_8859_1)
        val (d, used) = runLengthDecode(raw, 0)
        (d, dataStart + used)
      case Some("/AHx") | Some("/ASCIIHexDecode") =>
        val raw = text.substring(dataStart).getBytes(ISO_8859_1)
        val (d, used) = asciiHexDecode(raw, 0)
        (d, dataStart + used)
      case Some("/A85") | Some("/ASCII85Decode") =>
        val raw = text.substring(dataStart).getBytes(ISO_8859_1)
        val (d, used) = ascii85Decode(raw, 0)
        (d, dataStart + used)
      case Some("/CCF") | Some("/CCITTFaxDecode") =>
        // CCITT data does NOT self-delimit (the G4/MH shapes PDFs
        // carry have no in-band EOD): candidate whitespace-delimited
        // EI operators are arbitrated by the STRICT decoder — the
        // stated geometry must land exactly, so a chance " EI " inside
        // the coded bytes decodes as garbage, rejects, and the scan
        // moves to the next candidate; running out of candidates is
        // the named unterminated reject
        var at = dataStart
        var found: (Array[Int], Int) = null
        while (found == null) {
          val ei = text.indexOf("EI", at)
          require(ei > dataStart, "inline image data not terminated by EI")
          val delimR = ei + 2 >= text.length ||
            isPdfDelim(text.charAt(ei + 2))
          if (delimR && isPdfDelim(text.charAt(ei - 1))) {
            var end = ei
            while (end > dataStart && (text.charAt(end - 1) == ' ' ||
              text.charAt(end - 1) == '\r' || text.charAt(end - 1) == '\n'))
              end -= 1
            try found = (decodeCcitt(pseudo,
              text.substring(dataStart, end).getBytes(ISO_8859_1), w, h),
              ei + 2)
            catch { case _: IllegalArgumentException => at = ei + 2 }
          } else at = ei + 2
        }
        return (Img(w, h, found._1), found._2)
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported inline image filter $other")
    }
    // the data must be closed by whitespace + the EI operator
    var i = dataEnd
    var ws = 0
    while (i < text.length && ws < 2 && (text.charAt(i) == ' ' ||
        text.charAt(i) == '\r' || text.charAt(i) == '\n')) { i += 1; ws += 1 }
    require(i + 2 <= text.length && text.startsWith("EI", i) &&
      (i + 2 == text.length || isPdfDelim(text.charAt(i + 2))),
      "inline image data not terminated by EI")
    (Img(w, h, rasterPixels(unpredict(data, pseudo, w, bpc, cs.comps),
      w, h, bpc, cs, pseudo)), i + 2)
  }

  private val PageRotate = """/Rotate\s+(-?\d{1,6})""".r
  private val XObjRef = """/\w+\s+(\d{1,7})\s+\d+\s+R""".r
  private val ResourcesRef = """/Resources\s+(\d{1,7})\s+\d+\s+R""".r
  private val XObjIndirect = """/XObject\s+(\d{1,7})\s+\d+\s+R""".r
  private val XObjDict = """(?s)/XObject\s*<<(.*?)>>""".r

  /** Image object number → the /Rotate of the page that draws it
    * (ISO 32000-1 §7.7.3.3: clockwise display rotation in multiples
    * of 90, normalized here; non-right-angle values are kept and
    * rejected per image downstream). A scanner that stored the page
    * sideways and compensated with /Rotate must not split the near-dup
    * hash set — the TIFF tag-274 posture applied to the PDF container.
    * /Resources and the /XObject dict each resolve through indirect
    * references via the object index (not just one regex-bounded hop),
    * and the XObject-dict match is uncapped — its entries are
    * name→reference pairs with no nested dicts, so the first `>>`
    * closes it. */
  private def pageRotations(objs: Seq[(Int, String, String)],
      index: Map[Int, (String, String)]): Map[Int, Int] = {
    val out = scala.collection.mutable.HashMap[Int, Int]()
    objs.foreach { case (_, body, _) =>
      if (body.contains("/Type") && body.contains("/Page") &&
          !body.contains("/Pages")) {
        val rot0 = PageRotate.findFirstMatchIn(body)
          .map(_.group(1).toInt).getOrElse(0)
        val rot = ((rot0 % 360) + 360) % 360
        if (rot != 0) {
          val resBody = ResourcesRef.findFirstMatchIn(body)
            .flatMap(m => index.get(m.group(1).toInt).map(_._1))
            .getOrElse(body)
          // the /XObject value is an inline dict or its own indirect ref
          val xobjText = XObjDict.findFirstMatchIn(resBody)
            .map(_.group(1))
            .orElse(XObjIndirect.findFirstMatchIn(resBody)
              .flatMap(m => index.get(m.group(1).toInt).map(_._1)))
            .getOrElse("")
          for (rm <- XObjRef.findAllMatchIn(xobjText))
            out.getOrElseUpdate(rm.group(1).toInt, rot): Unit
        }
      }
    }
    out.toMap
  }

  /** Rotate a decoded image to the upright display face through the
    * ONE orientation mapping (EXIF's — /Rotate 90/180/270 are
    * orientations 6/3/8). */
  private def upright(img: Img, rot: Int): Img =
    if (rot == 0) img
    else {
      val o = rot match { case 90 => 6; case 180 => 3; case _ => 8 }
      val (nw, nh) =
        if (rot == 180) (img.width, img.height) else (img.height, img.width)
      val out = new Array[Int](nw * nh)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          val (sx, sy) = JpegImage.exifSource(o, x, y, img.width, img.height)
          out(y * nw + x) = img.pixels(sy * img.width + sx)
          x += 1
        }
        y += 1
      }
      Img(nw, nh, out)
    }

  /** Short descriptors (filter/colorspace/bpc) for the images
    * [[extractWithRejects]] successfully decodes, in the same order —
    * including inline (BI/ID/EI) images, so the list zips against the
    * extraction. A triage aid for corpus probes, not a graded
    * surface. */
  private[graft] def describeImages(pdf: Array[Byte]): Seq[String] = {
    val whole = new String(pdf, ISO_8859_1)
    val objs = objectStreams(whole)
    val index: Map[Int, (String, String)] =
      objs.map { case (num, d, p) => num -> (d, p) }.toMap
    objs.flatMap { case (num, dict, payload) =>
      if (ImageSubtype.findFirstIn(dict).isDefined) {
        try {
          decodeImageObject(dict, payload, index)
          val f = FilterName.findFirstMatchIn(dict).map(_.group(1))
            .getOrElse("raw")
          val cs =
            try { val c = resolveColorSpace(dict, index)
              if (c.palette != null) "indexed"
              else if (c.cmyk) "cmyk" else s"${c.comps}comp" }
            catch { case _: Exception => "cs?" }
          Seq(s"$f/$cs/bpc${intAfter(dict, "/BitsPerComponent")}")
        } catch { case _: IllegalArgumentException => Nil }
      } else if (payload.nonEmpty) {
        val (ins, _) = inlineImages(num, dict, payload, 0)
        ins.map(_ => "inline")
      } else Nil
    }
  }

  private val ImageSubtype = """/Subtype\s*/Image\b""".r
  private val ObjHdr = """(\d{1,7})\s+(\d+)\s+obj\b""".r
  private val KSigned = """/K\s+(-?\d{1,6})""".r
  private val IntKey = """\s+(\d{1,9})""" // after a /Name
  private val FilterName =
    """/Filter\s*(?:\[\s*)?/([A-Za-z0-9]+)""".r
  private val DecodeArr =
    """/Decode\s*\[\s*([0-9.]+)\s+([0-9.]+)\s*\]""".r

  /** Sequential scan for `N G obj` headers; for each object returns
    * (object number, dict/body text, stream payload as ISO-8859-1
    * chars — empty for plain objects). The payload end comes from an
    * inline /Length when it verifiably lands on `endstream` (optional
    * EOL first), else the token scan. One matcher walks the whole
    * string via find(pos) — no per-object substring copies, so the
    * container walk stays linear on large many-object PDFs (advisor
    * find, r19). */
  private def objectStreams(whole: String): Seq[(Int, String, String)] = {
    val out = Seq.newBuilder[(Int, String, String)]
    val m = ObjHdr.pattern.matcher(whole)
    var pos = 0
    while (pos < whole.length && m.find(pos)) {
      val num = m.group(1).toInt
      val hdrEnd = m.end
      val streamAt = whole.indexOf("stream", hdrEnd)
      val endobjAt = whole.indexOf("endobj", hdrEnd)
      if (endobjAt >= 0 && (streamAt < 0 || endobjAt < streamAt)) {
        // plain object: keep its body — colorspace arrays, palette
        // hivals and ICC stream dicts resolve through it
        out += ((num, whole.substring(hdrEnd, endobjAt), ""))
        pos = endobjAt + "endobj".length
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
        out += ((num, dict, whole.substring(ds, de)))
        val after = whole.indexOf("endstream", de)
        pos = if (after < 0) whole.length else after + "endstream".length
      }
    }
    val scanned = out.result()
    // PDF 1.5 object streams (§7.5.7): non-stream objects packed into
    // a compressed stream — INVISIBLE to the raw header scan, yet
    // modern writers put exactly the objects resolution needs there
    // (colorspace arrays, page dicts). Expand each /ObjStm into plain
    // entries: N pairs of "objnum offset" before /First, bodies after.
    // A malformed ObjStm contributes nothing — its objects stay
    // missing and reject BY NAME at their use sites, never silently.
    val packed = scanned.flatMap { case (_, dict, payload) =>
      if (!dict.contains("/ObjStm")) Nil
      else try {
        val n = intAfter(dict, "/N")
        val first = intAfter(dict, "/First")
        require(n > 0 && n <= 100000 && first > 0, "ObjStm header")
        val raw = payload.getBytes(ISO_8859_1)
        val body = new String(
          if (dict.contains("/FlateDecode")) inflateStrict(raw) else raw,
          ISO_8859_1)
        require(first <= body.length, "ObjStm /First beyond stream")
        val nums = body.substring(0, first).trim.split("\\s+")
          .filter(_.nonEmpty)
        require(nums.length >= 2 * n, "ObjStm pair table short")
        (0 until n).map { k =>
          val objNum = nums(2 * k).toInt
          val off = first + nums(2 * k + 1).toInt
          val end = if (k + 1 < n) first + nums(2 * k + 3).toInt
            else body.length
          require(off >= first && off <= end && end <= body.length,
            "ObjStm offsets out of order")
          (objNum, body.substring(off, end), "")
        }
      } catch { case _: Exception => Nil }
    }
    scanned ++ packed
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

  /** Resolved color space: sample component count, CMYK flag, and a
    * palette for Indexed spaces (indices then have 1 component). */
  private final case class Cs(comps: Int, cmyk: Boolean,
      palette: Array[Int] = null)

  private val CsRef = """/ColorSpace\s+(\d{1,7})\s+\d+\s+R""".r
  private val CsInline = """(?s)/ColorSpace\s*(/\w+|\[.{0,200}?\])""".r
  private val IccRef = """/ICCBased\s+(\d{1,7})\s+\d+\s+R""".r
  private val IndexedRe =
    ("""(?s)/Indexed\s*(/\w+|\[\s*/ICCBased\s+\d{1,7}\s+\d+\s+R\s*\]|""" +
      """\d{1,7}\s+\d+\s+R)\s+(\d{1,5})\s+""" +
      """(<[0-9a-fA-F\s]*>|\(.*?\)|\d{1,7}\s+\d+\s+R)""").r

  /** Resolve the image's /ColorSpace (ISO 32000-1 §8.6): inline device
    * names, CalGray/CalRGB (device-equivalent in practice), ICCBased
    * by its stream's /N, Indexed with hex-string / literal-string /
    * stream lookup tables — each possibly behind an indirect
    * reference (the real-corpus shape: `/ColorSpace 17 0 R` →
    * `[/Indexed/DeviceCMYK 253 15 0 R]`). Unsupported families
    * (Separation, Lab, DeviceN, Pattern) are named rejects. */
  private def resolveColorSpace(dict: String,
      index: Map[Int, (String, String)]): Cs = {
    def body(num: Int): (String, String) = index.getOrElse(num,
      throw new IllegalArgumentException(s"colorspace object $num missing"))
    def ofText(t0: String): Cs = {
      val t = t0.trim
      if (t.contains("/Indexed")) {
        val m = IndexedRe.findFirstMatchIn(t).getOrElse(
          throw new IllegalArgumentException(
            s"unparsable Indexed colorspace '${t.take(60)}'"))
        val base = ofText(m.group(1) match {
          case r if r.endsWith("R") && !r.startsWith("/") &&
            !r.startsWith("[") => body(r.split("\\s+")(0).toInt)._1
          case other => other
        })
        require(base.palette == null, "Indexed over Indexed unsupported")
        val hival = m.group(2).toInt
        require(hival >= 0 && hival <= 255, s"Indexed hival $hival")
        val lookup: Array[Byte] = m.group(3) match {
          case hx if hx.startsWith("<") =>
            val digits = hx.substring(1, hx.length - 1)
              .filterNot(_.isWhitespace)
            Array.tabulate(digits.length / 2)(k =>
              Integer.parseInt(digits.substring(2 * k, 2 * k + 2), 16).toByte)
          case lit if lit.startsWith("(") =>
            lit.substring(1, lit.length - 1).getBytes(ISO_8859_1)
          case ref =>
            val (d2, p2) = body(ref.split("\\s+")(0).toInt)
            val raw = p2.getBytes(ISO_8859_1)
            if (d2.contains("/FlateDecode")) inflateStrict(raw) else raw
        }
        require(lookup.length >= (hival + 1) * base.comps,
          s"Indexed lookup has ${lookup.length} bytes, needs " +
            s"${(hival + 1) * base.comps}")
        val pal = Array.tabulate(hival + 1) { k =>
          val o = k * base.comps
          if (base.comps == 1) {
            val g = lookup(o) & 0xff; (g << 16) | (g << 8) | g
          } else if (base.comps == 3)
            ((lookup(o) & 0xff) << 16) | ((lookup(o + 1) & 0xff) << 8) |
              (lookup(o + 2) & 0xff)
          else cmykToRgb(lookup(o) & 0xff, lookup(o + 1) & 0xff,
            lookup(o + 2) & 0xff, lookup(o + 3) & 0xff)
        }
        Cs(1, cmyk = false, palette = pal)
      }
      else if (t.contains("/DeviceGray") || t.contains("/CalGray"))
        Cs(1, cmyk = false)
      else if (t.contains("/DeviceRGB") || t.contains("/CalRGB"))
        Cs(3, cmyk = false)
      else if (t.contains("/DeviceCMYK")) Cs(4, cmyk = true)
      else if (t.contains("/ICCBased")) {
        val m = IccRef.findFirstMatchIn(t).getOrElse(
          throw new IllegalArgumentException("unparsable ICCBased ref"))
        intAfter(body(m.group(1).toInt)._1, "/N") match {
          case 1 => Cs(1, cmyk = false)
          case 3 => Cs(3, cmyk = false)
          case 4 => Cs(4, cmyk = true)
          case other => throw new IllegalArgumentException(
            s"ICCBased /N $other unsupported")
        }
      }
      else throw new IllegalArgumentException(
        s"unsupported colorspace '${t.take(60)}'")
    }
    CsRef.findFirstMatchIn(dict) match {
      case Some(m) => ofText(body(m.group(1).toInt)._1)
      case None => CsInline.findFirstMatchIn(dict) match {
        case Some(m) => ofText(m.group(1))
        case None => throw new IllegalArgumentException(
          "image has no /ColorSpace")
      }
    }
  }

  private def cmykToRgb(c: Int, m: Int, y: Int, k: Int): Int =
    JpegImage.cmykToRgb(c, m, y, k) // the ONE multiplicative copy

  private def decodeImageObject(dict: String, payloadS: String,
      index: Map[Int, (String, String)]): Img = {
    val w = intAfter(dict, "/Width")
    val h = intAfter(dict, "/Height")
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"bad image geometry ${w}x$h")
    val bpc = math.max(intAfter(dict, "/BitsPerComponent"), 1)
    // the FULL filter chain (§7.4): any run of byte-to-byte filters
    // (ASCIIHex/ASCII85/RunLength/Flate/LZW, applied in order) with an
    // optional image codec LAST — `[/ASCII85Decode /DCTDecode]` is a
    // real producer shape
    val chain = filterChain(dict)
    val codecs = Set("DCTDecode", "CCITTFaxDecode", "JBIG2Decode")
    val (pre, terminal) =
      if (chain.nonEmpty && codecs(chain.last)) (chain.init, chain.last)
      else (chain, "")
    pre.find(codecs) .foreach { f =>
      throw new IllegalArgumentException(
        s"image codec /$f must be the last /Filter entry")
    }
    val parms = parmsText(dict, index)
    var payload = payloadS.getBytes(ISO_8859_1)
    pre.foreach { f => payload = byteFilter(f, payload, parms) }
    // CCITT and DCT carry their own sample semantics; the raster arms
    // need the resolved colorspace
    val pixels: Array[Int] = terminal match {
      case "DCTDecode" =>
        // real producers pad a few bytes past EOI inside the stated
        // /Length (round-19 corpus probe); trim a SHORT tail after the
        // last FFD9 so the strict JPEG parser sees a clean stream
        val eoi = {
          var i = payload.length - 2
          while (i >= 2 && !((payload(i) & 0xff) == 0xff &&
            (payload(i + 1) & 0xff) == 0xd9)) i -= 1
          i
        }
        val clean =
          if (eoi >= 2 && payload.length - (eoi + 2) <= 16 &&
              payload.length - (eoi + 2) > 0)
            java.util.Arrays.copyOfRange(payload, 0, eoi + 2)
          else payload
        val j = JpegImage.parse(clean)
        require(j.width == w && j.height == h,
          s"DCT geometry ${j.width}x${j.height} != dict ${w}x$h")
        return Img(w, h, j.pixels)
      case "CCITTFaxDecode" => decodeCcitt(parms, payload, w, h)
      case "JBIG2Decode" =>
        // /JBIG2Globals: shared segments in a separate stream that
        // logically PRECEDE the page's own (ISO 32000-1 7.4.7) —
        // resolve and prepend; segment-type gating stays Jbig2Codec's
        val globals = """/JBIG2Globals\s+(\d{1,7})\s+\d+\s+R""".r
          .findFirstMatchIn(dict)
          .flatMap(m => index.get(m.group(1).toInt))
          .map { case (gd, gp) =>
            val raw = gp.getBytes(ISO_8859_1)
            if (gd.contains("/FlateDecode")) inflateStrict(raw) else raw
          }.getOrElse(Array.empty[Byte])
        val bw = Jbig2Codec.decode(globals ++ payload, w, h) // 1 = black
        val (d0, d1) = DecodeArr.findFirstMatchIn(dict)
          .map(m => (m.group(1).toDouble, m.group(2).toDouble))
          .getOrElse((0.0, 1.0))
        bw.map { b =>
          // PDF 7.4.7: a 1 bit is black → sample 0 under the default
          // Decode; an explicit /Decode array remaps
          val sample = 1 - b
          val g = math.round((if (sample == 0) d0 else d1) * 255).toInt
          0xff000000 | (g << 16) | (g << 8) | g
        }
      case _ =>
        val cs = resolveColorSpace(dict, index)
        rasterPixels(unpredict(payload, parms, w, bpc, cs.comps),
          w, h, bpc, cs, dict)
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
    // signed regex, mirroring intAfter: the old literal "/K -" probe
    // missed legal separators like "/K\n-1" (advisor find, r19)
    val k = KSigned.findFirstMatchIn(dict).map(_.group(1).toInt)
      .getOrElse(0)
    val cols = { val c = intAfter(dict, "/Columns"); if (c > 0) c else 1728 }
    require(cols == w, s"CCITT /Columns $cols != /Width $w")
    val rows = { val r = intAfter(dict, "/Rows"); if (r > 0) r else h }
    require(rows == h, s"CCITT /Rows $rows != /Height $h")
    val byteAlign = boolAfter(dict, "/EncodedByteAlign")
    val eol = boolAfter(dict, "/EndOfLine")
    val blackIs1 = boolAfter(dict, "/BlackIs1")
    val bw: Array[Byte] = // 0 = white, 1 = black
      // lenientTail: /Rows fixes the geometry; real scanner output
      // pads the segment tail (round-19 corpus probe)
      if (k < 0) CcittCodec.decode(payload, 0, payload.length, w, h, 4,
        lenientTail = true)
      else if (k > 0)
        CcittCodec.decode(payload, 0, payload.length, w, h, 3,
          t4TwoD = true, lenientTail = true)
      else if (byteAlign)
        CcittCodec.decode(payload, 0, payload.length, w, h, 2,
          lenientTail = true)
      else if (eol)
        CcittCodec.decode(payload, 0, payload.length, w, h, 3,
          lenientTail = true)
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
    * MSB-first. Single-component spaces (gray, Indexed) accept bpc
    * 1/2/4/8; RGB and CMYK are 8-bit. Sub-8-bit gray scales samples to
    * the full range (s · 255 / maxVal); Indexed samples are palette
    * indices and must stay within the lookup table. */
  private def rasterPixels(data: Array[Byte], w: Int, h: Int, bpc: Int,
      cs: Cs, dict: String): Array[Int] = {
    val out = new Array[Int](w * h)
    if (cs.comps == 1) {
      require(bpc == 1 || bpc == 2 || bpc == 4 || bpc == 8,
        s"unsupported 1-component depth $bpc")
      val rowBits = w * bpc
      val rowBytes = (rowBits + 7) / 8
      require(data.length == rowBytes * h,
        s"raster payload ${data.length} != ${rowBytes * h} " +
          s"(${w}x$h at $bpc bpc)")
      val maxVal = (1 << bpc) - 1
      val (d0, d1) = DecodeArr.findFirstMatchIn(dict)
        .map(m => (m.group(1).toDouble, m.group(2).toDouble))
        .getOrElse((0.0, 1.0))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bitPos = x * bpc
          val b = data(y * rowBytes + (bitPos >> 3)) & 0xff
          val s = (b >> (8 - bpc - (bitPos & 7))) & maxVal
          out(y * w + x) = 0xff000000 | (
            if (cs.palette != null) {
              require(s < cs.palette.length,
                s"palette index $s >= ${cs.palette.length}")
              cs.palette(s)
            } else {
              // /Decode remaps the normalized sample (identity default)
              val v = (if (d0 == 0.0 && d1 == 1.0) s
                else math.round((d0 + (d1 - d0) * s / maxVal) * maxVal).toInt)
              val g = v * 255 / maxVal
              (g << 16) | (g << 8) | g
            })
          x += 1
        }
        y += 1
      }
    } else if (cs.comps == 3) {
      require(bpc == 8, s"RGB raster at $bpc bpc unsupported")
      require(data.length == 3 * w * h,
        s"rgb8 payload ${data.length} != ${3 * w * h}")
      var i = 0
      while (i < out.length) {
        out(i) = 0xff000000 | ((data(3 * i) & 0xff) << 16) |
          ((data(3 * i + 1) & 0xff) << 8) | (data(3 * i + 2) & 0xff)
        i += 1
      }
    } else if (cs.comps == 4) {
      require(bpc == 8, s"CMYK raster at $bpc bpc unsupported")
      require(data.length == 4 * w * h,
        s"cmyk8 payload ${data.length} != ${4 * w * h}")
      var i = 0
      while (i < out.length) {
        out(i) = 0xff000000 | cmykToRgb(data(4 * i) & 0xff,
          data(4 * i + 1) & 0xff, data(4 * i + 2) & 0xff,
          data(4 * i + 3) & 0xff)
        i += 1
      }
    } else throw new IllegalArgumentException(
      s"unsupported raster shape bpc=$bpc comps=${cs.comps}")
    out
  }

  // ------------------------------------------------- byte filters

  private val FilterArrRe = """(?s)/Filter\s*\[(.{0,200}?)\]""".r
  private val NameTok = """/([A-Za-z0-9]+)""".r

  /** The full /Filter chain (ISO 32000-1 §7.4: a single name or an
    * array applied in order) — the round-19 single-name read dropped
    * every filter after the first, so a real `[/ASCII85Decode
    * /FlateDecode]` stream could never decode. */
  private def filterChain(dict: String): Seq[String] =
    FilterArrRe.findFirstMatchIn(dict) match {
      case Some(m) => NameTok.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      case None =>
        FilterName.findFirstMatchIn(dict).map(_.group(1)).toSeq
    }

  /** PDF LZWDecode (§7.4.4): the TIFF algorithm (MSB-first codes,
    * Clear 256, EOD 257, 12-bit cap) with the /EarlyChange knob —
    * 1 (default) widens one entry early exactly like [[TiffImage
    * .lzwDecode]], 0 widens at the table-full boundary. Output grows
    * to EOD (a PDF stream states no raster size at this layer);
    * returns (decoded bytes, code-stream bytes consumed) so inline
    * images can find their EI terminator. */
  private[graft] def lzwDecodePdf(data: Array[Byte], off: Int,
      earlyChange: Boolean): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream(1024)
    var bitPos = 0L
    val endBit = (data.length - off) * 8L
    var width = 9
    def nextCode(): Int = {
      require(bitPos + width <= endBit, "LZW stream ends mid-code (no EOD)")
      var v = 0
      var b = 0
      while (b < width) {
        val bit = bitPos + b
        v = (v << 1) |
          ((data(off + (bit >> 3).toInt) >> (7 - (bit & 7).toInt)) & 1)
        b += 1
      }
      bitPos += width
      v
    }
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = 258
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
    var old = -1
    var done = false
    while (!done) {
      val code = nextCode()
      if (code == 257) done = true
      else if (code == 256) { next = 258; width = 9; old = -1 }
      else {
        require(next < 4096, "LZW table overflow without Clear")
        require(out.size() < MaxInflatedBytes, "LZW output over cap")
        if (old < 0) {
          require(code < 256, s"first code after Clear is $code (not a root)")
          out.write(code)
          old = code
        } else {
          require(code <= next, s"LZW code $code beyond table ($next)")
          val s =
            if (code < next) expand(code)
            else { val p = expand(old); p :+ p(0) } // KwKwK
          out.write(s, 0, s.length)
          prefix(next) = old; append(next) = s(0)
          next += 1
          val bump = if (earlyChange) (1 << width) - 1 else (1 << width)
          if (next == bump && width < 12) width += 1
          old = code
        }
      }
    }
    (out.toByteArray, ((bitPos + 7) / 8).toInt)
  }

  /** RunLengthDecode (§7.4.5): n in 0..127 copies n+1 literals,
    * 129..255 repeats the next byte 257−n times, 128 = EOD. Returns
    * (decoded bytes, encoded bytes consumed incl. the EOD byte). */
  private[graft] def runLengthDecode(data: Array[Byte],
      off: Int): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream(256)
    var i = off
    var done = false
    while (!done) {
      require(i < data.length, "RunLength stream ends without EOD")
      val n = data(i) & 0xff
      i += 1
      if (n == 128) done = true
      else if (n < 128) {
        require(i + n + 1 <= data.length, "RunLength literal run truncated")
        out.write(data, i, n + 1)
        i += n + 1
      } else {
        require(i < data.length, "RunLength repeat run truncated")
        var k = 257 - n
        while (k > 0) { out.write(data(i)); k -= 1 }
        i += 1
      }
      require(out.size() <= MaxInflatedBytes, "RunLength output over cap")
    }
    (out.toByteArray, i - off)
  }

  /** ASCIIHexDecode (§7.4.2): hex digit pairs, whitespace ignored,
    * `>` EOD (an odd final digit pads with 0). Returns (bytes,
    * consumed incl. the EOD). */
  private[graft] def asciiHexDecode(data: Array[Byte],
      off: Int): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream(256)
    var i = off
    var hi = -1
    var done = false
    while (!done) {
      require(i < data.length, "ASCIIHex stream ends without '>'")
      val c = (data(i) & 0xff).toChar
      i += 1
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        done = true
      } else if (!c.isWhitespace) {
        val d = Character.digit(c, 16)
        require(d >= 0, s"ASCIIHex: bad digit '$c'")
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
    }
    (out.toByteArray, i - off)
  }

  /** ASCII85Decode (§7.4.3): base-85 groups c1..c5 ('!'..'u') encode
    * 4 bytes big-endian; 'z' = four zero bytes; a partial final group
    * of n chars yields n−1 bytes; `~>` EOD. */
  private[graft] def ascii85Decode(data: Array[Byte],
      off: Int): (Array[Byte], Int) = {
    val out = new ByteArrayOutputStream(256)
    var i = off
    val grp = new Array[Int](5)
    var gn = 0
    def flush(n: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < n) grp(k) else 84); k += 1 }
      require(v <= 0xffffffffL, "ASCII85 group out of range")
      var b = 0
      while (b < n - 1) { out.write(((v >> (24 - 8 * b)) & 0xff).toInt); b += 1 }
    }
    var done = false
    while (!done) {
      require(i < data.length, "ASCII85 stream ends without '~>'")
      val c = (data(i) & 0xff).toChar
      i += 1
      if (c == '~') {
        require(i < data.length && data(i) == '>',
          "ASCII85: '~' not followed by '>'")
        i += 1
        require(gn != 1, "ASCII85: lone trailing character")
        if (gn > 0) flush(gn)
        done = true
      } else if (c == 'z') {
        require(gn == 0, "ASCII85: 'z' inside a group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!c.isWhitespace) {
        require(c >= '!' && c <= 'u', s"ASCII85: bad character '$c'")
        grp(gn) = c - '!'
        gn += 1
        if (gn == 5) { flush(5); gn = 0 }
      }
      require(out.size() <= MaxInflatedBytes, "ASCII85 output over cap")
    }
    (out.toByteArray, i - off)
  }

  /** Apply one non-terminal (byte-to-byte) filter; full-stream form
    * for XObject chains. */
  private def byteFilter(name: String, data: Array[Byte],
      parms: String): Array[Byte] = name match {
    case "FlateDecode" | "Fl" => inflateStrict(data)
    case "LZWDecode" | "LZW" =>
      val early = intAfter(parms, "/EarlyChange") != 0 // default 1
      lzwDecodePdf(data, 0, early)._1
    case "RunLengthDecode" | "RL" => runLengthDecode(data, 0)._1
    case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data, 0)._1
    case "ASCII85Decode" | "A85" => ascii85Decode(data, 0)._1
    case other =>
      throw new IllegalArgumentException(s"unsupported image filter /$other")
  }

  private val ParmsRef = """/DecodeParms\s+(\d{1,7})\s+\d+\s+R""".r

  /** The text the filter parameters are read from: the image dict
    * itself, plus the body of an indirect /DecodeParms object if the
    * dict points at one — so a /Predictor hidden behind a reference
    * cannot silently read as "no predictor". */
  private def parmsText(dict: String,
      index: Map[Int, (String, String)]): String =
    dict + ParmsRef.findFirstMatchIn(dict)
      .flatMap(m => index.get(m.group(1).toInt).map(_._1)).getOrElse("")

  /** /DecodeParms /Predictor (ISO 32000-1 §7.4.4.4): 1 = none,
    * 2 = TIFF horizontal differencing, 10-15 = PNG filters with a
    * per-row filter-type byte. TIFF Predictor 2 is LENGTH-PRESERVING —
    * exactly the case the raster payload-length check cannot catch —
    * so it must be applied (or named-rejected), never ignored: an
    * ignored predictor hashes silently wrong pixels (advisor find,
    * r19). Stated /Colors and /Columns must agree with the image. */
  private def unpredict(data: Array[Byte], parms: String, w: Int,
      bpc: Int, comps: Int): Array[Byte] = {
    val pred = intAfter(parms, "/Predictor")
    if (pred <= 1) return data
    val pColors = intAfter(parms, "/Colors")
    require(pColors < 0 || pColors == comps,
      s"/Colors $pColors != $comps components")
    val pCols = intAfter(parms, "/Columns")
    require(pCols < 0 || pCols == w, s"predictor /Columns $pCols != /Width $w")
    if (pred == 2) {
      require(bpc == 8, s"TIFF predictor at $bpc bpc unsupported")
      val rowBytes = comps * w
      require(data.length % rowBytes == 0,
        s"predicted payload ${data.length} not rows of $rowBytes")
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var i = comps
        while (i < rowBytes) {
          out(r + i) = (out(r + i) + out(r + i - comps)).toByte
          i += 1
        }
        r += rowBytes
      }
      out
    } else if (pred >= 10 && pred <= 15) {
      val sampBits = comps * bpc
      val rowBytes = (sampBits * w + 7) / 8
      val bpp = math.max(1, sampBits / 8)
      require(data.length % (rowBytes + 1) == 0,
        s"PNG-predicted payload ${data.length} not rows of ${rowBytes + 1}")
      val h = data.length / (rowBytes + 1)
      val out = new Array[Byte](rowBytes * h)
      var y = 0
      while (y < h) {
        val ft = data(y * (rowBytes + 1)) & 0xff
        require(ft <= 4, s"PNG filter type $ft")
        val src = y * (rowBytes + 1) + 1
        val dst = y * rowBytes
        var i = 0
        while (i < rowBytes) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (y > 0) out(dst - rowBytes + i) & 0xff else 0
          val ul =
            if (y > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xff
            else 0
          out(dst + i) = (ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + (left + up) / 2
            case _ => raw + paeth(left, up, ul)
          }).toByte
          i += 1
        }
        y += 1
      }
      out
    } else throw new IllegalArgumentException(
      s"/Predictor $pred unsupported")
  }

  /** Paeth predictor (PNG spec §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
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
    * bytes. With `objStm` the plain auxiliary objects (arm 9/10's
    * indirect colorspace arrays) travel inside a PDF 1.5 object
    * stream (§7.5.7) instead of as regular objects — the modern-writer
    * shape the raw header scan alone cannot see. */
  def encodePdf(pages: Seq[PageEnc], objStm: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    val deferred = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    def bytes(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    def obj(body: String): Unit = {
      offsets += out.size()
      bytes(s"${offsets.length} 0 obj\n$body\nendobj\n")
    }
    // reserves the object NUMBER in place (the page-group numbering
    // math must not shift) but packs the body into the trailing ObjStm
    def objAux(body: String): Unit =
      if (!objStm) obj(body)
      else { offsets += out.size(); deferred += ((offsets.length, body)) }
    def streamObj(dict: String, payload: Array[Byte]): Unit = {
      offsets += out.size()
      bytes(s"${offsets.length} 0 obj\n<< $dict /Length ${payload.length} >>\nstream\n")
      out.write(payload)
      bytes("\nendstream\nendobj\n")
    }
    bytes("%PDF-1.4\n%âãÏÓ\n")
    val n = pages.length
    // objects: 1 catalog, 2 pages, then per page: page, contents,
    // image, plus the indirect-colorspace aux objects (arms 9/10:
    // colorspace array + lookup/ICC stream — the real-corpus shape
    // `/ColorSpace 17 0 R` → `[/Indexed ... 15 0 R]`)
    def auxOf(p: PageEnc): Int = p.filter match { case 9 | 10 => 2; case _ => 0 }
    val firstObj = pages.scanLeft(3)((acc, p) => acc + 3 + auxOf(p))
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [${
      (0 until n).map(i => s"${firstObj(i)} 0 R").mkString(" ")
    }] /Count $n >>")
    pages.zipWithIndex.foreach { case (p0, i) =>
      // `rotate` stores the image SIDEWAYS and compensates with the
      // page's /Rotate (the scanner shape): stored = upright through
      // the ONE orientation mapping (90/180/270 CW display = EXIF
      // orientations 6/3/8)
      val p = if (p0.rotate == 0) p0 else {
        require(Set(90, 180, 270)(p0.rotate), s"rotate ${p0.rotate}")
        val o = p0.rotate match { case 90 => 6; case 180 => 3; case _ => 8 }
        val (sw, sh, stored) =
          JpegImage.exifStore(o, p0.width, p0.height, p0.pixels)
        p0.copy(width = sw, height = sh, pixels = stored)
      }
      val po = firstObj(i)
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 ${p.width} ${p.height}]" +
        (if (p.rotate != 0) s" /Rotate ${p.rotate}" else "") +
        s" /Resources << /XObject << /Im0 ${po + 2} 0 R >> >>" +
        s" /Contents ${po + 1} 0 R >>")
      if (p.filter == 18 || p.filter == 25) {
        // arms 18/25: the image travels INLINE in the content stream
        // (BI … ID … EI, §8.9.7, abbreviated keys) — the page still
        // references the (unused) decoy object so the object layout
        // stays identical across arms. Arm 25 is the real scanner
        // mask shape: 1-bit /IM stencil under /CCF with its /DP dict.
        val head = (s"q ${p.width} 0 0 ${p.height} 0 0 cm " + (p.filter match {
          case 18 => s"BI /W ${p.width} /H ${p.height} /BPC 8 /CS /G /F /Fl ID\n"
          case _ => s"BI /W ${p.width} /H ${p.height} /BPC 1 /IM true /F /CCF" +
            s" /DP << /K -1 /Columns ${p.width} /Rows ${p.height} >> ID\n"
        })).getBytes(ISO_8859_1)
        streamObj("", head ++ imagePayload(p) ++
          "\nEI Q".getBytes(ISO_8859_1))
        streamObj("", // the stream-but-not-image decoy the walk must skip
          "inline-image page: unused XObject slot".getBytes(ISO_8859_1))
      } else {
        streamObj("", // the stream-but-not-image decoy the walk must skip
          s"q ${p.width} 0 0 ${p.height} 0 0 cm /Im0 Do Q"
            .getBytes(ISO_8859_1))
        streamObj(imageDict(p, po + 3), imagePayload(p))
      }
      p.filter match {
        case 9 => // Indexed palette behind TWO indirections
          val (pal, _) = paletteOf(p)
          objAux(s"[ /Indexed /DeviceRGB ${pal.length - 1} ${po + 4} 0 R ]")
          streamObj("/Filter /FlateDecode", deflate(pal.flatMap(c =>
            Array(((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte,
              (c & 0xff).toByte))))
        case 10 => // ICCBased gray: /N is all the consumer reads
          objAux(s"[ /ICCBased ${po + 4} 0 R ]")
          streamObj("/N 1", "fixture-icc-gray".getBytes(ISO_8859_1))
        case _ => ()
      }
    }
    if (deferred.nonEmpty) {
      val bodies = deferred.map(_._2)
      val offs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
      val header = deferred.zip(offs)
        .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
      streamObj(s"/Type /ObjStm /N ${deferred.length} " +
        s"/First ${header.length} /Filter /FlateDecode",
        deflate((header + bodies.mkString("\n") + "\n")
          .getBytes(ISO_8859_1)))
    }
    val xrefAt = out.size()
    bytes(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => bytes(f"$o%010d 00000 n \n"))
    bytes(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The exact encoded payload bytes of a page — lets the q178
    * quarantine fixture locate (and surgically corrupt) one image's
    * payload inside a multi-page file without fragile offset math. */
  private[graft] def pagePayloadForFixture(p: PageEnc): Array[Byte] =
    imagePayload(p)

  private def filterOf(p: PageEnc): String = p.filter match {
    case 0 => ""
    case 1 | 2 | 7 | 8 | 9 | 10 | 11 | 16 | 17 => "FlateDecode"
    case 3 | 13 | 19 => "DCTDecode" case 4 | 5 | 6 => "CCITTFaxDecode"
    case 12 | 14 | 15 | 24 | 26 => "JBIG2Decode"
    case 18 | 25 => "" // inline (BI/ID/EI): the filter lives in the frame
    case 20 => "LZWDecode"
    case 21 => "RunLengthDecode"
    case 22 | 23 => "" // filter CHAINS — imageDict writes the array
    case f => throw new IllegalArgumentException(s"filter arm $f")
  }

  private[graft] def runLengthEncode(d: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(d.length / 2 + 16)
    var i = 0
    while (i < d.length) {
      var j = i + 1
      while (j < d.length && d(j) == d(i) && j - i < 128) j += 1
      if (j - i >= 2) { out.write(257 - (j - i)); out.write(d(i)); i = j }
      else {
        var k = i + 1
        while (k < d.length && k - i < 128 &&
          !(k + 1 < d.length && d(k + 1) == d(k))) k += 1
        out.write(k - i - 1)
        out.write(d, i, k - i)
        i = k
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  private[graft] def asciiHexEncode(d: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(d.length * 2 + d.length / 32 + 2)
    var i = 0
    while (i < d.length) {
      sb.append(f"${d(i) & 0xff}%02x")
      if (i % 32 == 31) sb.append('\n')
      i += 1
    }
    sb.append('>')
    sb.toString.getBytes(ISO_8859_1)
  }

  private[graft] def ascii85Encode(d: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(d.length * 5 / 4 + d.length / 60 + 4)
    var i = 0
    while (i < d.length) {
      val n = math.min(4, d.length - i)
      var v = 0L
      var k = 0
      while (k < 4) {
        v = (v << 8) | (if (k < n) d(i + k) & 0xffL else 0L)
        k += 1
      }
      if (n == 4 && v == 0) sb.append('z')
      else {
        val digits = new Array[Char](5)
        var j = 4
        var r = v
        while (j >= 0) { digits(j) = ('!' + (r % 85)).toChar; r /= 85; j -= 1 }
        sb.appendAll(digits, 0, n + 1)
      }
      if (sb.length % 64 < 5) sb.append('\n')
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes(ISO_8859_1)
  }

  /** Distinct colors of the page in first-occurrence order (the arm-9
    * Indexed palette) and the per-pixel index array. */
  private def paletteOf(p: PageEnc): (Array[Int], Array[Int]) = {
    val order = scala.collection.mutable.LinkedHashMap[Int, Int]()
    val idx = p.pixels.map { px =>
      order.getOrElseUpdate(px & 0xffffff, order.size)
    }
    require(order.size <= 256, s"arm 9 needs <= 256 colors, got ${order.size}")
    (order.keysIterator.toArray, idx)
  }

  private def imageDict(p: PageEnc, csObj: Int): String = {
    val bpc = p.filter match {
      case 2 | 4 | 5 | 6 | 12 | 14 | 15 | 23 | 24 | 26 => 1
      case 11 => 4
      case _ => 8
    }
    val cs = p.filter match {
      case 7 | 16 | 19 => "/DeviceRGB"
      case 8 | 13 => "/DeviceCMYK"
      case 9 | 10 => s"$csObj 0 R" // indirect (the real-corpus shape)
      case _ => "/DeviceGray"
    }
    val f = filterOf(p)
    val filterPart = p.filter match {
      // real filter CHAINS (§7.4): an ASCII transport stage ahead of
      // the byte/codec stage — always the array form
      case 22 => " /Filter [ /ASCII85Decode /FlateDecode ]"
      case 23 => " /Filter [ /ASCIIHexDecode /CCITTFaxDecode ]"
      case _ =>
        if (f.isEmpty) ""
        else if (p.filterAsArray) s" /Filter [ /$f ]" else s" /Filter /$f"
    }
    val parms = p.filter match {
      case 23 => // parms array parallel to the chain: null for AHx
        s" /DecodeParms [ null << /K -1 /Columns ${p.width}" +
          s" /Rows ${p.height} >> ]"
      case 4 | 5 | 6 =>
        val k = p.filter match { case 4 => -1; case 5 => 4; case 6 => 0 }
        val d = s"<< /K $k /Columns ${p.width} /Rows ${p.height}" +
          (if (p.filter == 6) " /EncodedByteAlign true" else "") +
          (if (p.blackIs1) " /BlackIs1 true" else "") + " >>"
        s" /DecodeParms ${if (p.filterAsArray) s"[ $d ]" else d}" +
          (if (p.blackIs1) " /Decode [1 0]" else "")
      case 16 =>
        val d = s"<< /Predictor 2 /Colors 3 /BitsPerComponent 8" +
          s" /Columns ${p.width} >>"
        s" /DecodeParms ${if (p.filterAsArray) s"[ $d ]" else d}"
      case 17 =>
        val d = s"<< /Predictor 15 /Colors 1 /BitsPerComponent 8" +
          s" /Columns ${p.width} >>"
        s" /DecodeParms ${if (p.filterAsArray) s"[ $d ]" else d}"
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
      case 13 => // Adobe YCCK (transform 2, K = 0): the scanner shape
        JpegImage.encode(p.width, p.height, p.pixels, adobeYcck = true)
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
      case 8 => // DeviceCMYK at K = 0: exactly invertible
        deflate(p.pixels.flatMap(px => Array(
          (255 - ((px >> 16) & 0xff)).toByte,
          (255 - ((px >> 8) & 0xff)).toByte,
          (255 - (px & 0xff)).toByte, 0.toByte)))
      case 9 => deflate(paletteOf(p)._2.map(_.toByte))
      case 10 => deflate(p.pixels.map(px => (px & 0xff).toByte))
      case 12 => Jbig2Codec.encode(bilevel, p.width, p.height)
      case 14 => // symbol/text JBIG2, rotating through the plain,
        // per-instance-refinement (RI) and SDREFAGG dictionary shapes
        // by page geometry — decoded pixels are identical either way
        Jbig2Codec.encodeSymbolText(bilevel, p.width, p.height,
          Jbig2Codec.SymTextCfg(tileW = 8, tileH = 8,
            refineText = (p.width + p.height) % 3 == 1,
            refineDict = (p.width + p.height) % 3 == 2))
      case 15 => Jbig2Codec.encodeMmr(bilevel, p.width, p.height)
      case 24 => // refinement: a damaged base corrected to the exact
        // plane (deterministic damage so the payload is reproducible)
        val bw = bilevel
        val base = bw.clone()
        var k = 0
        while (k < base.length) {
          var z = (k * 2654435761L + p.width * 31) * 0x9E3779B97F4A7C15L
          z ^= (z >>> 32)
          if ((z & 7) == 0) base(k) = (1 - base(k)).toByte
          k += 1
        }
        Jbig2Codec.encodeRefined(base, bw, p.width, p.height,
          template = p.width % 2)
      case 18 => deflate(gray8) // inline /Fl gray (framed by encodePdf)
      case 25 => CcittCodec.encode(bilevel, p.width, p.height, 4)
      case 26 => // JBIG2 halftone over the 8x8 cell grid: the two flat
        // patterns (all-white, all-black) and one gray bit per cell
        require(p.width % 8 == 0 && p.height % 8 == 0,
          s"halftone arm needs 8-multiple dims, got ${p.width}x${p.height}")
        val bw = bilevel
        val gw = p.width / 8; val gh = p.height / 8
        val grays = Array.tabulate(gw * gh) { c =>
          val v = bw((c / gw * 8) * p.width + (c % gw) * 8)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              require(bw((c / gw * 8 + y) * p.width + (c % gw) * 8 + x) == v,
                "halftone arm needs cell-constant content")
              x += 1
            }
            y += 1
          }
          v.toInt
        }
        Jbig2Codec.encodeHalftone(grays, gw, gh, IndexedSeq(
          (8, 8, Array.fill(64)(0.toByte)),
          (8, 8, Array.fill(64)(1.toByte))))
      case 20 => TiffImage.lzwEncode(gray8) // PDF LZW = TIFF's, EC 1
      case 21 => runLengthEncode(gray8)
      case 22 => ascii85Encode(deflate(gray8)) // chained transport
      case 23 => asciiHexEncode(CcittCodec.encode(bilevel,
        p.width, p.height, 4))
      case 19 => // color 4:2:2 DCT — gray content keeps chroma exactly
        // zero, so the 2x1-subsampled planes round-trip bit-exactly
        // through the block-constant aperture
        JpegImage.encode(p.width, p.height, p.pixels, subsample422 = true)
      case 16 => // RGB under TIFF Predictor 2 (horizontal differencing)
        val rowBytes = 3 * p.width
        val rgb = p.pixels.flatMap(px => Array(
          ((px >> 16) & 0xff).toByte, ((px >> 8) & 0xff).toByte,
          (px & 0xff).toByte))
        var r = rgb.length - rowBytes
        while (r >= 0) { // difference right-to-left so sources stay raw
          var i = rowBytes - 1
          while (i >= 3) {
            rgb(r + i) = (rgb(r + i) - rgb(r + i - 3)).toByte
            i -= 1
          }
          r -= rowBytes
        }
        deflate(rgb)
      case 17 => // gray under PNG predictors, filter types cycling
        val g = gray8
        val out = new Array[Byte]((p.width + 1) * p.height)
        var y = 0
        while (y < p.height) {
          val ft = y % 5
          out(y * (p.width + 1)) = ft.toByte
          var i = 0
          while (i < p.width) {
            val raw = g(y * p.width + i) & 0xff
            val left = if (i > 0) g(y * p.width + i - 1) & 0xff else 0
            val up = if (y > 0) g((y - 1) * p.width + i) & 0xff else 0
            val ul = if (y > 0 && i > 0) g((y - 1) * p.width + i - 1) & 0xff
              else 0
            out(y * (p.width + 1) + 1 + i) = (ft match {
              case 0 => raw
              case 1 => raw - left
              case 2 => raw - up
              case 3 => raw - (left + up) / 2
              case _ => raw - paeth(left, up, ul)
            }).toByte
            i += 1
          }
          y += 1
        }
        deflate(out)
      case 11 => // 4-bit gray: values must sit on the 17-step lattice
        val rowBytes = (p.width + 1) / 2
        val packed = new Array[Byte](rowBytes * p.height)
        var y = 0
        while (y < p.height) {
          var x = 0
          while (x < p.width) {
            val g = p.pixels(y * p.width + x) & 0xff
            require(g % 17 == 0, s"arm 11 needs 17-step gray, got $g")
            val s = g / 17
            val o = y * rowBytes + (x >> 1)
            packed(o) = (packed(o) | (s << (if ((x & 1) == 0) 4 else 0))).toByte
            x += 1
          }
          y += 1
        }
        deflate(packed)
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
