package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater

import scala.collection.mutable

/** Minimal pure-JVM PDF text extraction — the real implementation of the
  * reference's `PARSE_DOCUMENT` edge (S11/U2,
  * /root/reference/epa_ingestion.py:763-764), previously an injectable
  * stub because the environment ships no PDF library. It needs none:
  * PDF content streams are FlateDecode-compressed (java.util.zip
  * .Inflater is the same zlib) and the reference corpus's label PDFs
  * show text with literal-string operators — `(word ) Tj`,
  * `[(A) -20 (B)] TJ` — in WinAnsi/ASCII, which maps 1:1 through
  * ISO-8859-1.
  *
  * Scope (documented, not hidden): handles FlateDecode and raw streams,
  * literal strings with the full PDF escape set (octal, line
  * continuations, nested parens), TJ arrays, line-break heuristics on
  * positioning operators, AND — since round 9 — hex strings under
  * subset-embedded Identity-H fonts, decoded through the font's
  * embedded /ToUnicode CMap (ISO 32000-1 §9.10.3): the object index is
  * built by a raw `N 0 obj` scan plus /ObjStm (compressed object
  * stream, §7.5.7) expansion, font resource names are resolved through
  * the /Font dicts, and the content-stream walk tracks the active font
  * via `Tf` so each `<hex>` string decodes with the right code map.
  * Fonts with no usable ToUnicode still come out empty and fall back to
  * whatever parser the caller injects (the Pipeline keeps its
  * injectable-parse seam). No reference code was consulted for this:
  * the format handling follows the public PDF 1.7 spec (ISO 32000-1
  * §7.3.4, §7.5.7, §9.4.3, §9.10.3).
  */
object PdfText {

  /** Decompression-bomb guard: one corrupt/crafted deflate stream in an
    * untrusted corpus must degrade to truncated text for that row, not
    * an executor OOM (extract is the DEFAULT parse in
    * Pipeline.processChunks). 64 MB of inflated bytes per stream is two
    * orders of magnitude above the largest real content stream in the
    * reference corpus. */
  private val MaxInflatedBytes = 64 << 20

  /** Widest bfrange accepted from an untrusted CMap (full 2-byte code
    * space); anything wider is a malformed range and is skipped. */
  private val MaxBfRange = 0xFFFF

  /** A ToUnicode code map: `codeBytes` is the code width from the
    * codespacerange (2 for Identity-H), `map` takes a code to its
    * unicode replacement text (possibly multi-char, e.g. ligatures). */
  private final case class CMap(codeBytes: Int, map: Map[Int, String])

  /** Extract visible text from PDF bytes. Total function: malformed or
    * non-PDF input yields "" rather than throwing (the S9 FAILED-row
    * isolation pattern expects parse errors to be per-row data, not
    * task aborts). */
  def extract(pdf: Array[Byte]): String = {
    if (pdf == null || pdf.length < 8) return ""
    val fonts =
      try fontCMaps(pdf)
      catch { case _: Exception => Map.empty[String, CMap] }
    val out = new StringBuilder
    var i = indexOf(pdf, StreamTok, 0)
    while (i >= 0) {
      var ds = i + StreamTok.length
      // EOL after the `stream` keyword: CRLF or LF (spec §7.3.8.1)
      if (ds < pdf.length && pdf(ds) == '\r') ds += 1
      if (ds < pdf.length && pdf(ds) == '\n') ds += 1
      val de = indexOf(pdf, EndstreamTok, ds)
      if (de < 0) { i = -1 } else {
        val raw = java.util.Arrays.copyOfRange(pdf, ds, trimEol(pdf, ds, de))
        // filter dispatch by attempt, not dict parsing: zlib data
        // self-identifies; failure = the stream was never Flate
        val body = inflate(raw).getOrElse(raw)
        val s = new String(body, ISO_8859_1)
        if (s.contains("Tj") || s.contains("TJ")) extractOps(s, out, fonts)
        i = indexOf(pdf, StreamTok, de + EndstreamTok.length)
      }
    }
    out.result().trim
  }

  private val StreamTok = "stream".getBytes(ISO_8859_1)
  private val EndstreamTok = "endstream".getBytes(ISO_8859_1)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def trimEol(b: Array[Byte], start: Int, end: Int): Int = {
    var e = end
    while (e > start && (b(e - 1) == '\n' || b(e - 1) == '\r')) e -= 1
    e
  }

  /** Tolerant zlib inflate: partial output before a late error is kept
    * (OCR producers occasionally pad stream tails); output is capped at
    * [[MaxInflatedBytes]] and truncated — a bomb yields partial text,
    * never unbounded heap. */
  private def inflate(b: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(b)
    val out = new ByteArrayOutputStream(math.min(math.max(b.length * 4, 1024), 1 << 20))
    val buf = new Array[Byte](8192)
    try {
      var n = inf.inflate(buf)
      while (n > 0 && out.size() < MaxInflatedBytes) {
        out.write(buf, 0, math.min(n, MaxInflatedBytes - out.size()))
        n = if (inf.finished()) 0 else inf.inflate(buf)
      }
      if (out.size() > 0) Some(out.toByteArray) else None
    } catch {
      case _: Exception =>
        if (out.size() > 1024) Some(out.toByteArray) else None
    } finally inf.end()
  }

  // ---------------------------------------------------------------------
  // ToUnicode CMap resolution (§9.10.3)
  // ---------------------------------------------------------------------

  /** Resource font name (the `/TT12` of `/TT12 9 Tf`) → parsed ToUnicode
    * CMap, for every font in the document that embeds one. Best-effort
    * by design (callers swallow exceptions): generation numbers are
    * assumed 0 and a name used for different fonts on different pages
    * keeps its first binding — both hold for the label corpus, and a
    * miss only means a hex string stays skipped, exactly the pre-round-9
    * behavior. */
  private def fontCMaps(pdf: Array[Byte]): Map[String, CMap] = {
    val whole = new String(pdf, ISO_8859_1)
    if (!whole.contains("/ToUnicode")) return Map.empty
    val objs = objectIndex(whole)
    val fonts = mutable.LinkedHashMap[String, CMap]()
    val cmapCache = mutable.HashMap[Int, Option[CMap]]()
    def cmapOf(fontNum: Int): Option[CMap] =
      for {
        fontBody <- objs.get(fontNum)
        tu <- ToUnicodeRef.findFirstMatchIn(fontBody)
        cm <- cmapCache.getOrElseUpdate(tu.group(1).toInt,
          objs.get(tu.group(1).toInt).flatMap(streamBytes).map(b =>
            new String(b, ISO_8859_1)).flatMap(parseCMap))
      } yield cm
    // /Font resource dicts live in page (or ObjStm-packed) objects; the
    // dicts themselves are flat name→ref maps, inline or indirect.
    val sources = Iterator(whole) ++ objs.valuesIterator.filter(_.contains("/Font"))
    for (src <- sources; m <- FontDict.findAllMatchIn(src)) {
      val dict = Option(m.group(1)).orElse(
        Option(m.group(2)).flatMap(r => objs.get(r.toInt))).getOrElse("")
      for (e <- FontEntry.findAllMatchIn(dict) if !fonts.contains(e.group(1)))
        cmapOf(e.group(2).toInt).foreach(fonts(e.group(1)) = _)
    }
    fonts.toMap
  }

  private val ToUnicodeRef = """/ToUnicode\s+(\d{1,7})\s+\d+\s+R""".r
  private val FontDict = """(?s)/Font\s*(?:<<(.{0,2000}?)>>|(\d{1,7})\s+\d+\s+R)""".r
  private val FontEntry = """/([^\s/<>\[\]()%]+)\s+(\d{1,7})\s+\d+\s+R""".r
  private val ObjRe = """(?s)(?<![0-9])(\d{1,7})\s+\d+\s+obj\b(.*?)endobj""".r

  /** Object number → body text, from a raw `N g obj … endobj` scan plus
    * expansion of /ObjStm compressed object streams (§7.5.7), which is
    * where newer producers pack font and CMap dictionaries. False
    * matches inside binary stream data are harmless: they only surface
    * if they happen to contain the font-graph patterns. */
  private def objectIndex(whole: String): Map[Int, String] = {
    val m = mutable.HashMap[Int, String]()
    for (mm <- ObjRe.findAllMatchIn(whole))
      m.getOrElseUpdate(mm.group(1).toInt, mm.group(2))
    for ((_, body) <- m.toSeq if body.contains("/ObjStm")) {
      val n = intAfter(body, "/N")
      val first = intAfter(body, "/First")
      if (n > 0 && first > 0) streamBytes(body).foreach { data =>
        val s = new String(data, ISO_8859_1)
        val header = s.substring(0, math.min(first, s.length))
          .trim.split("\\s+").filter(_.nonEmpty)
        var k = 0
        while (k + 1 < header.length && k / 2 < n) {
          val num = header(k).toInt
          val off = first + header(k + 1).toInt
          val end =
            if (k + 3 < header.length && (k + 2) / 2 < n)
              math.min(first + header(k + 3).toInt, s.length)
            else s.length
          if (off >= 0 && off <= end && end <= s.length)
            m.getOrElseUpdate(num, s.substring(off, end))
          k += 2
        }
      }
    }
    m.toMap
  }

  private def intAfter(s: String, key: String): Int =
    (key + """\s+(\d{1,9})""").r.findFirstMatchIn(s)
      .map(_.group(1).toInt).getOrElse(-1)

  /** stream…endstream payload of an object body, inflated when Flate. */
  private def streamBytes(body: String): Option[Array[Byte]] = {
    val s = body.indexOf("stream")
    if (s < 0) return None
    var ds = s + "stream".length
    if (ds < body.length && body.charAt(ds) == '\r') ds += 1
    if (ds < body.length && body.charAt(ds) == '\n') ds += 1
    val de = body.indexOf("endstream", ds)
    if (de < 0) return None
    var e = de
    while (e > ds && (body.charAt(e - 1) == '\n' || body.charAt(e - 1) == '\r')) e -= 1
    val raw = body.substring(ds, e).getBytes(ISO_8859_1)
    Some(inflate(raw).getOrElse(raw))
  }

  private val HexTok = """<([0-9a-fA-F]+)>""".r
  private val CodeSpace =
    """(?s)begincodespacerange\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val BfChar = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRange = """(?s)beginbfrange(.*?)endbfrange""".r
  private val BfPair = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val BfRangeScalar =
    """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val BfRangeArray =
    """(?s)<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*\[(.*?)\]""".r

  /** Parse a ToUnicode CMap program (§9.10.3): codespacerange fixes the
    * code width; bfchar pairs and bfrange (scalar-offset and array
    * forms) populate the map. Regex-level parsing is sufficient — the
    * CMap grammar for these three sections is line-oriented hex
    * tokens. */
  private def parseCMap(s: String): Option[CMap] = {
    val codeBytes = CodeSpace.findFirstMatchIn(s)
      .map(m => math.max(1, math.min(2, m.group(2).length / 2))).getOrElse(2)
    val map = mutable.HashMap[Int, String]()
    for (blk <- BfChar.findAllMatchIn(s); p <- BfPair.findAllMatchIn(blk.group(1)))
      map.getOrElseUpdate(Integer.parseInt(p.group(1), 16), utf16(p.group(2)))
    for (blk <- BfRange.findAllMatchIn(s)) {
      val t = blk.group(1)
      for (m <- BfRangeArray.findAllMatchIn(t)) {
        val lo = Integer.parseInt(m.group(1), 16)
        HexTok.findAllMatchIn(m.group(3)).zipWithIndex.foreach { case (it, k) =>
          map.getOrElseUpdate(lo + k, utf16(it.group(1)))
        }
      }
      for (m <- BfRangeScalar.findAllMatchIn(t)) {
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        if (hi >= lo && hi - lo <= MaxBfRange) {
          var k = 0
          while (k <= hi - lo) {
            map.getOrElseUpdate(lo + k, utf16Offset(m.group(3), k))
            k += 1
          }
        }
      }
    }
    if (map.isEmpty) None else Some(CMap(codeBytes, map.toMap))
  }

  /** UTF-16BE hex → String: 4-digit units; a 2-digit token is a single
    * byte char (seen from sloppy producers). */
  private def utf16(hex: String): String = {
    val unit = if (hex.length % 4 == 0) 4 else 2
    val sb = new StringBuilder(hex.length / unit)
    var i = 0
    while (i + unit <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + unit), 16).toChar)
      i += unit
    }
    sb.result()
  }

  /** bfrange scalar form: dst for code lo+k is dst with its LAST code
    * unit incremented by k (§9.10.3 example). */
  private def utf16Offset(dstHex: String, k: Int): String = {
    val base = utf16(dstHex)
    if (base.isEmpty) ""
    else base.substring(0, base.length - 1) + ((base.last + k) & 0xFFFF).toChar
  }

  // ---------------------------------------------------------------------
  // Content-stream walk
  // ---------------------------------------------------------------------

  /** Walk one content stream: literal strings accumulate; text-showing
    * operators (Tj, ', ", TJ) have already placed their operand when we
    * meet it, so the walk only needs separators — a space on repositioning
    * (Td/TD/Tm/T*) and a newline on ET, keeping words from fusing across
    * lines. Name tokens are consumed whole, and `Tf` binds the active
    * font so hex strings decode through its ToUnicode CMap; hex strings
    * under fonts without one stay skipped (the pre-CMap behavior).
    * Everything else (numbers, graphics) is skipped. */
  private def extractOps(
      s: String, out: StringBuilder, fonts: Map[String, CMap]): Unit = {
    var i = 0
    val n = s.length
    var lastName = ""
    var cur: CMap = null
    def sep(c: Char): Unit =
      if (out.nonEmpty && !out.last.isWhitespace) out.append(c)
    while (i < n) {
      s.charAt(i) match {
        case '(' => i = literal(s, i, out)
        case '<' if i + 1 < n && s.charAt(i + 1) == '<' => i += 2
        case '<' =>
          val e = s.indexOf('>', i + 1)
          if (e < 0) i = n
          else {
            if (cur != null) decodeHex(s, i + 1, e, cur, out)
            i = e + 1
          }
        case '/' =>
          var j = i + 1
          while (j < n && !isDelim(s.charAt(j))) j += 1
          lastName = s.substring(i + 1, j)
          i = j
        case '%' => // comment to EOL
          val e = s.indexOf('\n', i); i = if (e < 0) n else e + 1
        case 'T' if i + 1 < n =>
          s.charAt(i + 1) match {
            case 'd' | 'D' | 'm' | '*' => sep(' '); i += 2
            case 'f' => cur = fonts.getOrElse(lastName, null); i += 2
            case _ => i += 1
          }
        case 'E' if i + 1 < n && s.charAt(i + 1) == 'T' =>
          sep('\n'); i += 2
        case _ => i += 1
      }
    }
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || c == '/' || c == '(' || c == ')' || c == '<' ||
      c == '>' || c == '[' || c == ']' || c == '{' || c == '}' || c == '%'

  /** Decode the hex string s(from until to) through the active CMap:
    * whitespace is ignored, codes are fixed-width, a missing final
    * digit is an implicit 0 (§7.3.4.3), unmapped codes are dropped. */
  private def decodeHex(
      s: String, from: Int, to: Int, cm: CMap, out: StringBuilder): Unit = {
    val w = cm.codeBytes * 2
    var code = 0
    var have = 0
    var i = from
    while (i <= to) {
      val d = if (i < to) Character.digit(s.charAt(i), 16) else -1
      if (d >= 0) {
        code = (code << 4) | d
        have += 1
        if (have == w) {
          cm.map.get(code).foreach(out.append)
          code = 0; have = 0
        }
      } else if (i == to && have > 0) {
        // pad the trailing partial code with zero digits
        cm.map.get(code << (4 * (w - have))).foreach(out.append)
      }
      i += 1
    }
  }

  /** Decode one literal string starting at `s(open) == '('` into `out`;
    * returns the index just past the closing paren. Escapes per
    * ISO 32000-1 §7.3.4.2: \n \r \t \b \f \( \) \\, 1-3 digit octal
    * (overflow masked to one byte, per spec), backslash-EOL line
    * continuation; unescaped parens nest. */
  private def literal(s: String, open: Int, out: StringBuilder): Int = {
    var i = open + 1
    var depth = 1
    val n = s.length
    while (i < n && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < n =>
          s.charAt(i + 1) match {
            case 'n' => out.append('\n'); i += 2
            case 'r' => out.append('\r'); i += 2
            case 't' => out.append('\t'); i += 2
            case 'b' => out.append('\b'); i += 2
            case 'f' => out.append('\f'); i += 2
            case '(' => out.append('('); i += 2
            case ')' => out.append(')'); i += 2
            case '\\' => out.append('\\'); i += 2
            case '\r' => i += (if (i + 2 < n && s.charAt(i + 2) == '\n') 3 else 2)
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              out.append((v & 0xFF).toChar); i = j
            case other => out.append(other); i += 2
          }
        case '(' => depth += 1; out.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.append(')')
          i += 1
        case c => out.append(c); i += 1
      }
    }
    i
  }
}
