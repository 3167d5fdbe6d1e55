package graft

import java.nio.file.{Files, Paths}
import graft.sources.PdfText
import graft.operators.Pipeline

/** The pure-JVM PDF extractor against the reference's OWN label corpus
  * (/root/reference/epa_pdfs, read-only) — the S11/U2 PARSE_DOCUMENT
  * edge running on real bytes end-to-end, no injected fixture text. */
class PdfTextSpec extends SparkSuite {

  private def pdf(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"/root/reference/epa_pdfs/$name"))

  test("extracts the marketing copy from ACCORD XL") {
    val t = PdfText.extract(pdf("ACCORD_XL_HERBICIDE.pdf"))
    assert(t.contains("complete"))
    assert(t.contains("spectrum"))
    assert(t.contains("postemergence"))
  }

  test("extracts letter text from AXXE and the AzaGuard master label") {
    // OCR'd letter: per-glyph kerning splits words ("BioSaf e") — the
    // stable substrings are within-word runs
    val axxe = PdfText.extract(pdf("AXXE.pdf"))
    assert(axxe.contains("BioSaf"))
    assert(axxe.contains("PROTECTIO"))
    val aza = PdfText.extract(pdf("AZAGUARD.pdf"))
    assert(aza.contains("MASTER LABEL"))
    assert(aza.contains("AzaGuard"))
  }

  test("octal escapes and parens decode per spec; garbage is total") {
    // \050 = '(' and \051 = ')' — the escape path, synthetic stream
    val content = "BT (ab\\050c\\051 ) Tj (nested (paren)) Tj ET"
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(content.getBytes("ISO-8859-1")); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val doc = ("%PDF-1.4\n1 0 obj\n<</Length " + deflated.length +
      "/Filter/FlateDecode>>\nstream\n").getBytes("ISO-8859-1") ++
      deflated ++ "\nendstream\nendobj".getBytes("ISO-8859-1")
    val t = PdfText.extract(doc)
    assert(t.contains("ab(c)"))
    assert(t.contains("nested (paren)"))
    // total on junk: no throw, empty result
    assert(PdfText.extract(Array.fill[Byte](64)(0x41)) == "")
    assert(PdfText.extract(null) == "")
  }

  test("Identity-H hex strings decode through embedded ToUnicode CMaps") {
    // LifeGard_Technical_Liquid is the corpus's all-Identity-H file:
    // 44 chars before the CMap walk, full label text after
    val t = PdfText.extract(pdf("LifeGard_Technical_Liquid.pdf"))
    assert(t.contains("Bacillus mycoides"))
    assert(t.contains("MASTER LABEL"))
    assert(t.contains("KEEP OUT OF REACH OF CHILDREN"))
    // SoilGard mixes WinAnsi literals with CMap'd hex (873 -> 49k chars)
    val sg = PdfText.extract(pdf("SoilGard_WDG.pdf"))
    assert(sg.length > 10000)
  }

  test("octal overflow masks to one byte per ISO 32000-1 7.3.4.2") {
    val doc = ("%PDF-1.4\n1 0 obj\n<<>>\nstream\n" +
      "BT (\\777) Tj ET\nendstream\nendobj").getBytes("ISO-8859-1")
    // \777 = 511; spec: ignore high-order overflow -> 511 & 0xFF = 0xFF
    assert(PdfText.extract(doc) == "ÿ")
  }

  test("decompression bomb is truncated, not inflated unboundedly") {
    // ~80 MB of zeros deflates to ~80 KB; the 64 MB cap must stop the
    // inflate loop (partial text for the row, never an executor OOM)
    val d = new java.util.zip.Deflater()
    val zeros = new Array[Byte](1 << 20)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    for (_ <- 0 until 80) { d.setInput(zeros); while (!d.needsInput()) out.write(buf, 0, d.deflate(buf)) }
    d.finish(); while (!d.finished()) out.write(buf, 0, d.deflate(buf)); d.end()
    val z = out.toByteArray
    val doc = ("%PDF-1.4\n1 0 obj\n<</Length " + z.length +
      "/Filter/FlateDecode>>\nstream\n").getBytes("ISO-8859-1") ++ z ++
      "\nendstream\nendobj".getBytes("ISO-8859-1")
    assert(PdfText.extract(doc) == "") // total, bounded, no throw
  }

  test("processChunks default parse chunks a real PDF end-to-end") {
    import spark.implicits._
    val bytes = pdf("ACCORD_XL_HERBICIDE.pdf")
    val toChunk = Seq(("EPA_LABEL_PDF/accord.pdf", bytes.length.toLong,
        "u", "62719-517", bytes))
      .toDF("RELATIVE_PATH", "SIZE", "FILE_URL", "EPAREGNO", "content")
    val emptyChunks = Seq.empty[(String, Long, String, String, Int, String)]
      .toDF("RELATIVE_PATH", "SIZE", "FILE_URL", "EPAREGNO", "CHUNK_INDEX",
        "CHUNK")
    val chunks = Pipeline.processChunks(emptyChunks, toChunk)
    assert(chunks.count() > 1) // a 24-page label spans multiple chunks
    assert(chunks.filter($"CHUNK".contains("spectrum")).count() > 0)
  }
}
