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
