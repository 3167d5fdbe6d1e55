package graft.tools

object PdfPeek {
  def main(args: Array[String]): Unit = {
    val t = graft.sources.PdfText.extract(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))))
    println(t.take(700))
  }
}
