package graft.sources

/** Container sniffing + unified dispatch over the strict codec family
  * — the shape a mixed-media corpus ingest actually runs at 100 TB:
  * bytes arrive WITHOUT trustworthy extensions or MIME labels, the
  * container is identified from its magic bytes, routed to the right
  * strict decoder, and failures land in the counted quarantine lane
  * rather than aborting the task (the S9 FAILED-isolation shape, now
  * spanning every image family).
  *
  * Sniffing is by unambiguous magic prefixes (each from its public
  * spec): PNG's 8-byte signature, GIF87a/89a, BMP's "BM", JPEG's SOI.
  * Unknown prefixes are their own named class — at corpus scale,
  * "not a container we know" is a report row, not an exception trace.
  */
object MediaCodec {

  /** Decoded image + the container it arrived in. */
  final case class Media(container: String, width: Int, height: Int,
      pixels: Array[Int])

  /** Identify the container from magic bytes: "png", "gif", "bmp",
    * "jpeg", or "unknown". Never throws. */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G' &&
      at(4) == 0x0d && at(5) == 0x0a && at(6) == 0x1a && at(7) == 0x0a)
      "png"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8' &&
      (at(4) == '7' || at(4) == '9') && at(5) == 'a')
      "gif"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else "unknown"
  }

  /** Sniff + dispatch to the container's strict decoder, normalizing
    * every family onto the shared 0xAARRGGBB face (BMP gains the
    * opaque alpha the other decoders already carry). Unknown
    * containers and decode rejections throw the underlying named
    * error — callers quarantine, they don't guess. */
  def decodeImage(bytes: Array[Byte]): Media = sniff(bytes) match {
    case "png" =>
      val p = PngImage.parse(bytes)
      Media("png", p.width, p.height, p.pixels)
    case "gif" =>
      val g = GifImage.parse(bytes)
      Media("gif", g.width, g.height, g.pixels)
    case "bmp" =>
      val b = BmpImage.parse(bytes)
      Media("bmp", b.width, b.height,
        b.pixels.map(0xff000000 | _))
    case "jpeg" =>
      val j = JpegImage.parse(bytes)
      Media("jpeg", j.width, j.height, j.pixels)
    case _ =>
      val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      throw new IllegalArgumentException(
        s"unknown container (magic bytes 0x$magic match no supported format)")
  }
}
