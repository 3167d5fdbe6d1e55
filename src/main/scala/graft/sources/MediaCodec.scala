package graft.sources

/** Container sniffing + unified dispatch over the strict codec family
  * — the shape a mixed-media corpus ingest actually runs at 100 TB:
  * bytes arrive WITHOUT trustworthy extensions or MIME labels, the
  * container is identified from its magic bytes, routed to the right
  * strict decoder, and failures land in the counted quarantine lane
  * rather than aborting the task (the S9 FAILED-isolation shape,
  * spanning every family the engine can decode).
  *
  * Sniffing is by unambiguous magic prefixes (each from its public
  * spec): PNG's 8-byte signature, GIF87a/89a, BMP's "BM", JPEG's SOI,
  * TIFF's `II*`/`MM*` (round 17), RIFF+WAVE (round 16 — the 12-byte
  * two-part magic: a RIFF container whose form type is not WAVE is NOT
  * claimed as audio), and "%PDF-" (round 16). Unknown prefixes are
  * their own named class — at corpus scale, "not a container we know"
  * is a report row, not an exception trace.
  *
  * Two dispatch faces: [[decodeImage]] (the five image containers,
  * normalized onto the shared 0xAARRGGBB face) and [[decodeMedia]]
  * (round 16 — the FULL family as a typed union: image stats, audio
  * samples, or extracted text), so a mixed corpus routes through one
  * operator regardless of modality.
  */
object MediaCodec {

  /** Decoded image + the container it arrived in. */
  final case class Media(container: String, width: Int, height: Int,
      pixels: Array[Int])

  /** Typed union for the full-family dispatch: one of the three
    * modalities the engine decodes. */
  sealed trait MediaItem { def container: String }
  final case class ImageItem(container: String, width: Int, height: Int,
      pixels: Array[Int]) extends MediaItem
  final case class AudioItem(container: String, sampleRate: Int,
      channels: Int, bits: Int, format: Int, samples: Array[Int])
      extends MediaItem {
    def nFrames: Int = samples.length / math.max(channels, 1)
  }
  final case class TextItem(container: String, text: String)
      extends MediaItem

  /** Identify the container from magic bytes: "png", "gif", "bmp",
    * "jpeg", "tiff", "wav", "pdf", or "unknown". Never throws. */
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
    // TIFF 6.0 header: byte order pair + the 42 magic in that order
    // (round 17) — note JPEG's SOI is checked FIRST, so an Exif APP1
    // (which embeds a TIFF payload) still sniffs as jpeg
    else if (at(0) == 'I' && at(1) == 'I' && at(2) == 42 && at(3) == 0)
      "tiff"
    else if (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 42)
      "tiff"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E')
      "wav"
    else if (at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F' &&
      at(4) == '-')
      "pdf"
    else "unknown"
  }

  /** Sniff + dispatch to the container's strict IMAGE decoder,
    * normalizing every family onto the shared 0xAARRGGBB face (BMP
    * gains the opaque alpha the other decoders already carry; JPEGs
    * are EXIF-orientation-normalized to the upright face). Unknown
    * containers and decode rejections throw the underlying named
    * error — callers quarantine, they don't guess. Audio/document
    * magics are "known but not an image" — their own named gate, so a
    * WAV routed at an image-only ingest face is distinguishable from
    * random bytes. */
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
      // EXIF-normalized (round 17): the dispatch face hashes/stats the
      // UPRIGHT image, or every rotated re-upload escapes downstream
      // dedup (q161's posture, wired where mixed corpora actually
      // enter). parseOrientation is a headers-only marker walk (cheap)
      // and returns 1 when no Exif APP1 is present, so EXIF-less JPEGs
      // are byte-for-byte unchanged; a LYING Exif segment is a named
      // reject into the quarantine lane, not a silent default.
      val o = JpegImage.parseOrientation(bytes)
      val j = JpegImage.normalizeOrientation(JpegImage.parse(bytes), o)
      Media("jpeg", j.width, j.height, j.pixels)
    case "tiff" =>
      // TiffImage.parse already normalizes tag-274 orientation (same
      // tag, same one-copy mapping as the JPEG arm's EXIF walk)
      val t = TiffImage.parse(bytes)
      Media("tiff", t.width, t.height, t.pixels.map(0xff000000 | _))
    case "wav" | "pdf" =>
      throw new IllegalArgumentException(
        s"container is ${sniff(bytes)}, not an image (use decodeMedia)")
    case _ =>
      val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      throw new IllegalArgumentException(
        s"unknown container (magic bytes 0x$magic match no supported format)")
  }

  /** Sniff + dispatch across the FULL decode family — every container
    * the engine holds a strict decoder for, as a typed union. This is
    * the one ingest operator a genuinely mixed 100 TB corpus routes
    * through: task-local decode, modality-appropriate stats downstream,
    * failures as named report rows. */
  def decodeMedia(bytes: Array[Byte]): MediaItem = sniff(bytes) match {
    case "png" | "gif" | "bmp" | "jpeg" | "tiff" =>
      val m = decodeImage(bytes)
      ImageItem(m.container, m.width, m.height, m.pixels)
    case "wav" =>
      val w = WavAudio.parse(bytes)
      AudioItem("wav", w.sampleRate, w.channels, w.bits, w.format,
        w.samples)
    case "pdf" =>
      TextItem("pdf", PdfText.extract(bytes))
    case _ =>
      val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
      throw new IllegalArgumentException(
        s"unknown container (magic bytes 0x$magic match no supported format)")
  }
}
