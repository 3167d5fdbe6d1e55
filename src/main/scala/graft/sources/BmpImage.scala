package graft.sources

/** Pure-JVM BMP codec (uncompressed BI_RGB, 24-bit truecolor and —
  * round 16 — 8-bit palette) — the image half of
  * the multimodal decode seam, built on the same discipline as
  * [[WavAudio]] (the WAV half) and PdfText: implement the PUBLIC
  * container spec byte-by-byte, validate strictly, never return garbage
  * pixels. Windows BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B),
  * little-endian, rows padded to 4-byte boundaries; 24-bit rows are
  * BGR triples, 8-bit rows are palette indices resolved through the
  * BGRX color table that follows the DIB header (biClrUsed entries,
  * 0 = 256; an index at or past the table is a named reject, never a
  * clamped pixel). Positive biHeight = bottom-up row storage (the
  * common case), negative = top-down — both decode to the same
  * top-down `pixels` API (row-major from the top-left, 0xRRGGBB
  * ints).
  *
  * Reference semantics: the reference treats media as opaque binary
  * with typed metadata and delegates decode to external services; this
  * codec closes the decode half for uncompressed images the way
  * q129/WavAudio closed it for PCM audio — no image libraries exist in
  * this environment (the sanctioned stub boundary), but a container
  * walk needs none.
  */
object BmpImage {

  final case class Bmp(width: Int, height: Int, topDown: Boolean,
      pixels: Array[Int]) {
    def pixel(x: Int, y: Int): Int = pixels(y * width + x)
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4
  private def rowStride8(width: Int): Int = ((width + 3) / 4) * 4

  /** Strict parse. Rejects loudly: wrong magic, non-BITMAPINFOHEADER,
    * planes ≠ 1, bpp ∉ {8, 24}, compression ≠ BI_RGB, zero/overflow
    * dimensions, a color table overrunning the pixel offset, a palette
    * index at or past the table, pixel data overrunning the file,
    * declared file size smaller than the pixel array end. */
  def parse(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54, s"not a BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M',
      s"bad magic '${bytes(0).toChar}${bytes(1).toChar}'")
    val declaredSize = i32(bytes, 2)
    val dataOff = i32(bytes, 10)
    val hdrSize = i32(bytes, 14)
    require(hdrSize == 40, s"unsupported DIB header size $hdrSize " +
      "(only BITMAPINFOHEADER)")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(width > 0 && width <= (1 << 20), s"bad width $width")
    require(rawHeight != 0 && math.abs(rawHeight) <= (1 << 20),
      s"bad height $rawHeight")
    // total-pixel budget in LONG arithmetic (advisor r17, TIFF find
    // applied family-wide): per-dim caps alone admit products whose
    // Int byte sizes wrap
    require(width.toLong * math.abs(rawHeight) <= (1L << 26),
      s"image ${width}x$rawHeight exceeds the ${1L << 26}-pixel budget")
    require(planes == 1, s"bad plane count $planes")
    require(bpp == 24 || bpp == 8,
      s"unsupported bit depth $bpp (only 24-bit BGR and 8-bit palette)")
    require(compression == 0,
      s"unsupported compression $compression (only BI_RGB)")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    // 8-bit: the BGRX color table sits right after the DIB header;
    // biClrUsed = 0 nominally means the full 256 entries, but real
    // writers — the JDK's own BMPImageWriter among them (found by the
    // reverse-parity spec: biClrUsed 0 with a 193-entry table) — leave
    // it 0 and let the pixel-data offset delimit a SHORTER table, so
    // the 0 case derives the entry count from the gap, capped at 256
    val palette: Array[Int] =
      if (bpp == 8) {
        val clrUsed = i32(bytes, 46)
        require(clrUsed >= 0 && clrUsed <= 256,
          s"bad biClrUsed $clrUsed")
        val n = if (clrUsed == 0) math.min(256, (dataOff - 54) / 4)
          else clrUsed
        require(n >= 1, s"empty color table (pixel offset $dataOff)")
        require(54 + 4 * n <= dataOff,
          s"color table ($n entries) overruns the pixel offset $dataOff")
        require(54 + 4 * n <= bytes.length, "color table overruns file")
        Array.tabulate(n) { j =>
          val o = 54 + 4 * j // B, G, R, reserved
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) |
            (bytes(o) & 0xff)
        }
      } else null
    val stride = if (bpp == 8) rowStride8(width) else rowStride(width)
    val need = dataOff.toLong + stride.toLong * height
    require(dataOff >= 54, s"pixel offset $dataOff inside headers")
    require(need <= bytes.length,
      s"pixel array [$dataOff, $need) overruns the file (${bytes.length} bytes)")
    require(declaredSize >= need,
      s"declared file size $declaredSize smaller than pixel array end $need")
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      // storage row y sits at the top when top-down, at the bottom
      // otherwise; the API is always top-down row-major
      val apiRow = if (topDown) y else height - 1 - y
      val ro = dataOff + y * stride
      var x = 0
      while (x < width) {
        px(apiRow * width + x) =
          if (bpp == 8) {
            val idx = bytes(ro + x) & 0xff
            require(idx < palette.length,
              s"palette index $idx at ($x,$apiRow) out of range " +
                s"(${palette.length}-entry color table)")
            palette(idx)
          } else {
            val o = ro + 3 * x
            ((bytes(o + 2) & 0xff) << 16) |
              ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
          }
        x += 1
      }
      y += 1
    }
    Bmp(width, height, topDown, px)
  }

  /** Encode 24-bit BI_RGB from top-down row-major 0xRRGGBB pixels.
    * `topDown = false` writes the common bottom-up layout (positive
    * biHeight); `true` writes negative-height top-down — the encoder
    * half exists so every parse path (row flip, padding skip) has a
    * generator for round-trip testing and fixture synthesis. */
  def encode24(width: Int, height: Int, pixels: Array[Int],
      topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(pixels.length == width * height,
      s"${pixels.length} pixels for ${width}x$height")
    val stride = rowStride(width)
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(width)
      .putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = 0
    while (y < height) {
      val apiRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        val p = pixels(apiRow * width + x)
        out.put((p & 0xff).toByte) // B
          .put(((p >> 8) & 0xff).toByte) // G
          .put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y += 1
    }
    out.array()
  }

  /** Encode 8-bit palette BI_RGB from top-down row-major palette
    * indices and a 0xRRGGBB palette (1..256 entries, written as the
    * BGRX color table with biClrUsed set explicitly). The generator
    * half for the palette decode path — same row orders and padding
    * discipline as [[encode24]]. */
  def encode8(width: Int, height: Int, indices: Array[Int],
      palette: Array[Int], topDown: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(indices.length == width * height,
      s"${indices.length} indices for ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette has ${palette.length} entries (1..256)")
    indices.zipWithIndex.foreach { case (idx, k) =>
      require(idx >= 0 && idx < palette.length,
        s"index $idx at (${k % width},${k / width}) out of palette range " +
          s"(${palette.length})")
    }
    val stride = rowStride8(width)
    val dataOff = 54 + 4 * palette.length
    val dataSize = stride * height
    val fileSize = dataOff + dataSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(dataOff)
    out.putInt(40).putInt(width)
      .putInt(if (topDown) -height else height)
      .putShort(1).putShort(8).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835)
      .putInt(palette.length).putInt(0) // biClrUsed, biClrImportant
    palette.foreach { p =>
      out.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte)
        .put(((p >> 16) & 0xff).toByte).put(0.toByte)
    }
    var y = 0
    while (y < height) {
      val apiRow = if (topDown) y else height - 1 - y
      var x = 0
      while (x < width) {
        out.put(indices(apiRow * width + x).toByte)
        x += 1
      }
      var pad = stride - width
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y += 1
    }
    out.array()
  }
}
