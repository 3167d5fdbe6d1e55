package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.sources.{BmpImage, GifImage, PngImage}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-decoder parity against the JDK's OWN image codecs
  * (javax.imageio — an independent implementation shipped with the
  * platform, no new dependency): every container our encoders emit is
  * ALSO decoded by ImageIO and must agree pixel-for-pixel with our
  * strict parsers. This closes the one risk class round-trip tests and
  * hand fixtures can only sample: an encoder and decoder agreeing on a
  * shared misreading of the spec. Round-trips proved self-consistency;
  * hand fixtures pinned single points; this pins EVERY generated
  * layout against a decoder we did not write.
  *
  * Scope notes: ImageIO's PNG reader handles all our layouts (8/16-bit,
  * all color types, Adam7). Grayscale comparisons go through the RASTER
  * (raw samples), not getRGB — ImageIO color-manages gray through a
  * linear ColorSpace on the way to sRGB ints, which is presentation,
  * not decoding. 16-bit comparisons are also raster-level: ImageIO's
  * full 16-bit samples must equal the encoder's channel inputs exactly,
  * and our 8-bit face must be their high bytes. GIF transparency maps
  * to ImageIO's ARGB alpha 0. Two exclusions, each verified
  * empirically, bounded, and covered on OUR side by other tests:
  * (1) the JDK's GIFImageReader mis-renders INTERLACED GIFs of height
  * 2..4 (its progressive row replication overfills and later passes
  * never restore rows 1..3; heights 1 and ≥5 agree perfectly, and our
  * hand-built interlace fixture plus the h≥5 sweep pin the row order)
  * — interlaced parity asserts h ≥ 5; (2) the same reader shifts
  * pixels when LZW data sub-blocks are 1..3 bytes (legal per spec —
  * sizes 1..255; ≥4 agrees perfectly across a 200-config sweep, and
  * our own 1-byte-sub-block handling is pinned by the rewrapped
  * fixture in GifImageSpec and the split=1..255 fuzz) — parity asserts
  * splits ≥ 4. */
class CrossDecoderSpec extends AnyFunSuite {

  private def imageIoArgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not read the container")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    (w, h, px)
  }

  test("PNG: every 8-bit layout x filters x interlace agrees with ImageIO") {
    val rnd = new scala.util.Random(1501)
    for (t <- 0 until 120) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(14)
      // Adam7 emits ~1.875*h output scanlines; filterFor sees the
      // GLOBAL output row index, so the table must cover them all
      val filters = Array.fill(2 * h + 16)(rnd.nextInt(5))
      val split = 1 + rnd.nextInt(200)
      val interlaced = rnd.nextBoolean()
      val (bytes, kind) = rnd.nextInt(5) match {
        case 0 => (PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          withAlpha = false, y => filters(y), split, interlaced), "rgb")
        case 1 => (PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          withAlpha = true, y => filters(y), split, interlaced), "rgba")
        case 2 => (PngImage.encodeGray(w, h,
          Array.fill(w * h)(rnd.nextInt(256)),
          filterFor = y => filters(y), idatChunkSize = split,
          interlaced = interlaced), "gray")
        case 3 => (PngImage.encodeGray(w, h,
          Array.fill(w * h)(rnd.nextInt(256)),
          Array.fill(w * h)(rnd.nextInt(256)),
          y => filters(y), split, interlaced), "gray+a")
        case _ =>
          val n = 1 + rnd.nextInt(256)
          val pal = Array.fill(n) {
            val a = if (rnd.nextBoolean()) rnd.nextInt(256) else 0xff
            (a << 24) | (rnd.nextInt() & 0xffffff)
          }
          (PngImage.encodePalette(w, h, Array.fill(w * h)(rnd.nextInt(n)),
            pal, y => filters(y), split, interlaced), "palette")
      }
      val ours = PngImage.parse(bytes)
      if (kind == "gray" || kind == "gray+a") {
        // raster samples: raw decoded values, no color management
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        assert(img.getWidth == w && img.getHeight == h)
        val r = img.getRaster
        for (y <- 0 until h; x <- 0 until w) {
          val g = r.getSample(x, y, 0)
          val a = if (kind == "gray+a") r.getSample(x, y, 1) else 0xff
          val want = (a << 24) | (g << 16) | (g << 8) | g
          assert(ours.pixels(y * w + x) == want,
            s"PNG raster mismatch vs ImageIO ($kind, ($x,$y), t=$t)")
        }
      } else {
        val (iw, ih, ipx) = imageIoArgb(bytes)
        assert(iw == w && ih == h, s"dims differ ($kind, t=$t)")
        assert(ours.pixels.toSeq == ipx.toSeq,
          s"PNG pixel mismatch vs ImageIO ($kind, ${w}x$h, " +
            s"interlaced=$interlaced, t=$t)")
      }
    }
  }

  test("PNG 16-bit: ImageIO's raw samples equal the encoder inputs") {
    val rnd = new scala.util.Random(1601)
    for (t <- 0 until 40) {
      val w = 1 + rnd.nextInt(16); val h = 1 + rnd.nextInt(10)
      val colorType = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val nCh = colorType match { case 0 => 1; case 2 => 3; case 4 => 2
        case _ => 4 }
      val chans = Array.fill(nCh)(Array.fill(w * h)(rnd.nextInt(65536)))
      val bytes = PngImage.encode16(w, h, chans, colorType,
        _ => rnd.nextInt(5), 1 + rnd.nextInt(200), rnd.nextBoolean())
      val ours = PngImage.parse(bytes)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nCh) {
        // the strongest form: ImageIO's FULL 16-bit sample must equal
        // what our encoder wrote, for every channel and both interlace
        // methods — and our 8-bit face is its high byte
        assert(r.getSample(x, y, c) == chans(c)(y * w + x),
          s"16-bit raster mismatch vs ImageIO (type=$colorType, " +
            s"($x,$y) ch=$c, t=$t)")
      }
      for (y <- 0 until h; x <- 0 until w) {
        val hi = (c: Int) => chans(c)(y * w + x) >> 8
        val want = colorType match {
          case 0 => 0xff000000 | (hi(0) << 16) | (hi(0) << 8) | hi(0)
          case 2 => 0xff000000 | (hi(0) << 16) | (hi(1) << 8) | hi(2)
          case 4 => (hi(1) << 24) | (hi(0) << 16) | (hi(0) << 8) | hi(0)
          case _ => (hi(3) << 24) | (hi(0) << 16) | (hi(1) << 8) | hi(2)
        }
        assert(ours.pixels(y * w + x) == want,
          s"16-bit face mismatch (type=$colorType, ($x,$y), t=$t)")
      }
    }
  }

  test("GIF: palettes x interlace x transparency x splits agree with ImageIO") {
    val rnd = new scala.util.Random(1701)
    for (t <- 0 until 120) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(14)
      val n = 1 + rnd.nextInt(256)
      val tIdx = if (rnd.nextBoolean()) rnd.nextInt(n) else -1
      val pal = Array.tabulate(n) { j =>
        val a = if (j == tIdx) 0 else 0xff
        (a << 24) | (rnd.nextInt() & 0xffffff)
      }
      val idx = Array.fill(w * h)(rnd.nextInt(n))
      // JDK GIFImageReader mis-renders interlaced heights 2..4 (see
      // the class doc) — interlaced parity is asserted at h >= 5
      val interlaced = rnd.nextBoolean() && (h >= 5 || h == 1)
      val bytes = GifImage.encode(w, h, idx, pal, interlaced,
        4 + rnd.nextInt(252))
      val ours = GifImage.parse(bytes)
      val (iw, ih, ipx) = imageIoArgb(bytes)
      assert(iw == w && ih == h, s"GIF dims differ (t=$t)")
      var k = 0
      var ok = true
      while (k < w * h && ok) {
        // transparent pixels: we keep the palette RGB under alpha 0;
        // ImageIO's ARGB also zeroes... compare alpha and, for opaque
        // pixels, the full RGB
        val a0 = (ours.pixels(k) >>> 24) & 0xff
        val a1 = (ipx(k) >>> 24) & 0xff
        ok = a0 == a1 && (a0 == 0 || ours.pixels(k) == ipx(k))
        k += 1
      }
      assert(ok, s"GIF pixel mismatch vs ImageIO (${w}x$h, n=$n, t=$t)")
    }
  }

  test("GIF animation: ImageIO sees the same frame count and sizes") {
    val p = Array.tabulate(6)(j => 0xff000000 | (j * 0x112233))
    val geoms = Seq((0, 0, 9, 6, 12), (2, 1, 4, 3, 25), (5, 2, 3, 2, 7))
    val bytes = GifImage.encodeAnimation(9, 6, p, geoms,
      f => Array.tabulate(geoms(f)._3 * geoms(f)._4)(i => (i + f) % 6))
    val ours = GifImage.scanFrames(bytes)
    val rdr = ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(ImageIO.createImageInputStream(
      new ByteArrayInputStream(bytes)))
    val n = rdr.getNumImages(true)
    assert(n == ours.size, s"frame count: ImageIO $n vs scan ${ours.size}")
    for (f <- 0 until n) {
      val img = rdr.read(f)
      assert(img.getWidth == ours(f).width &&
        img.getHeight == ours(f).height,
        s"frame $f dims: ImageIO ${img.getWidth}x${img.getHeight} vs " +
          s"scan ${ours(f).width}x${ours(f).height}")
    }
    rdr.dispose()
  }

  test("reverse direction: ImageIO-WRITTEN PNGs decode through our parser") {
    // the other half of the independence argument: containers produced
    // by an encoder we did not write, decoded by our strict parser
    val rnd = new scala.util.Random(1901)
    for (t <- 0 until 60) {
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(16)
      val typ = Seq(java.awt.image.BufferedImage.TYPE_INT_RGB,
        java.awt.image.BufferedImage.TYPE_INT_ARGB,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)(rnd.nextInt(3))
      val img = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt())
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos))
      val ours = PngImage.parse(bos.toByteArray)
      assert(ours.width == w && ours.height == h)
      var ok = true
      if (typ == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        // compare raw raster samples (getRGB color-manages gray)
        val r = img.getRaster
        for (y <- 0 until h; x <- 0 until w if ok) {
          val g = r.getSample(x, y, 0)
          ok = ours.pixels(y * w + x) ==
            (0xff000000 | (g << 16) | (g << 8) | g)
        }
      } else {
        for (y <- 0 until h; x <- 0 until w if ok)
          ok = ours.pixels(y * w + x) == img.getRGB(x, y)
      }
      assert(ok, s"our decode differs from ImageIO's own pixels (t=$t)")
    }
  }

  test("reverse direction: an ImageIO-WRITTEN GIF decodes through our parser") {
    val rnd = new scala.util.Random(2001)
    for (t <- 0 until 30) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(14)
      // indexed source so the JDK GIF writer needs no quantization
      val pal = Array.tabulate(16)(j => 0xff000000 | (rnd.nextInt() & 0xffffff))
      val cm = new java.awt.image.IndexColorModel(4, 16,
        pal.map(p => ((p >> 16) & 0xff).toByte),
        pal.map(p => ((p >> 8) & 0xff).toByte),
        pal.map(p => (p & 0xff).toByte))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, pal(rnd.nextInt(16)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", bos))
      val ours = GifImage.parse(bos.toByteArray)
      assert(ours.width == w && ours.height == h)
      var ok = true
      for (y <- 0 until h; x <- 0 until w if ok)
        ok = (0xff000000 | ours.pixel(x, y)) == img.getRGB(x, y)
      assert(ok, s"our GIF decode differs from ImageIO's pixels (t=$t)")
    }
  }

  test("WAV: javax.sound.sampled reads our PCM16 bytes back exactly") {
    // same independence argument for the audio container: the JDK's
    // own RIFF/WAV reader (AudioSystem) must recover the exact sample
    // stream our encoder wrote and our parser reports
    import javax.sound.sampled.AudioSystem
    val rnd = new scala.util.Random(2101)
    for (t <- 0 until 30) {
      val rate = 8000 + rnd.nextInt(40000)
      val n = 1 + rnd.nextInt(4000)
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val bytes = graft.sources.WavAudio.encodePcm16Mono(rate, samples)
      val ours = graft.sources.WavAudio.parse(bytes)
      assert(ours.samples.toSeq == samples.toSeq)
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt == rate && fmt.getChannels == 1 &&
        fmt.getSampleSizeInBits == 16, s"WAV header mismatch (t=$t)")
      val raw = in.readAllBytes()
      in.close()
      assert(raw.length == 2 * n, s"WAV payload length (t=$t)")
      for (k <- 0 until n) {
        val v = ((raw(2 * k) & 0xff) | (raw(2 * k + 1) << 8)).toShort.toInt
        assert(v == samples(k), s"WAV sample mismatch at $k (t=$t)")
      }
    }
  }


  test("WAV 24-bit: javax.sound reads our bytes; ours reads JDK-written") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val rnd = new scala.util.Random(2201)
    for (t <- 0 until 15) {
      val rate = 8000 + rnd.nextInt(40000)
      val n = 1 + rnd.nextInt(2000)
      val samples = Array.fill(n)(rnd.nextInt(1 << 24) - (1 << 23))
      // forward: our 24-bit encoder → the JDK's RIFF reader
      val bytes = graft.sources.WavAudio.encodePcm24Mono(rate, samples)
      assert(graft.sources.WavAudio.parse(bytes).samples.toSeq ==
        samples.toSeq)
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      assert(in.getFormat.getSampleSizeInBits == 24 &&
        in.getFormat.getChannels == 1)
      val raw = in.readAllBytes()
      in.close()
      assert(raw.length == 3 * n)
      for (k <- 0 until n) {
        val u = (raw(3 * k) & 0xff) | ((raw(3 * k + 1) & 0xff) << 8) |
          ((raw(3 * k + 2) & 0xff) << 16)
        assert(((u << 8) >> 8) == samples(k),
          s"PCM24 sample mismatch at $k (t=$t)")
      }
      // reverse: a JDK-WRITTEN 24-bit WAV decodes through our parser
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, 24, 1, 3, rate.toFloat, false)
      val payload = new Array[Byte](3 * n)
      for (k <- 0 until n) {
        payload(3 * k) = (samples(k) & 0xff).toByte
        payload(3 * k + 1) = ((samples(k) >> 8) & 0xff).toByte
        payload(3 * k + 2) = ((samples(k) >> 16) & 0xff).toByte
      }
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(payload), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val theirs = graft.sources.WavAudio.parse(bos.toByteArray)
      assert(theirs.bits == 24 && theirs.samples.toSeq == samples.toSeq,
        s"JDK-written PCM24 mismatch (t=$t)")
    }
  }

  test("WAV float: javax.sound reads our tag-3 bytes; ours reads JDK-written") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val rnd = new scala.util.Random(2301)
    for (t <- 0 until 15) {
      val rate = 8000 + rnd.nextInt(40000)
      val n = 1 + rnd.nextInt(2000)
      val samples = Array.fill(n)(rnd.nextFloat() * 2f - 1f)
      // forward: our float encoder → the JDK's RIFF reader
      val bytes = graft.sources.WavAudio.encodeFloat32Mono(rate, samples)
      val in = AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      assert(in.getFormat.getEncoding ==
        AudioFormat.Encoding.PCM_FLOAT && in.getFormat.getChannels == 1)
      val raw = in.readAllBytes()
      in.close()
      assert(raw.length == 4 * n)
      for (k <- 0 until n) {
        val bits = (raw(4 * k) & 0xff) | ((raw(4 * k + 1) & 0xff) << 8) |
          ((raw(4 * k + 2) & 0xff) << 16) | ((raw(4 * k + 3) & 0xff) << 24)
        assert(java.lang.Float.intBitsToFloat(bits) == samples(k),
          s"float sample mismatch at $k (t=$t)")
      }
      // reverse: a JDK-WRITTEN float WAV decodes through our parser
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_FLOAT,
        rate.toFloat, 32, 1, 4, rate.toFloat, false)
      val payload = new Array[Byte](4 * n)
      for (k <- 0 until n) {
        val bits = java.lang.Float.floatToRawIntBits(samples(k))
        for (b <- 0 until 4)
          payload(4 * k + b) = ((bits >> (8 * b)) & 0xff).toByte
      }
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(payload), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val theirs = graft.sources.WavAudio.parse(bos.toByteArray)
      assert(theirs.format == 3 && theirs.nFrames == n)
      for (k <- 0 until n)
        assert(theirs.floatSample(k) == samples(k),
          s"JDK-written float mismatch at $k (t=$t)")
    }
  }

  test("BMP: both row orders agree with ImageIO") {
    val rnd = new scala.util.Random(1801)
    for (t <- 0 until 60) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(14)
      val px = Array.fill(w * h)(rnd.nextInt() & 0xffffff)
      val bytes = BmpImage.encode24(w, h, px, topDown = rnd.nextBoolean())
      val ours = BmpImage.parse(bytes)
      val (iw, ih, ipx) = imageIoArgb(bytes)
      assert(iw == w && ih == h)
      var k = 0
      var ok = true
      while (k < w * h && ok) {
        ok = (ours.pixels(k) | 0xff000000) == ipx(k)
        k += 1
      }
      assert(ok, s"BMP pixel mismatch vs ImageIO (${w}x$h, t=$t)")
    }
  }
}
