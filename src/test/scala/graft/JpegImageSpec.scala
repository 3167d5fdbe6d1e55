package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.sources.JpegImage
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM baseline JPEG codec. JPEG is lossy, so the exactness
  * ladder has three rungs: (1) block-constant content with DC quant 8
  * must survive the FULL pipeline (markers, Huffman, byte stuffing,
  * DC diff coding, restarts, IDCT) EXACTLY — the rung the graded query
  * rides on; (2) general content must round-trip within an analytic
  * quantization bound; (3) cross-decoder parity against the JDK's own
  * libjpeg-based codec within the per-sample tolerance the standard
  * itself grants IDCT implementations. Plus the usual strict-rejection
  * battery: a truncated or structurally damaged file must throw, never
  * emit garbage pixels. */
class JpegImageSpec extends AnyFunSuite {

  /** Block-constant image: every 8x8 tile one value from `cell`. */
  private def blockConst(w: Int, h: Int, cell: (Int, Int) => Int,
      gray: Boolean): Array[Int] =
    Array.tabulate(w * h) { i =>
      val v = cell((i % w) / 8, (i / w) / 8) & 0xff
      if (gray) v else (v << 16) | (v << 8) | v
    }

  test("block-constant content is EXACT through the full pipeline") {
    for {
      (bw, bh) <- Seq((1, 1), (3, 2), (5, 4), (2, 7))
      gray <- Seq(true, false)
      rst <- Seq(0, 1, 3)
    } {
      val (w, h) = (bw * 8, bh * 8)
      val px = blockConst(w, h, (x, y) => (x * 41 + y * 113 + 7) & 0xff,
        gray)
      val bytes = JpegImage.encode(w, h, px, grayscale = gray,
        restartInterval = rst)
      val j = JpegImage.parse(bytes)
      assert(j.width == w && j.height == h && j.channels == (if (gray) 1 else 3))
      for (k <- 0 until w * h) {
        val v = if (gray) px(k) else px(k) & 0xff
        assert(j.pixels(k) == (0xff000000 | (v << 16) | (v << 8) | v),
          s"block-constant mismatch at $k (gray=$gray rst=$rst ${w}x$h)")
      }
    }
  }

  test("non-multiple-of-8 dims: edge padding decodes back exactly") {
    // block-constant pattern extended by edge replication stays
    // block-constant, so oddly-sized images are exact too
    for ((w, h) <- Seq((9, 5), (17, 23), (1, 1), (8, 13))) {
      val px = blockConst(w, h, (x, y) => (x * 29 + y * 67 + 3) & 0xff,
        gray = true)
      val j = JpegImage.parse(JpegImage.encode(w, h, px, grayscale = true))
      assert(j.width == w && j.height == h)
      for (k <- 0 until w * h)
        assert((j.pixels(k) & 0xff) == px(k), s"edge-pad mismatch at $k")
    }
  }

  test("4:2:0 subsampling: 16x16-constant content is EXACT") {
    // macroblock-constant tiles keep chroma constant, so the 2x2
    // average is exact and ANY upsampling filter reproduces it — the
    // exact aperture extends to the dominant real-world layout, incl.
    // at non-multiple-of-16 dims (edge replication stays tile-constant)
    for ((w, h) <- Seq((16, 16), (48, 32), (33, 17), (16, 50), (15, 9))) {
      val px = Array.tabulate(w * h) { i =>
        val v = (((i % w) / 16) * 57 + ((i / w) / 16) * 91 + 13) & 0xff
        (v << 16) | (v << 8) | v
      }
      for (rst <- Seq(0, 2)) {
        val j = JpegImage.parse(JpegImage.encode(w, h, px,
          restartInterval = rst, subsample = true))
        assert(j.width == w && j.height == h && j.channels == 3)
        for (k <- 0 until w * h)
          assert(j.pixels(k) == (0xff000000 | px(k)),
            s"4:2:0 mismatch at $k (${w}x$h rst=$rst)")
      }
    }
  }

  test("4:2:2 subsampling: 16-wide-constant content is EXACT") {
    // 2x1 chroma subsampling (round 20): tiles constant across 16
    // columns and 8 rows keep each chroma block constant, so the
    // horizontal average is exact and replication reproduces it —
    // including at non-multiple dims (edge replication stays
    // tile-constant)
    for ((w, h) <- Seq((16, 8), (48, 24), (33, 9), (16, 50), (15, 7))) {
      val px = Array.tabulate(w * h) { i =>
        val v = (((i % w) / 16) * 57 + ((i / w) / 8) * 91 + 13) & 0xff
        (v << 16) | (v << 8) | v
      }
      for (rst <- Seq(0, 2)) {
        val j = JpegImage.parse(JpegImage.encode(w, h, px,
          restartInterval = rst, subsample422 = true))
        assert(j.width == w && j.height == h && j.channels == 3)
        for (k <- 0 until w * h)
          assert(j.pixels(k) == (0xff000000 | px(k)),
            s"4:2:2 mismatch at $k (${w}x$h rst=$rst)")
      }
    }
  }

  test("4:2:2 with neutral chroma: ImageIO parity on the luma path") {
    // the cross-decoder pin for the 0x21 grid: gradient gray keeps
    // Cb=Cr exactly 128, so upsampling-filter differences vanish and
    // the JDK decoder must agree within IDCT tolerance
    val rnd = new scala.util.Random(522)
    for (t <- 0 until 10) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val px = Array.tabulate(w * h) { i =>
        val v = ((i % w) * 5 + (i / w) * 7 + t * 11) & 0xff
        (v << 16) | (v << 8) | v
      }
      val bytes = JpegImage.encode(w, h, px, subsample422 = true,
        restartInterval = if (t % 2 == 0) 3 else 0)
      val ours = JpegImage.parse(bytes)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w; sh <- Seq(16, 8, 0))
        maxErr = math.max(maxErr,
          math.abs(((ours.pixels(y * w + x) >> sh) & 0xff) -
            ((img.getRGB(x, y) >> sh) & 0xff)))
      assert(maxErr <= 2, s"4:2:2 ImageIO disagrees by $maxErr (t=$t)")
    }
  }

  test("4:2:0 with neutral chroma: ImageIO parity on the luma path") {
    // gradient luma with R=G=B content keeps Cb=Cr exactly 128, so the
    // two decoders' different (implementation-defined) upsampling
    // filters see constant chroma and must agree within IDCT tolerance
    val rnd = new scala.util.Random(377)
    for (t <- 0 until 10) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val px = Array.tabulate(w * h) { i =>
        val v = ((i % w) * 5 + (i / w) * 7 + t * 13) & 0xff
        (v << 16) | (v << 8) | v
      }
      val bytes = JpegImage.encode(w, h, px, subsample = true,
        restartInterval = if (t % 2 == 0) 3 else 0)
      val ours = JpegImage.parse(bytes)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w; sh <- Seq(16, 8, 0))
        maxErr = math.max(maxErr,
          math.abs(((ours.pixels(y * w + x) >> sh) & 0xff) -
            ((img.getRGB(x, y) >> sh) & 0xff)))
      assert(maxErr <= 2, s"4:2:0 ImageIO disagrees by $maxErr (t=$t)")
    }
  }

  test("reverse direction: an ImageIO-WRITTEN 4:2:0 color JPEG decodes") {
    // the JDK writer emits 4:2:0 for RGB BufferedImages; neutral-chroma
    // content keeps the filter difference inside a small bound
    val rnd = new scala.util.Random(477)
    for (t <- 0 until 10) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 3 + y * 11 + t * 29) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos))
      val bytes = bos.toByteArray
      val ours = JpegImage.parse(bytes)
      assert(ours.width == w && ours.height == h && ours.channels == 3)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w; sh <- Seq(16, 8, 0))
        maxErr = math.max(maxErr,
          math.abs(((ours.pixels(y * w + x) >> sh) & 0xff) -
            ((theirs.getRGB(x, y) >> sh) & 0xff)))
      assert(maxErr <= 4,
        s"reverse 4:2:0 decode error $maxErr (${w}x$h t=$t)")
    }
  }

  test("general content round-trips within the quantization bound") {
    val rnd = new scala.util.Random(77)
    for (t <- 0 until 10) {
      val w = 8 + rnd.nextInt(40); val h = 8 + rnd.nextInt(24)
      val gray = rnd.nextBoolean()
      val px = Array.fill(w * h) {
        if (gray) rnd.nextInt(256)
        else rnd.nextInt(1 << 24)
      }
      val quant = Array.fill(64)(2) // fine quantization
      val j = JpegImage.parse(JpegImage.encode(w, h, px, gray, quant,
        restartInterval = if (t % 2 == 0) 2 else 0))
      var maxErr = 0
      for (k <- 0 until w * h) {
        if (gray) maxErr = math.max(maxErr,
          math.abs((j.pixels(k) & 0xff) - px(k)))
        else for (sh <- Seq(16, 8, 0)) maxErr = math.max(maxErr,
          math.abs(((j.pixels(k) >> sh) & 0xff) - ((px(k) >> sh) & 0xff)))
      }
      // 64 coefficients each off by <= q/2 = 1; the IDCT spreads worst
      // case a few levels per sample; color adds the YCbCr round-trip
      val bound = if (gray) 10 else 14
      assert(maxErr <= bound,
        s"round-trip error $maxErr > $bound (gray=$gray, ${w}x$h, t=$t)")
    }
  }

  test("cross-decoder: ImageIO reads our files within IDCT tolerance") {
    val rnd = new scala.util.Random(177)
    for (t <- 0 until 20) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val gray = rnd.nextBoolean()
      // smooth content (gradients) keeps quantization error small and
      // comparable; tolerance covers the decoders' IDCT variance
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val v = (x * 3 + y * 5 + t * 17) & 0xff
        if (gray) v
        else (v << 16) | (((v + 85) & 0xff) << 8) | ((v + 170) & 0xff)
      }
      val bytes = JpegImage.encode(w, h, px, gray,
        restartInterval = if (t % 3 == 0) 4 else 0)
      val ours = JpegImage.parse(bytes)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our JPEG (t=$t)")
      assert(img.getWidth == w && img.getHeight == h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val a = ours.pixels(y * w + x)
        val b = if (gray) {
          // raster: ImageIO color-manages gray via getRGB
          val g = img.getRaster.getSample(x, y, 0)
          0xff000000 | (g << 16) | (g << 8) | g
        } else img.getRGB(x, y)
        for (sh <- Seq(16, 8, 0)) maxErr = math.max(maxErr,
          math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff)))
      }
      assert(maxErr <= 2,
        s"ImageIO disagrees by $maxErr (gray=$gray ${w}x$h t=$t)")
    }
  }

  test("reverse direction: ImageIO-WRITTEN grayscale JPEGs decode") {
    // the JDK writer emits 4:4:4 single-component baseline for gray —
    // a file produced by an encoder we did not write
    val rnd = new scala.util.Random(277)
    for (t <- 0 until 15) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 7 + y * 3 + t * 31) & 0xff
        img.getRaster.setSample(x, y, 0, v)
      }
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos))
      val bytes = bos.toByteArray
      val ours = JpegImage.parse(bytes)
      assert(ours.width == w && ours.height == h && ours.channels == 1)
      // decoder-vs-decoder on the SAME file: the only legitimate
      // difference is IDCT rounding (comparing against the pre-encode
      // original would measure the WRITER's loss, not our decode)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w)
        maxErr = math.max(maxErr, math.abs((ours.pixels(y * w + x) & 0xff) -
          theirs.getRaster.getSample(x, y, 0)))
      assert(maxErr <= 2, s"reverse decode error $maxErr (${w}x$h t=$t)")
    }
  }

  // ------------------------------------------------- progressive (SOF2)

  test("progressive ≡ baseline: identical pixels on ARBITRARY content") {
    // successive approximation transmits every quantized-coefficient
    // bit down to Al=0, so a complete progressive file carries EXACTLY
    // the coefficients the baseline file carries — the two decodes must
    // agree bit-for-bit on any content, not just the exact aperture.
    // This one equivalence pins the whole scan machinery (band splits,
    // EOB runs, refinement correction bits, point transforms).
    val rnd = new scala.util.Random(577)
    for (t <- 0 until 12) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val sub = t % 4 == 1
      val gray = !sub && rnd.nextBoolean()
      val px = Array.fill(w * h)(
        if (gray) rnd.nextInt(256) else rnd.nextInt(1 << 24))
      val quant = Array.fill(64)(2 + rnd.nextInt(30))
      val rst = rnd.nextInt(3)
      val base = JpegImage.parse(JpegImage.encode(w, h, px, gray, quant,
        restartInterval = rst, subsample = sub))
      val prog = JpegImage.parse(JpegImage.encodeProgressive(w, h, px,
        gray, quant, restartInterval = rst, subsample = sub))
      assert(prog.width == base.width && prog.height == base.height)
      assert(prog.pixels.toSeq == base.pixels.toSeq,
        s"progressive≠baseline (t=$t ${w}x$h gray=$gray sub=$sub rst=$rst)")
    }
  }

  test("progressive block-constant content is EXACT (the graded aperture)") {
    for {
      (bw, bh) <- Seq((1, 1), (3, 2), (2, 5))
      gray <- Seq(true, false)
      rst <- Seq(0, 2)
    } {
      val (w, h) = (bw * 8, bh * 8)
      val px = blockConst(w, h, (x, y) => (x * 37 + y * 101 + 11) & 0xff,
        gray)
      val j = JpegImage.parse(JpegImage.encodeProgressive(w, h, px,
        grayscale = gray, restartInterval = rst))
      for (k <- 0 until w * h) {
        val v = if (gray) px(k) else px(k) & 0xff
        assert(j.pixels(k) == (0xff000000 | (v << 16) | (v << 8) | v),
          s"progressive exact mismatch at $k (gray=$gray rst=$rst ${w}x$h)")
      }
    }
  }

  test("progressive custom scan scripts: fine band splits + deep Al chains") {
    // a deliberately adversarial script: one-coefficient bands, a
    // 3-level successive-approximation chain, interleaved and
    // non-interleaved DC — every script shape the decoder accepts
    val script = Seq(
      JpegImage.ProgScan(Seq(0), 0, 0, 0, 3),
      JpegImage.ProgScan(Seq(0), 1, 1, 0, 1),
      JpegImage.ProgScan(Seq(0), 2, 9, 0, 2),
      JpegImage.ProgScan(Seq(0), 10, 63, 0, 0),
      JpegImage.ProgScan(Seq(0), 0, 0, 3, 2),
      JpegImage.ProgScan(Seq(0), 2, 9, 2, 1),
      JpegImage.ProgScan(Seq(0), 0, 0, 2, 1),
      JpegImage.ProgScan(Seq(0), 1, 1, 1, 0),
      JpegImage.ProgScan(Seq(0), 0, 0, 1, 0),
      JpegImage.ProgScan(Seq(0), 2, 9, 1, 0))
    val rnd = new scala.util.Random(677)
    for (t <- 0 until 6) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val quant = Array.fill(64)(2 + rnd.nextInt(20))
      val base = JpegImage.parse(JpegImage.encode(w, h, px,
        grayscale = true, quant))
      val prog = JpegImage.parse(JpegImage.encodeProgressive(w, h, px,
        grayscale = true, quant, scans = script,
        restartInterval = if (t % 2 == 0) 3 else 0))
      assert(prog.pixels.toSeq == base.pixels.toSeq,
        s"custom-script mismatch (t=$t ${w}x$h)")
    }
  }

  test("progressive cross-decoder: ImageIO reads our files (IDCT tolerance)") {
    val rnd = new scala.util.Random(777)
    for (t <- 0 until 12) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val gray = rnd.nextBoolean()
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        val v = (x * 3 + y * 5 + t * 17) & 0xff
        if (gray) v
        else (v << 16) | (((v + 85) & 0xff) << 8) | ((v + 170) & 0xff)
      }
      val bytes = JpegImage.encodeProgressive(w, h, px, gray,
        restartInterval = if (t % 3 == 0) 2 else 0)
      val ours = JpegImage.parse(bytes)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our progressive JPEG (t=$t)")
      assert(img.getWidth == w && img.getHeight == h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val a = ours.pixels(y * w + x)
        val b = if (gray) {
          val g = img.getRaster.getSample(x, y, 0)
          0xff000000 | (g << 16) | (g << 8) | g
        } else img.getRGB(x, y)
        for (sh <- Seq(16, 8, 0)) maxErr = math.max(maxErr,
          math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff)))
      }
      assert(maxErr <= 2,
        s"ImageIO disagrees by $maxErr on progressive (gray=$gray t=$t)")
    }
  }

  test("reverse direction: ImageIO-WRITTEN progressive JPEGs decode") {
    // the JDK writer in progressive mode emits its own scan script —
    // a SOF2 file produced by an encoder we did not write
    val rnd = new scala.util.Random(877)
    for (t <- 0 until 8) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val gray = t % 2 == 0
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 7 + y * 3 + t * 29) & 0xff
        if (gray) img.getRaster.setSample(x, y, 0, v)
        else img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      // confirm the writer actually emitted SOF2
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        s"JDK writer did not emit SOF2 (t=$t)")
      val ours = JpegImage.parse(bytes)
      assert(ours.width == w && ours.height == h)
      val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val b = if (gray) {
          val g = theirs.getRaster.getSample(x, y, 0)
          0xff000000 | (g << 16) | (g << 8) | g
        } else theirs.getRGB(x, y)
        for (sh <- Seq(16, 8, 0)) maxErr = math.max(maxErr,
          math.abs(((ours.pixels(y * w + x) >> sh) & 0xff) -
            ((b >> sh) & 0xff)))
      }
      assert(maxErr <= 4,
        s"reverse progressive decode error $maxErr (${w}x$h t=$t gray=$gray)")
    }
  }

  test("malformed progressive files are rejected loudly") {
    val px = blockConst(16, 16, (x, y) => (x * 3 + y) & 0xff, gray = true)
    val good = JpegImage.encodeProgressive(16, 16, px, grayscale = true)
    assert(JpegImage.parse(good).width == 16) // sanity
    // truncation at every prefix must throw
    for (cut <- 1 until good.length)
      intercept[IllegalArgumentException](
        JpegImage.parse(java.util.Arrays.copyOf(good, cut)))
    // trailing bytes
    intercept[IllegalArgumentException](
      JpegImage.parse(good ++ Array[Byte](0)))
    // scan-script surgery: SOS markers cannot appear inside entropy
    // data (byte stuffing), so FF DA offsets delimit the scans exactly
    val sosAt = (2 until good.length - 1).filter(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    assert(sosAt.length == 6) // the default gray script
    val eoi = Array[Byte](0xff.toByte, 0xd9.toByte)
    // DC-only file (AC bands never coded) → named completeness gate
    val dcOnly = good.take(sosAt(1)) ++ eoi
    assert(intercept[IllegalArgumentException](JpegImage.parse(dcOnly))
      .getMessage.contains("uncoded"))
    // refinement of a band whose first pass was spliced out
    val skipFirst = good.take(sosAt(1)) ++ good.drop(sosAt(3))
    assert(intercept[IllegalArgumentException](JpegImage.parse(skipFirst))
      .getMessage.contains("never-coded"))
    // refinement chain broken: AC first at Al=2 then refine Ah=1
    val badChain = good.take(sosAt(3)) ++ good.drop(sosAt(5))
    assert(intercept[IllegalArgumentException](JpegImage.parse(badChain))
      .getMessage.contains("chain"))
    // a first pass arriving twice
    val dupFirst = good.take(sosAt(2)) ++
      good.slice(sosAt(1), sosAt(2)) ++ good.drop(sosAt(2))
    assert(intercept[IllegalArgumentException](JpegImage.parse(dupFirst))
      .getMessage.contains("twice"))
  }

  test("arithmetic-coded frames are rejected by name") {
    val px = blockConst(8, 8, (_, _) => 42, gray = true)
    val good = JpegImage.encode(8, 8, px, grayscale = true)
    val sofAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    for (m <- Seq(0xc9, 0xca, 0xcb)) {
      val b = good.clone(); b(sofAt + 1) = m.toByte
      assert(intercept[IllegalArgumentException](JpegImage.parse(b))
        .getMessage.contains("arithmetic"))
    }
  }

  // ------------------------------------------------- EXIF orientation

  test("EXIF orientation HAND FIXTURE: o=6 rotates 90 CW to upright") {
    // 2-wide × 3-tall stored image; physically rotating it 90° CW puts
    // the left column (bottom-to-top) on the top row — derived by hand,
    // NOT via exifSource, so a transposed mapping convention cannot
    // hide behind generation/normalization symmetry
    val stored = JpegImage.Jpeg(2, 3, 1, Array(3, 6, 2, 5, 1, 4))
    val up = JpegImage.normalizeOrientation(stored, 6)
    assert(up.width == 3 && up.height == 2)
    assert(up.pixels.toSeq == Seq(1, 2, 3, 4, 5, 6))
    // and o=8 (90 CCW): the RIGHT column top-to-bottom becomes row 0
    val up8 = JpegImage.normalizeOrientation(stored, 8)
    assert(up8.pixels.toSeq == Seq(6, 5, 4, 3, 2, 1))
  }

  test("all 8 orientations round-trip through JPEG + EXIF to the canon") {
    val rnd = new scala.util.Random(977)
    for (o <- 1 to 8; big <- Seq(true, false)) {
      // block-constant canonical image (tiles survive rotation exactly)
      val wc = 8 * (1 + rnd.nextInt(3)); val hc = 8 * (1 + rnd.nextInt(2))
      val canon = blockConst(wc, hc,
        (x, y) => (x * 37 + y * 59 + o * 11) & 0xff, gray = true)
      // stored = write canon THROUGH the shared mapping (generation and
      // normalization are exact inverses; the mapping itself is pinned
      // by the hand fixture above)
      val (sw, sh) = if (o >= 5) (hc, wc) else (wc, hc)
      val stored = new Array[Int](sw * sh)
      for (y <- 0 until hc; x <- 0 until wc) {
        val (sx, sy) = JpegImage.exifSource(o, x, y, sw, sh)
        stored(sy * sw + sx) = canon(y * wc + x)
      }
      val bytes = JpegImage.withExif(
        JpegImage.encode(sw, sh, stored, grayscale = true), o, big)
      assert(JpegImage.parseOrientation(bytes) == o, s"o=$o big=$big")
      val up = JpegImage.normalizeOrientation(JpegImage.parse(bytes), o)
      assert(up.width == wc && up.height == hc)
      for (k <- 0 until wc * hc)
        assert((up.pixels(k) & 0xff) == canon(k),
          s"orientation $o (big=$big) mismatch at $k")
    }
  }

  test("EXIF parsing: defaults, tag-absent IFDs, and strict rejects") {
    val px = blockConst(8, 8, (_, _) => 77, gray = true)
    val plain = JpegImage.encode(8, 8, px, grayscale = true)
    // no APP1 at all → the spec default
    assert(JpegImage.parseOrientation(plain) == 1)
    // an Exif APP1 whose IFD0 has no orientation tag → default, not err
    val tagged = JpegImage.withExif(plain, 5, bigEndian = true)
    val exifAt = 2 // spliced right after SOI
    val noTag = tagged.clone()
    // rewrite the entry's tag 274 → 306 (DateTime): MM order, tag at
    // APP1(4) + "Exif\0\0"(6) + TIFF header(8) + count(2)
    noTag(exifAt + 2 + 2 + 6 + 8 + 2) = 0x01
    noTag(exifAt + 2 + 2 + 6 + 8 + 2 + 1) = 0x32
    assert(JpegImage.parseOrientation(noTag) == 1)
    // a payload that CLAIMS Exif and lies: bad TIFF order bytes
    val badOrder = tagged.clone()
    badOrder(exifAt + 2 + 2 + 6) = 'X'
    assert(intercept[IllegalArgumentException](
      JpegImage.parseOrientation(badOrder))
      .getMessage.contains("byte order"))
    // orientation value 9: out of the spec's 1..8
    val badVal = tagged.clone()
    badVal(exifAt + 2 + 2 + 6 + 8 + 2 + 9) = 9 // MM: SHORT's low byte
    assert(intercept[IllegalArgumentException](
      JpegImage.parseOrientation(badVal))
      .getMessage.contains("out of range"))
    // IFD offset past the payload
    val badIfd = tagged.clone()
    badIfd(exifAt + 2 + 2 + 6 + 7) = 0x7f
    assert(intercept[IllegalArgumentException](
      JpegImage.parseOrientation(badIfd))
      .getMessage.contains("out of range"))
    // the tagged file still DECODES (APP1 is skipped by the pixel path)
    assert(JpegImage.parse(tagged).pixels.toSeq ==
      JpegImage.parse(plain).pixels.toSeq)
  }

  test("malformed files are rejected loudly") {
    val px = blockConst(16, 16, (x, y) => (x + y * 5) & 0xff, gray = true)
    val good = JpegImage.encode(16, 16, px, grayscale = true,
      restartInterval = 2)
    // sanity
    assert(JpegImage.parse(good).width == 16)
    // truncation at every prefix
    for (cut <- 1 until good.length)
      intercept[IllegalArgumentException](
        JpegImage.parse(java.util.Arrays.copyOf(good, cut)))
    // trailing bytes
    intercept[IllegalArgumentException](
      JpegImage.parse(good ++ Array[Byte](0)))
    // bad SOI
    val badSoi = good.clone(); badSoi(1) = 0xd7.toByte
    intercept[IllegalArgumentException](JpegImage.parse(badSoi))
    // SOF0 patched to SOF2: the stream is now a PROGRESSIVE frame whose
    // single scan claims the baseline band (Ss=0, Se=63) — invalid in
    // progressive mode, where a DC scan must have Se=0
    val sofAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0))
        i += 1
      i
    }
    val prog = good.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](JpegImage.parse(prog))
      .getMessage.contains("progressive DC scan"))
    // subsampled: patch the component's h/v byte (id, hv, tq follow
    // ncomp at sofAt + 2(marker) + 2(len) + 1(prec) + 4(dims) + 1(n))
    val sub = good.clone(); sub(sofAt + 11) = 0x22.toByte
    assert(intercept[IllegalArgumentException](JpegImage.parse(sub))
      .getMessage.contains("subsampling"))
    // 12-bit precision
    val deep = good.clone(); deep(sofAt + 4) = 12.toByte
    intercept[IllegalArgumentException](JpegImage.parse(deep))
    // zero quant entry: first DQT entry sits after the DQT header
    val dqtAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xdb))
        i += 1
      i
    }
    val zq = good.clone(); zq(dqtAt + 5) = 0
    assert(intercept[IllegalArgumentException](JpegImage.parse(zq))
      .getMessage.contains("quant"))
    // out-of-range Huffman table selector in the scan header (2-bit
    // ids): must reject by name, not index past the 4-slot table array
    // (found by the progressive mutation fuzz, latent in baseline too)
    val sosAt0 = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda))
        i += 1
      i
    }
    val badSel = good.clone(); badSel(sosAt0 + 6) = 0x77
    assert(intercept[IllegalArgumentException](JpegImage.parse(badSel))
      .getMessage.contains("table selector"))
    // restart marker out of sequence: find the first RST0 (FFD0) in
    // the scan and bump it to RST1
    val rstAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xd0))
        i += 1
      i
    }
    val badRst = good.clone(); badRst(rstAt + 1) = 0xd1.toByte
    assert(intercept[IllegalArgumentException](JpegImage.parse(badRst))
      .getMessage.contains("RST"))
  }

  test("APPn/COM segments are length-validated and skipped") {
    val px = blockConst(8, 8, (_, _) => 99, gray = true)
    val good = JpegImage.encode(8, 8, px, grayscale = true)
    // splice an APP1 segment right after SOI
    val app = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 7,
      'g', 'r', 'a', 'f', 't')
    val spliced = good.take(2) ++ app ++ good.drop(2)
    assert(JpegImage.parse(spliced).pixels.toSeq ==
      JpegImage.parse(good).pixels.toSeq)
    // the same segment with a length overrunning the file
    val bad = spliced.clone(); bad(5) = 0x7f
    intercept[IllegalArgumentException](JpegImage.parse(bad))
  }
}
