package graft.tools

import graft.sources.{BmpImage, GifImage, JpegImage, PdfText, PngImage,
  WavAudio}

/** Generator-driven mutation fuzz for the pure-JVM codec family
  * (BMP / PNG / WAV / PDF) — the DedupFuzz discipline applied to
  * parsers: the hand-written adversarial spec cases prove the KNOWN
  * failure modes; this tool drives randomized ones. Two config classes
  * per codec, all seeded-deterministic:
  *
  *  - ROUND-TRIP: encoder → parser under randomized dims / channels /
  *    filters / IDAT split / orientation / sample counts (including
  *    the pad/stride edge widths: BMP stride padding exercises at
  *    every width mod 4, PNG filters at every type) must recover
  *    every pixel/sample exactly;
  *  - MUTATION: a valid container with one random corruption (byte
  *    flip, truncation, trailing append, 4-byte zero span) must
  *    either REJECT via IllegalArgumentException (a require with a
  *    named reason) or parse to a STRUCTURALLY SOUND result
  *    (pixels.length == w×h, frame-aligned samples) — any other
  *    throwable (ArrayIndexOutOfBounds, NegativeArraySize, zlib
  *    internals leaking) is a garbage path and fails the run.
  *    A mutation that lands in don't-care bytes (BMP row padding,
  *    bytes past the declared BMP file size, WAV junk chunks) parsing
  *    successfully is correct behavior, which is why "rejects" alone
  *    is the wrong oracle.
  *
  * PDF is the outlier: [[PdfText.extract]] is a TOTAL function by
  * contract (malformed input → "" / partial text, never a throw — the
  * S9 FAILED-row isolation shape), so "reject" means degraded output,
  * and the mutation oracles are class-specific instead of
  * parse-or-reject: TRUNCATION must yield a PREFIX of the baseline
  * text (a cut stream is dropped whole — endstream never found — so
  * the result is the text of the surviving complete streams);
  * FLATE-DAMAGE confined to one stream's payload must never throw,
  * must keep every OTHER stream's sentences intact and in order, and
  * must stay size-bounded; HEADER/XREF/TRAILER corruption must leave
  * the extraction EXACTLY equal to baseline (those regions are dead to
  * the content scan). Round-trips drive nested-paren literals, octal
  * escapes and TJ arrays through synthesized multi-object documents
  * with both Flate and raw content streams plus a non-text decoy
  * stream.
  *
  * Run: `sbt "runMain graft.tools.CodecFuzz [seed]"` — prints one
  * summary line and exits nonzero on any failure. No Spark session:
  * the codecs are plain JVM and the fuzz runs in milliseconds.
  */
object CodecFuzz {

  def main(args: Array[String]): Unit = {
    val seed = args.headOption.map(_.toLong).getOrElse(14L)
    val rnd = new scala.util.Random(seed)
    var ran = 0
    var failed = 0
    var lastMutated: Array[Byte] = null // dumped on failure (triage aid)
    def check(name: String)(body: => Unit): Unit = {
      ran += 1
      // the dump below must only ever hold THIS check's payload: a
      // round-trip failure dumping a stale mutation from a previous
      // family would mislead replay triage (advisor find, r18)
      lastMutated = null
      try body catch { case e: Throwable =>
        failed += 1
        System.err.println((s"[codecfuzz] $name FAILED: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}").take(400))
        // triage aid: persist the failing mutated payload so a leak
        // can be replayed outside the rnd stream (the r18 Deflate
        // drain leak was reproduced from exactly this dump)
        if (lastMutated != null)
          java.nio.file.Files.write(java.nio.file.Paths.get(
            s"/tmp/codecfuzz_fail_$name.bin"), lastMutated)
      }
    }
    // mutation oracle: reject-with-reason or structurally sound. The
    // soundness require lives OUTSIDE the rejection try — inside it, its
    // own IllegalArgumentException would be swallowed as an "accepted
    // rejection" and the structural half of the oracle would be dead
    // code (review find on the first cut)
    def mutationCase[T](name: String, parse: () => T)(sound: T => Boolean):
        Unit = check(name) {
      val parsed =
        try Some(parse())
        catch { case _: IllegalArgumentException => None } // named rejection
      parsed.foreach { v =>
        require(sound(v), "parsed but structural invariant broken")
      }
    }
    def mutate(b: Array[Byte]): Array[Byte] = { lastMutated = rnd.nextInt(4) match {
      case 0 => // byte flip
        val c = b.clone()
        val o = rnd.nextInt(c.length)
        c(o) = (c(o) ^ (1 + rnd.nextInt(255))).toByte
        c
      case 1 => java.util.Arrays.copyOf(b, rnd.nextInt(b.length)) // truncate
      case 2 => b ++ Array.fill(1 + rnd.nextInt(16))(rnd.nextInt.toByte)
      case 3 => // zero a 4-byte span
        val c = b.clone()
        val o = rnd.nextInt(math.max(c.length - 4, 1))
        var i = 0
        while (i < 4 && o + i < c.length) { c(o + i) = 0; i += 1 }
        c
    }; lastMutated }
    for (i <- 0 until 40) {
      // width sweeps every stride-padding residue (w mod 4 ∈ 0..3)
      val w = 1 + rnd.nextInt(37)
      val h = 1 + rnd.nextInt(19)
      val topDown = rnd.nextBoolean()
      val px = Array.fill(w * h)(rnd.nextInt() & 0xffffff)
      check(s"bmp_roundtrip_$i") {
        val b = BmpImage.parse(BmpImage.encode24(w, h, px, topDown))
        require(b.width == w && b.height == h, "dims")
        require(b.pixels.toSeq == px.toSeq, "pixels")
      }
    }
    for (i <- 0 until 30) {
      // 8-bit palette round-trip (round 16): color table + index rows
      val w = 1 + rnd.nextInt(21)
      val h = 1 + rnd.nextInt(9)
      val nPal = 1 + rnd.nextInt(256)
      val pal = Array.fill(nPal)(rnd.nextInt() & 0xffffff)
      val idx = Array.fill(w * h)(rnd.nextInt(nPal))
      val topDown = rnd.nextBoolean()
      check(s"bmp8_roundtrip_$i") {
        val b = BmpImage.parse(BmpImage.encode8(w, h, idx, pal, topDown))
        require(b.width == w && b.height == h, "dims")
        var ok = true
        var k = 0
        while (k < w * h && ok) { ok = b.pixels(k) == pal(idx(k)); k += 1 }
        require(ok, "palette pixels")
      }
    }
    for (i <- 0 until 80) {
      val w = 1 + rnd.nextInt(21)
      val h = 1 + rnd.nextInt(9)
      val good =
        if (rnd.nextBoolean())
          BmpImage.encode24(w, h,
            Array.fill(w * h)(rnd.nextInt() & 0xffffff), rnd.nextBoolean())
        else {
          val nPal = 1 + rnd.nextInt(256)
          BmpImage.encode8(w, h, Array.fill(w * h)(rnd.nextInt(nPal)),
            Array.fill(nPal)(rnd.nextInt() & 0xffffff), rnd.nextBoolean())
        }
      val bad = mutate(good)
      mutationCase(s"bmp_mutation_$i", () => BmpImage.parse(bad)) { b =>
        b.width > 0 && b.height > 0 &&
          b.pixels.length == b.width * b.height
      }
    }

    // ---------------------------------------------------------- PNG
    for (i <- 0 until 40) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(15)
      val withAlpha = rnd.nextBoolean()
      val px = Array.fill(w * h)(rnd.nextInt())
      val filters = Array.fill(h)(rnd.nextInt(5))
      val split = 1 + rnd.nextInt(2000)
      check(s"png_roundtrip_$i") {
        val p = PngImage.parse(PngImage.encode(w, h, px, withAlpha,
          y => filters(y), split))
        require(p.width == w && p.height == h, "dims")
        val expected =
          if (withAlpha) px.toSeq
          else px.map(v => 0xff000000 | (v & 0xffffff)).toSeq
        require(p.pixels.toSeq == expected, "pixels")
      }
    }
    for (i <- 0 until 30) {
      val w = 1 + rnd.nextInt(25)
      val h = 1 + rnd.nextInt(12)
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      val withAlpha = rnd.nextBoolean()
      val alpha =
        if (withAlpha) Array.fill(w * h)(rnd.nextInt(256))
        else Array.emptyIntArray
      check(s"png_gray_roundtrip_$i") {
        val p = PngImage.parse(PngImage.encodeGray(w, h, gray, alpha,
          y => (y + i) % 5, 1 + rnd.nextInt(500)))
        require(p.hasAlpha == withAlpha, "alpha flag")
        var ok = true
        var k = 0
        while (k < w * h && ok) {
          val g = gray(k)
          ok = p.pixels(k) == (((if (withAlpha) alpha(k) else 0xff) << 24) |
            (g << 16) | (g << 8) | g)
          k += 1
        }
        require(ok, "gray pixels")
      }
    }
    for (i <- 0 until 30) {
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(12)
      val nPal = 1 + rnd.nextInt(256)
      val withTrns = rnd.nextBoolean()
      val pal = Array.fill(nPal) {
        val a = if (withTrns) rnd.nextInt(256) else 0xff
        (a << 24) | rnd.nextInt(1 << 24)
      }
      val idx = Array.fill(w * h)(rnd.nextInt(nPal))
      val filters = Array.fill(h)(rnd.nextInt(5))
      check(s"png_palette_roundtrip_$i") {
        val p = PngImage.parse(PngImage.encodePalette(w, h, idx, pal,
          y => filters(y), 1 + rnd.nextInt(300)))
        require(p.width == w && p.height == h, "dims")
        var k = 0
        var ok = true
        // decode resolves every index through PLTE/tRNS back to the
        // exact 0xAARRGGBB entry (opaque entries past the tRNS table
        // default to 0xff — which is what the generator stored)
        while (k < w * h && ok) { ok = p.pixels(k) == pal(idx(k)); k += 1 }
        require(ok, "palette pixels")
      }
    }
    for (i <- 0 until 40) {
      // Adam7 interlaced round-trips across every color layout: the
      // non-interlaced parse of the SAME samples is the oracle, and
      // dims 1..16 straddle the 8x8 tile so empty passes (zero bytes)
      // and multi-tile grids both occur
      val w = 1 + rnd.nextInt(16)
      val h = 1 + rnd.nextInt(16)
      val filters = Array.fill(w * h + 8)(rnd.nextInt(5))
      val split = 1 + rnd.nextInt(300)
      def both(enc: Boolean => Array[Byte]): Unit = {
        val plain = PngImage.parse(enc(false))
        val inter = PngImage.parse(enc(true))
        require(inter.width == w && inter.height == h, "dims")
        require(inter.pixels.toSeq == plain.pixels.toSeq, "interlaced pixels")
        require(inter.hasAlpha == plain.hasAlpha, "alpha flag")
      }
      check(s"png_interlaced_roundtrip_$i") {
        rnd.nextInt(5) match {
          case 0 | 1 =>
            val px = Array.fill(w * h)(rnd.nextInt())
            val wa = rnd.nextBoolean()
            both(il => PngImage.encode(w, h, px, wa, y => filters(y), split,
              interlaced = il))
          case 2 =>
            val gray = Array.fill(w * h)(rnd.nextInt(256))
            both(il => PngImage.encodeGray(w, h, gray,
              filterFor = y => filters(y), idatChunkSize = split,
              interlaced = il))
          case 3 =>
            val gray = Array.fill(w * h)(rnd.nextInt(256))
            val alpha = Array.fill(w * h)(rnd.nextInt(256))
            both(il => PngImage.encodeGray(w, h, gray, alpha,
              y => filters(y), split, interlaced = il))
          case _ =>
            val nPal = 1 + rnd.nextInt(256)
            val pal = Array.fill(nPal)(rnd.nextInt())
            val idx = Array.fill(w * h)(rnd.nextInt(nPal))
            both(il => PngImage.encodePalette(w, h, idx, pal,
              y => filters(y), split, interlaced = il))
        }
      }
    }
    for (i <- 0 until 40) {
      // 16-bit round-trips: the 8-bit face keeps each sample's HIGH
      // byte; random low bytes prove they are carried through the
      // bytewise filters and then dropped. Half the configs interlace,
      // composing both layouts.
      val w = 1 + rnd.nextInt(16)
      val h = 1 + rnd.nextInt(12)
      val colorType = Seq(0, 2, 4, 6)(rnd.nextInt(4))
      val nCh = colorType match { case 0 => 1; case 2 => 3; case 4 => 2
        case _ => 4 }
      val chans = Array.fill(nCh)(Array.fill(w * h)(rnd.nextInt(65536)))
      val inter = rnd.nextBoolean()
      val filters = Array.fill(w * h + 8)(rnd.nextInt(5))
      check(s"png16_roundtrip_$i") {
        val p = PngImage.parse(PngImage.encode16(w, h, chans, colorType,
          y => filters(y), 1 + rnd.nextInt(400), interlaced = inter))
        require(p.width == w && p.height == h, "dims")
        var k = 0
        var ok = true
        while (k < w * h && ok) {
          val want = colorType match {
            case 0 =>
              val g = chans(0)(k) >> 8
              0xff000000 | (g << 16) | (g << 8) | g
            case 2 =>
              0xff000000 | ((chans(0)(k) >> 8) << 16) |
                ((chans(1)(k) >> 8) << 8) | (chans(2)(k) >> 8)
            case 4 =>
              val g = chans(0)(k) >> 8
              ((chans(1)(k) >> 8) << 24) | (g << 16) | (g << 8) | g
            case _ =>
              ((chans(3)(k) >> 8) << 24) | ((chans(0)(k) >> 8) << 16) |
                ((chans(1)(k) >> 8) << 8) | (chans(2)(k) >> 8)
          }
          ok = p.pixels(k) == want
          k += 1
        }
        require(ok, "16-bit face")
      }
    }
    for (i <- 0 until 80) {
      val w = 1 + rnd.nextInt(14)
      val h = 1 + rnd.nextInt(9)
      // mutate across all seven supported container layouts (five 8-bit
      // color layouts, an Adam7-interlaced one, a 16-bit one)
      val good = rnd.nextInt(7) match {
        case 0 => PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          withAlpha = false, _ => rnd.nextInt(5), 1 + rnd.nextInt(200))
        case 1 => PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          withAlpha = true, _ => rnd.nextInt(5), 1 + rnd.nextInt(200))
        case 2 => PngImage.encodeGray(w, h, Array.fill(w * h)(rnd.nextInt(256)))
        case 3 => PngImage.encodeGray(w, h, Array.fill(w * h)(rnd.nextInt(256)),
          Array.fill(w * h)(rnd.nextInt(256)))
        case 4 =>
          val nPal = 1 + rnd.nextInt(256)
          PngImage.encodePalette(w, h, Array.fill(w * h)(rnd.nextInt(nPal)),
            Array.fill(nPal)(rnd.nextInt()), _ => rnd.nextInt(5),
            1 + rnd.nextInt(200))
        case 5 => PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          rnd.nextBoolean(), _ => rnd.nextInt(5), 1 + rnd.nextInt(200),
          interlaced = true)
        case 6 =>
          val ct = Seq(0, 2, 4, 6)(rnd.nextInt(4))
          val nCh = ct match { case 0 => 1; case 2 => 3; case 4 => 2
            case _ => 4 }
          PngImage.encode16(w, h,
            Array.fill(nCh)(Array.fill(w * h)(rnd.nextInt(65536))), ct,
            _ => rnd.nextInt(5), 1 + rnd.nextInt(200),
            interlaced = rnd.nextBoolean())
      }
      val bad = mutate(good)
      mutationCase(s"png_mutation_$i", () => PngImage.parse(bad)) { p =>
        p.width > 0 && p.height > 0 &&
          p.pixels.length == p.width * p.height
      }
    }
    for (i <- 0 until 50) {
      // dedicated palette mutations: PLTE/tRNS table bytes are in the
      // strike zone (a flipped PLTE length, a tRNS overrunning the
      // palette, an index past the table) — reject-or-sound
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(8)
      val nPal = 1 + rnd.nextInt(256)
      val good = PngImage.encodePalette(w, h,
        Array.fill(w * h)(rnd.nextInt(nPal)), Array.fill(nPal)(rnd.nextInt()),
        _ => rnd.nextInt(5), 1 + rnd.nextInt(200))
      val bad = mutate(good)
      mutationCase(s"png_palette_mutation_$i", () => PngImage.parse(bad)) { p =>
        p.width > 0 && p.height > 0 &&
          p.pixels.length == p.width * p.height
      }
    }

    // ---------------------------------------------------------- GIF
    for (i <- 0 until 40) {
      // round-trips across palette sizes (incl. non-power-of-two and
      // high-entropy streams — the class that exposed the LZW tail
      // width-bump), interlace, sub-block splits, transparency
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(18)
      val n = 1 + rnd.nextInt(256)
      val tIdx = if (rnd.nextBoolean()) rnd.nextInt(n) else -1
      val pal = Array.tabulate(n) { j =>
        val a = if (j == tIdx) 0 else 0xff
        (a << 24) | (rnd.nextInt() & 0xffffff)
      }
      val idx = Array.fill(w * h)(rnd.nextInt(n))
      val interlaced = rnd.nextBoolean()
      val split = 1 + rnd.nextInt(255)
      check(s"gif_roundtrip_$i") {
        val g = GifImage.parse(GifImage.encode(w, h, idx, pal, interlaced,
          split))
        require(g.width == w && g.height == h, "dims")
        require(g.hasTransparency == (tIdx >= 0), "transparency flag")
        var k = 0
        var ok = true
        while (k < w * h && ok) { ok = g.pixels(k) == pal(idx(k)); k += 1 }
        require(ok, "gif pixels")
      }
    }
    for (i <- 0 until 60) {
      val w = 1 + rnd.nextInt(16)
      val h = 1 + rnd.nextInt(10)
      val n = 1 + rnd.nextInt(256)
      val good = GifImage.encode(w, h, Array.fill(w * h)(rnd.nextInt(n)),
        Array.tabulate(n)(j => 0xff000000 | (rnd.nextInt() & 0xffffff)),
        rnd.nextBoolean(), 1 + rnd.nextInt(255))
      val bad = mutate(good)
      mutationCase(s"gif_mutation_$i", () => GifImage.parse(bad)) { g =>
        g.width > 0 && g.height > 0 &&
          g.pixels.length == g.width * g.height
      }
    }

    // ---------------------------------------------------------- JPEG
    for (i <- 0 until 30) {
      // the one exact aperture the lossy format allows: tile-constant
      // images with DC quant 8 — full pipeline, bit-for-bit (tile 16
      // for 4:2:0, where constant chroma makes the layout exact too)
      val sub = rnd.nextInt(3) == 0
      val gray = !sub && rnd.nextBoolean()
      val tile = if (sub) 16 else 8
      val bw = 1 + rnd.nextInt(5); val bh = 1 + rnd.nextInt(4)
      val w = bw * tile - rnd.nextInt(6); val h = bh * tile - rnd.nextInt(6)
      val cells = Array.fill(bw * bh)(rnd.nextInt(256))
      val px = Array.tabulate(w * h) { k =>
        val v = cells((k / w) / tile * bw + (k % w) / tile)
        if (gray) v else (v << 16) | (v << 8) | v
      }
      val rst = rnd.nextInt(3)
      check(s"jpeg_exact_roundtrip_$i") {
        val j = JpegImage.parse(JpegImage.encode(w, h, px,
          grayscale = gray, restartInterval = rst, subsample = sub))
        require(j.width == w && j.height == h, "dims")
        var k = 0
        var ok = true
        while (k < w * h && ok) {
          val v = if (gray) px(k) else px(k) & 0xff
          ok = j.pixels(k) == (0xff000000 | (v << 16) | (v << 8) | v)
          k += 1
        }
        require(ok, "jpeg exact pixels")
      }
    }
    for (i <- 0 until 60) {
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(18)
      val gray = rnd.nextBoolean()
      val px = Array.fill(w * h)(
        if (gray) rnd.nextInt(256) else rnd.nextInt(1 << 24))
      val good = JpegImage.encode(w, h, px, grayscale = gray,
        quant = Array.fill(64)(2 + rnd.nextInt(30)),
        restartInterval = rnd.nextInt(4))
      val bad = mutate(good)
      mutationCase(s"jpeg_mutation_$i", () => JpegImage.parse(bad)) { j =>
        j.width > 0 && j.height > 0 &&
          j.pixels.length == j.width * j.height
      }
    }

    // --------------------------------------------- GIF animation (composited)
    for (i <- 0 until 40) {
      // random scripted animation, mutated: decodeAnimation must reject
      // by name or produce a structurally sound composite
      val sw = 2 + rnd.nextInt(12); val sh = 2 + rnd.nextInt(9)
      val nPal = 2 + rnd.nextInt(14)
      val pal = Array.tabulate(nPal)(_ =>
        0xff000000 | (rnd.nextInt() & 0xffffff))
      val nf = 1 + rnd.nextInt(4)
      val geom = (0 until nf).map { f =>
        if (f == 0) (0, 0, sw, sh, rnd.nextInt(3))
        else {
          val fw = 1 + rnd.nextInt(sw); val fh = 1 + rnd.nextInt(sh)
          (rnd.nextInt(sw - fw + 1), rnd.nextInt(sh - fh + 1), fw, fh,
            rnd.nextInt(3))
        }
      }
      val px = geom.map { case (_, _, fw, fh, _) =>
        Array.fill(fw * fh)(rnd.nextInt(nPal)) }
      val disp = (0 until nf).map(_ => rnd.nextInt(4))
      val trans = (0 until nf).map(f =>
        if (rnd.nextBoolean()) rnd.nextInt(nPal) else -1)
      // per-frame interlace sampled ONCE up front (advisor r16):
      // encodeAnimation evaluates interlacedFrame(f) twice per frame
      // (flag byte + payload row order), so a fresh-draw closure could
      // emit a flag inconsistent with its own payload ordering
      val inter = (0 until nf).map(_ => rnd.nextBoolean())
      val good = GifImage.encodeAnimation(sw, sh, pal, geom, px(_),
        interlacedFrame = inter(_),
        disposalFor = disp(_), transparentFor = trans(_))
      val bad = mutate(good)
      mutationCase(s"gifanim_mutation_$i",
        () => GifImage.decodeAnimation(bad)) { case (w, h, frames) =>
        w > 0 && h > 0 && frames.nonEmpty &&
          frames.forall(_.canvas.length == w * h)
      }
    }

    // ------------------------------------------------ progressive JPEG
    // random VALID scan script: random band partition of 1..63 per
    // component, random successive-approximation depth per band (each
    // chained down to Al=0), DC interleaved for color — the script
    // space real encoders draw from, far wider than the default script
    def randomScript(nComp: Int): Seq[JpegImage.ProgScan] = {
      val scans = scala.collection.mutable.ArrayBuffer
        .empty[JpegImage.ProgScan]
      val dcAl = rnd.nextInt(3)
      scans += JpegImage.ProgScan(0 until nComp, 0, 0, 0, dcAl)
      val acFirsts = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Int, Int)]
      for (c <- 0 until nComp) {
        var s = 1
        while (s <= 63) {
          val e = math.min(63, s + rnd.nextInt(63))
          val al = rnd.nextInt(3)
          scans += JpegImage.ProgScan(Seq(c), s, e, 0, al)
          acFirsts += ((c, s, e, al))
          s = e + 1
        }
      }
      for (a <- dcAl to 1 by -1)
        scans += JpegImage.ProgScan(0 until nComp, 0, 0, a, a - 1)
      for ((c, s, e, al) <- rnd.shuffle(acFirsts.toSeq); a <- al to 1 by -1)
        scans += JpegImage.ProgScan(Seq(c), s, e, a, a - 1)
      scans.toSeq
    }
    for (i <- 0 until 40) {
      // exact aperture through the MULTI-SCAN pipeline (default script)
      val sub = rnd.nextInt(3) == 0
      val gray = !sub && rnd.nextBoolean()
      val tile = if (sub) 16 else 8
      val bw = 1 + rnd.nextInt(5); val bh = 1 + rnd.nextInt(4)
      val w = bw * tile - rnd.nextInt(6); val h = bh * tile - rnd.nextInt(6)
      val cells = Array.fill(bw * bh)(rnd.nextInt(256))
      val px = Array.tabulate(w * h) { k =>
        val v = cells((k / w) / tile * bw + (k % w) / tile)
        if (gray) v else (v << 16) | (v << 8) | v
      }
      val rst = rnd.nextInt(3)
      check(s"jpegprog_exact_roundtrip_$i") {
        val j = JpegImage.parse(JpegImage.encodeProgressive(w, h, px,
          grayscale = gray, restartInterval = rst, subsample = sub))
        require(j.width == w && j.height == h, "dims")
        var k = 0
        var ok = true
        while (k < w * h && ok) {
          val v = if (gray) px(k) else px(k) & 0xff
          ok = j.pixels(k) == (0xff000000 | (v << 16) | (v << 8) | v)
          k += 1
        }
        require(ok, "progressive exact pixels")
      }
    }
    for (i <- 0 until 120) {
      // progressive ≡ baseline on arbitrary content under a RANDOM
      // script: successive approximation is lossless on the quantized
      // coefficients, so the two containers must decode identically —
      // the one oracle that covers EVERY script shape
      val w = 1 + rnd.nextInt(28); val h = 1 + rnd.nextInt(20)
      val gray = rnd.nextBoolean()
      val px = Array.fill(w * h)(
        if (gray) rnd.nextInt(256) else rnd.nextInt(1 << 24))
      val quant = Array.fill(64)(2 + rnd.nextInt(30))
      val nComp = if (gray) 1 else 3
      val script = randomScript(nComp)
      val rst = rnd.nextInt(3)
      check(s"jpegprog_equiv_$i") {
        val base = JpegImage.parse(JpegImage.encode(w, h, px, gray, quant,
          restartInterval = rst))
        val prog = JpegImage.parse(JpegImage.encodeProgressive(w, h, px,
          gray, quant, scans = script, restartInterval = rst))
        require(prog.pixels.toSeq == base.pixels.toSeq,
          "progressive decode diverges from baseline")
      }
    }
    for (i <- 0 until 60) {
      // the 4:2:0 lane under random scripts (dummy-edge-block geometry:
      // interleaved DC codes them, non-interleaved AC skips them)
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(36)
      val px = Array.fill(w * h)(rnd.nextInt(1 << 24))
      val quant = Array.fill(64)(2 + rnd.nextInt(20))
      val script = randomScript(3)
      check(s"jpegprog_equiv420_$i") {
        val base = JpegImage.parse(JpegImage.encode(w, h, px,
          quant = quant, subsample = true))
        val prog = JpegImage.parse(JpegImage.encodeProgressive(w, h, px,
          quant = quant, scans = script, subsample = true))
        require(prog.pixels.toSeq == base.pixels.toSeq,
          "4:2:0 progressive decode diverges from baseline")
      }
    }
    for (i <- 0 until 160) {
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(18)
      val gray = rnd.nextBoolean()
      val px = Array.fill(w * h)(
        if (gray) rnd.nextInt(256) else rnd.nextInt(1 << 24))
      val good = JpegImage.encodeProgressive(w, h, px, grayscale = gray,
        quant = Array.fill(64)(2 + rnd.nextInt(30)),
        scans = randomScript(if (gray) 1 else 3),
        restartInterval = rnd.nextInt(4))
      val bad = mutate(good)
      mutationCase(s"jpegprog_mutation_$i", () => JpegImage.parse(bad)) { j =>
        j.width > 0 && j.height > 0 &&
          j.pixels.length == j.width * j.height
      }
    }

    // ------------------------------------------------ EXIF orientation
    for (i <- 0 until 50) {
      // canon → storify (through the shared mapping) → JPEG + APP1 →
      // decode → parseOrientation → normalize must restore the canon
      // EXACTLY (block-constant tiles, both TIFF byte orders)
      val o = 1 + rnd.nextInt(8)
      val big = rnd.nextBoolean()
      val wc = 8 * (1 + rnd.nextInt(4)); val hc = 8 * (1 + rnd.nextInt(3))
      val cells = Array.fill((wc / 8) * (hc / 8))(rnd.nextInt(256))
      val canon = Array.tabulate(wc * hc)(k =>
        cells((k / wc) / 8 * (wc / 8) + (k % wc) / 8))
      check(s"exif_normalize_$i") {
        val (sw, sh) = if (o >= 5) (hc, wc) else (wc, hc)
        val stored = new Array[Int](sw * sh)
        for (y <- 0 until hc; x <- 0 until wc) {
          val (sx, sy) = JpegImage.exifSource(o, x, y, sw, sh)
          stored(sy * sw + sx) = canon(y * wc + x)
        }
        val bytes = JpegImage.withExif(
          JpegImage.encode(sw, sh, stored, grayscale = true), o, big)
        require(JpegImage.parseOrientation(bytes) == o, "orientation read")
        val up = JpegImage.normalizeOrientation(JpegImage.parse(bytes),
          o)
        require(up.width == wc && up.height == hc, "upright dims")
        var ok = true
        for (k <- 0 until wc * hc)
          ok &&= (up.pixels(k) & 0xff) == canon(k)
        require(ok, "normalized pixels")
      }
    }
    for (i <- 0 until 60) {
      // EXIF walk mutation: parseOrientation must reject by name or
      // return a spec-valid orientation — never crash, never lie
      val we = 8 * (1 + rnd.nextInt(3))
      val good = JpegImage.withExif(
        JpegImage.encode(we, 8, Array.fill(we * 8)(rnd.nextInt(256)),
          grayscale = true),
        1 + rnd.nextInt(8), rnd.nextBoolean())
      val bad = mutate(good)
      mutationCase(s"exif_mutation_$i",
        () => JpegImage.parseOrientation(bad)) { o =>
        o >= 1 && o <= 8
      }
    }
    for (i <- 0 until 40) {
      // THE DISPATCH FACE (round 17): an oriented JPEG routed through
      // MediaCodec.decodeMedia must come back as an upright ImageItem
      // with the canonical dims and pixels — the wiring q161/q167
      // grade, under randomized geometry/orientation/byte order
      import graft.sources.MediaCodec
      val o = 1 + rnd.nextInt(8)
      val big = rnd.nextBoolean()
      val wc = 8 * (1 + rnd.nextInt(4)); val hc = 8 * (1 + rnd.nextInt(3))
      val cells = Array.fill((wc / 8) * (hc / 8))(rnd.nextInt(256))
      val canon = Array.tabulate(wc * hc)(k =>
        cells((k / wc) / 8 * (wc / 8) + (k % wc) / 8))
      val (sw, sh, stored) = JpegImage.exifStore(o, wc, hc, canon)
      val good = JpegImage.withExif(
        JpegImage.encode(sw, sh, stored, grayscale = true), o, big)
      check(s"dispatch_oriented_$i") {
        MediaCodec.decodeMedia(good) match {
          case MediaCodec.ImageItem("jpeg", w, h, px) =>
            require(w == wc && h == hc, "dispatch upright dims")
            var ok = true
            for (k <- 0 until wc * hc) ok &&= (px(k) & 0xff) == canon(k)
            require(ok, "dispatch upright pixels")
          case other => require(false, s"dispatch returned $other")
        }
      }
      // mutation through the face: reject by name or structurally sound
      val bad = mutate(good)
      mutationCase(s"dispatch_oriented_mutation_$i",
        () => MediaCodec.decodeMedia(bad)) {
        case MediaCodec.ImageItem(_, w, h, px) =>
          w > 0 && h > 0 && px.length == w * h
        case _ => true // a mutated magic re-sniffed into another family
      }
    }

    // ---------------------------------------------------------- TIFF
    for (i <- 0 until 45) {
      // round-trip across the baseline matrix: photometric x layout x
      // compression/predictor x byte order x orientation — decoded
      // pixels must equal the canonical face exactly
      import graft.sources.TiffImage
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val pm = rnd.nextInt(4)
      val nPal = 2 + rnd.nextInt(254)
      val pal = Array.tabulate(nPal)(_ => rnd.nextInt() & 0xffffff)
      val raw = Array.tabulate(w * h)(_ =>
        if (pm == 3) rnd.nextInt(nPal)
        else if (pm == 2) rnd.nextInt() & 0xffffff
        else rnd.nextInt(256))
      val face = raw.map {
        case k if pm == 3 => pal(k)
        case v if pm == 2 => v
        case v => (v << 16) | (v << 8) | v
      }
      val o = 1 + rnd.nextInt(8)
      val (sw, sh, stored) = JpegImage.exifStore(o, w, h, raw)
      val comp = Seq(1, 5, 8, 32773)(rnd.nextInt(4))
      val bytes = TiffImage.encode(sw, sh, stored, photometric = pm,
        palette = if (pm == 3) pal else null,
        bigEndian = rnd.nextBoolean(), compression = comp,
        predictor =
          if ((comp == 5 || comp == 8) && rnd.nextBoolean()) 2 else 1,
        rowsPerStrip = if (rnd.nextBoolean()) 1 + rnd.nextInt(h + 2) else 0,
        tileSize = if (rnd.nextInt(3) == 0) 16 * (1 + rnd.nextInt(2)) else 0,
        orientation = o,
        bits = if (pm != 3 && rnd.nextBoolean()) 16 else 8,
        planar2 = pm == 2 && rnd.nextBoolean()) // round 19: separate planes
      check(s"tiff_roundtrip_$i") {
        val t = TiffImage.parse(bytes)
        require(t.width == w && t.height == h, "upright dims")
        var ok = true
        for (k <- 0 until w * h) ok &&= (t.pixels(k) & 0xffffff) == face(k)
        require(ok, "pixels")
      }
      // mutation: reject by name or structurally sound
      val bad = mutate(bytes)
      mutationCase(s"tiff_mutation_$i", () => TiffImage.parse(bad)) { t =>
        t.width > 0 && t.height > 0 &&
          t.pixels.length == t.width * t.height
      }
    }
    for (i <- 0 until 20) {
      // multi-page: random heterogeneous chains round-trip page-exact,
      // EVERY page under its own stored orientation (the r17 verdict's
      // page x orientation cross) and a bilevel/CCITT page class in
      // the rotation; mutations through the chain walk reject by name
      // or stay sound
      import graft.sources.TiffImage
      val np = 2 + rnd.nextInt(4)
      val pages = (0 until np).map { _ =>
        val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(12)
        val cls = rnd.nextInt(4) // gray0/gray1/rgb/bilevel
        val o = 1 + rnd.nextInt(8)
        if (cls == 3) {
          val face = Array.fill(w * h)(if (rnd.nextBoolean()) 0xffffff else 0)
          val (sw, sh, stored) = JpegImage.exifStore(o, w, h, face)
          (w, h, face, TiffImage.Page(sw, sh, stored,
            photometric = rnd.nextInt(2),
            compression = Seq(1, 2, 3, 4, 32773)(rnd.nextInt(5)),
            rowsPerStrip = 1 + rnd.nextInt(h + 1), bits = 1,
            t4TwoD = rnd.nextBoolean(), orientation = o))
        } else {
          val px = Array.tabulate(w * h)(_ =>
            if (cls == 2) rnd.nextInt() & 0xffffff else rnd.nextInt(256))
          val face = if (cls == 2) px
            else px.map(v => (v << 16) | (v << 8) | v)
          val (sw, sh, stored) = JpegImage.exifStore(o, w, h, px)
          (w, h, face, TiffImage.Page(sw, sh, stored, photometric = cls,
            compression = Seq(1, 5, 8, 32773)(rnd.nextInt(4)),
            rowsPerStrip = 1 + rnd.nextInt(h + 1),
            bits = if (rnd.nextBoolean()) 16 else 8, orientation = o))
        }
      }
      val good = TiffImage.encodePages(pages.map(_._4),
        bigEndian = rnd.nextBoolean())
      check(s"tiffpages_roundtrip_$i") {
        val ps = TiffImage.parsePages(good)
        require(ps.length == np, "page count")
        for ((t, p) <- ps.zipWithIndex) {
          val (cw, ch, face, _) = pages(p)
          require(t.width == cw && t.height == ch, s"upright dims $p")
          var ok = true
          for (k <- 0 until cw * ch)
            ok &&= (t.pixels(k) & 0xffffff) == face(k)
          require(ok, s"pixels $p")
        }
      }
      val bad = mutate(good)
      mutationCase(s"tiffpages_mutation_$i",
        () => TiffImage.parsePages(bad)) { ps =>
        ps.nonEmpty && ps.forall(t =>
          t.width > 0 && t.height > 0 &&
            t.pixels.length == t.width * t.height)
      }
    }
    for (i <- 0 until 30) {
      // CCITT family: random bilevel content across all three schemes
      // (MH / T.4 1D+2D / T.6), both photometrics, both byte orders,
      // random strip heights — round-trip exact; byte mutations
      // through the strict parser reject by name or stay sound (this
      // is the family that catches an unvalidated table index or an
      // unchecked run overflow, the JPEG selector lesson)
      import graft.sources.TiffImage
      val w = 1 + rnd.nextInt(70); val h = 1 + rnd.nextInt(20)
      val face = Array.fill(w * h)(if (rnd.nextBoolean()) 0xffffff else 0)
      val o = 1 + rnd.nextInt(8)
      val (sw, sh, stored) = JpegImage.exifStore(o, w, h, face)
      val bytes = TiffImage.encodePages(Seq(TiffImage.Page(sw, sh, stored,
        photometric = rnd.nextInt(2),
        compression = Seq(2, 3, 4)(rnd.nextInt(3)),
        rowsPerStrip = 1 + rnd.nextInt(h + 1), bits = 1,
        t4TwoD = rnd.nextBoolean(), orientation = o,
        fillOrder2 = rnd.nextBoolean())),
        bigEndian = rnd.nextBoolean())
      check(s"ccitt_roundtrip_$i") {
        val t = TiffImage.parse(bytes)
        require(t.width == w && t.height == h, "upright dims")
        var ok = true
        for (k <- 0 until w * h) ok &&= (t.pixels(k) & 0xffffff) == face(k)
        require(ok, "pixels")
      }
      val bad = mutate(bytes)
      mutationCase(s"ccitt_mutation_$i", () => TiffImage.parse(bad)) { t =>
        t.width > 0 && t.height > 0 &&
          t.pixels.length == t.width * t.height
      }
    }
    for (i <- 0 until 25) {
      // native-YCbCr TIFF family (round 19): gray-valued content (the
      // exact aperture — Y=c, Cb=Cr=128 survive subsampling and both
      // matrix roundings) across subsamplings, compressions, layouts,
      // byte orders and orientations; mutations through the data-unit
      // walk reject by name or stay sound
      import graft.sources.TiffImage
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val gray = Array.tabulate(w * h) { _ =>
        val c = rnd.nextInt(256); (c << 16) | (c << 8) | c
      }
      val o = 1 + rnd.nextInt(8)
      val (sw, sh, stored) = JpegImage.exifStore(o, w, h, gray)
      val bytes = TiffImage.encode(sw, sh, stored, photometric = 6,
        compression = Seq(1, 5, 8, 32773)(rnd.nextInt(4)),
        bigEndian = rnd.nextBoolean(),
        rowsPerStrip =
          if (rnd.nextBoolean()) 1 + rnd.nextInt(h + 2) else 0,
        tileSize = if (rnd.nextInt(3) == 0) 16 else 0,
        orientation = o,
        yccSub = Seq((1, 1), (2, 1), (2, 2))(rnd.nextInt(3)))
      check(s"ycctiff_roundtrip_$i") {
        val t = TiffImage.parse(bytes)
        require(t.width == w && t.height == h, "upright dims")
        var ok = true
        for (k <- 0 until w * h) ok &&= (t.pixels(k) & 0xffffff) == gray(k)
        require(ok, "pixels")
      }
      val bad = mutate(bytes)
      mutationCase(s"ycctiff_mutation_$i", () => TiffImage.parse(bad)) { t =>
        t.width > 0 && t.height > 0 &&
          t.pixels.length == t.width * t.height
      }
    }
    for (i <- 0 until 25) {
      // JPEG-in-TIFF family: block-constant aperture content (exact
      // round-trips despite the lossy codec) across photometrics,
      // strip heights, byte orders, orientations; mutations through
      // the embedded-JPEG strip walk reject by name or stay sound
      import graft.sources.TiffImage
      val w = 8 * (1 + rnd.nextInt(4)); val h = 8 * (1 + rnd.nextInt(3))
      val face = Array.tabulate(w * h) { k =>
        val c = (i * 29 + (k % w) / 8 * 37 + (k / w) / 8 * 91) % 256
        (c << 16) | (c << 8) | c
      }
      val o = 1 + rnd.nextInt(8)
      val (sw, sh, stored) = JpegImage.exifStore(o, w, h, face)
      val tiledPage = rnd.nextInt(3) == 0 // round 19: the tiled arm
      val bytes = TiffImage.encodePages(Seq(TiffImage.Page(sw, sh, stored,
        photometric = if (rnd.nextBoolean()) 1 else 6, compression = 7,
        rowsPerStrip = if (tiledPage) 0 else Seq(0, 8, 16)(rnd.nextInt(3)),
        tileSize = if (tiledPage) 16 else 0, orientation = o)),
        bigEndian = rnd.nextBoolean())
      check(s"jpegtiff_roundtrip_$i") {
        val t = TiffImage.parse(bytes)
        require(t.width == w && t.height == h, "upright dims")
        var ok = true
        for (k <- 0 until w * h) ok &&= (t.pixels(k) & 0xffffff) == face(k)
        require(ok, "pixels")
      }
      val bad = mutate(bytes)
      mutationCase(s"jpegtiff_mutation_$i", () => TiffImage.parse(bad)) { t =>
        t.width > 0 && t.height > 0 &&
          t.pixels.length == t.width * t.height
      }
    }

    // ---------------------------------------------------------- WAV
    for (i <- 0 until 30) {
      val rate = 8000 + rnd.nextInt(40000)
      val n = rnd.nextInt(5000)
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      check(s"wav_roundtrip_$i") {
        val wv = WavAudio.parse(WavAudio.encodePcm16Mono(rate, samples))
        require(wv.sampleRate == rate && wv.channels == 1 && wv.bits == 16,
          "header")
        require(wv.samples.toSeq == samples.toSeq, "samples")
      }
    }
    for (i <- 0 until 20) {
      // IMA ADPCM: encoder-mirror round-trip (decode must reproduce
      // the encoder's reconstruction exactly) + byte mutations through
      // the strict block walk — reject by name or stay sound
      val spb = Seq(9, 17, 25, 33)(rnd.nextInt(4))
      val n = spb * (1 + rnd.nextInt(5))
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val (bytes, recon) =
        WavAudio.encodeImaAdpcmMono(8000 + rnd.nextInt(40000), samples, spb)
      check(s"adpcm_roundtrip_$i") {
        val wv = WavAudio.parse(bytes)
        require(wv.format == 17 && wv.channels == 1, "header")
        require(wv.samples.toSeq == recon.toSeq, "mirror reconstruction")
      }
      val bad = mutate(bytes)
      mutationCase(s"adpcm_mutation_$i", () => WavAudio.parse(bad)) { wv =>
        wv.sampleRate > 0 && wv.channels >= 1 &&
          wv.samples.length % wv.channels == 0
      }
    }
    for (i <- 0 until 20) {
      // MS ADPCM: same mirror + mutation discipline as the IMA family
      val spb = Seq(4, 8, 14, 22)(rnd.nextInt(4))
      val n = spb * (1 + rnd.nextInt(5))
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val (bytes, recon) =
        WavAudio.encodeMsAdpcmMono(8000 + rnd.nextInt(40000), samples, spb)
      check(s"msadpcm_roundtrip_$i") {
        val wv = WavAudio.parse(bytes)
        require(wv.format == 2 && wv.channels == 1, "header")
        require(wv.samples.toSeq == recon.toSeq, "mirror reconstruction")
      }
      val bad = mutate(bytes)
      mutationCase(s"msadpcm_mutation_$i", () => WavAudio.parse(bad)) { wv =>
        wv.sampleRate > 0 && wv.channels >= 1 &&
          wv.samples.length % wv.channels == 0
      }
    }
    for (i <- 0 until 25) {
      // 24-bit PCM round-trip (round 16): sign extension + the odd
      // data-size word-alignment pad
      val rate = 8000 + rnd.nextInt(40000)
      val n = 1 + rnd.nextInt(2000)
      val samples = Array.fill(n)(rnd.nextInt(1 << 24) - (1 << 23))
      check(s"wav24_roundtrip_$i") {
        val wv = WavAudio.parse(WavAudio.encodePcm24Mono(rate, samples))
        require(wv.bits == 24 && wv.format == 1, "header")
        require(wv.samples.toSeq == samples.toSeq, "samples")
      }
    }
    for (i <- 0 until 25) {
      // IEEE-float (tag 3) round-trip: raw bit equality
      val rate = 8000 + rnd.nextInt(40000)
      val n = 1 + rnd.nextInt(2000)
      val samples = Array.fill(n)(rnd.nextFloat() * 2f - 1f)
      check(s"wavf32_roundtrip_$i") {
        val wv = WavAudio.parse(WavAudio.encodeFloat32Mono(rate, samples))
        require(wv.bits == 32 && wv.format == 3, "header")
        var ok = true
        for (k <- 0 until n) ok &&= wv.floatSample(k) == samples(k)
        require(ok, "float samples")
      }
    }
    for (i <- 0 until 25) {
      // G.711 (round 17): expansion round-trip on random code bytes,
      // plus the compand fixed-point under random linear probes
      val law = if (rnd.nextBoolean()) 6 else 7
      val rate = 8000 + rnd.nextInt(40000)
      val n = 1 + rnd.nextInt(2000)
      val codes = Array.fill(n)(rnd.nextInt(256))
      check(s"wavg711_roundtrip_$i") {
        val wv = WavAudio.parse(WavAudio.encodeG711Mono(law, rate, codes))
        require(wv.bits == 8 && wv.format == law, "header")
        val expand: Int => Int =
          if (law == 6) WavAudio.alawExpand else WavAudio.ulawExpand
        require(wv.samples.toSeq == codes.map(expand).toSeq, "samples")
        // compress(expand(c)) == c, μ-law's −0 excepted
        var ok = true
        codes.foreach { c =>
          val back = if (law == 6) WavAudio.alawCompress(WavAudio.alawExpand(c))
            else WavAudio.ulawCompress(WavAudio.ulawExpand(c))
          ok &&= back == (if (law == 7 && c == 0x7f) 0xff else c)
        }
        require(ok, "compand fixed point")
      }
    }
    for (i <- 0 until 120) {
      val good = rnd.nextInt(4) match {
        case 0 => WavAudio.encodePcm16Mono(8000 + rnd.nextInt(40000),
          Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(65536) - 32768))
        case 1 => WavAudio.encodePcm24Mono(8000 + rnd.nextInt(40000),
          Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(1 << 24) - (1 << 23)))
        case 3 => WavAudio.encodeG711Mono(if (rnd.nextBoolean()) 6 else 7,
          8000 + rnd.nextInt(40000),
          Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(256)))
        case _ => WavAudio.encodeFloat32Mono(8000 + rnd.nextInt(40000),
          Array.fill(1 + rnd.nextInt(500))(rnd.nextFloat() * 2f - 1f))
      }
      val bad = mutate(good)
      mutationCase(s"wav_mutation_$i", () => WavAudio.parse(bad)) { wv =>
        wv.channels >= 1 && wv.sampleRate > 0 &&
          ((wv.format == 1 &&
            (wv.bits == 8 || wv.bits == 16 || wv.bits == 24)) ||
            (wv.format == 3 && wv.bits == 32) ||
            ((wv.format == 6 || wv.format == 7) && wv.bits == 8)) &&
          wv.samples.length % wv.channels == 0
      }
    }

    // ---------------------------------------------------------- PDF
    // synthesized multi-object documents with tracked byte geometry so
    // each mutation class can aim at (or avoid) stream payloads. Word
    // alphabet deliberately has no 's': neither a raw text stream nor a
    // sentence can ever spell "stream"/"endstream" and confuse the
    // byte-level span scan.
    val wordChars = "abcdfghiklmnopqruvwxyz0123456789"
    def word(): String =
      Array.fill(2 + rnd.nextInt(8))(wordChars(rnd.nextInt(wordChars.length)))
        .mkString
    def deflateBytes(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end()
      out.toByteArray
    }
    /** bytes, per-stream decoded sentences (in emission order), payload
      * [start,end) spans of the CONTENT streams, and the xref/trailer
      * start offset. */
    def synthPdf(): (Array[Byte], Seq[Seq[String]], Seq[(Int, Int)], Int) = {
      val bos = new java.io.ByteArrayOutputStream()
      def put(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
      put("%PDF-1.4\n")
      val nStreams = 2 + rnd.nextInt(3)
      val sentences = scala.collection.mutable.Buffer[Seq[String]]()
      val spans = scala.collection.mutable.Buffer[(Int, Int)]()
      var objNum = 1
      def emitStream(data: Array[Byte], flate: Boolean): (Int, Int) = {
        val payload = if (flate) deflateBytes(data) else data
        put(s"$objNum 0 obj\n<</Length ${payload.length}" +
          (if (flate) "/Filter/FlateDecode" else "") + ">>\nstream\n")
        val start = bos.size()
        bos.write(payload, 0, payload.length)
        put("\nendstream\nendobj\n")
        objNum += 1
        (start, start + payload.length)
      }
      for (_ <- 0 until nStreams) {
        val ops = new StringBuilder
        val sents = scala.collection.mutable.Buffer[String]()
        for (_ <- 0 until 1 + rnd.nextInt(3)) rnd.nextInt(4) match {
          case 0 => // plain literal
            val s = s"${word()} ${word()}"
            ops.append(s"BT ($s) Tj ET\n"); sents += s
          case 1 => // nested parens (decode keeps them)
            val s = s"${word()} (${word()}) ${word()}"
            ops.append(s"BT ($s) Tj ET\n"); sents += s
          case 2 => // octal escapes for the paren glyphs themselves
            val a = word()
            ops.append(s"BT ($a\\050x\\051) Tj ET\n"); sents += s"$a(x)"
          case 3 => // TJ array: numbers skipped, strings concatenate
            val a = word(); val b = word()
            ops.append(s"BT [($a) ${-100 - rnd.nextInt(400)} ($b)] TJ ET\n")
            sents += a; sents += b
        }
        spans += emitStream(ops.result().getBytes("ISO-8859-1"),
          rnd.nextBoolean())
        sentences += sents.toSeq
      }
      // non-text decoy stream (Flate of T-less bytes: decoded body can
      // never contain Tj/TJ, so it must contribute NOTHING)
      val decoy = Array.fill[Byte](20 + rnd.nextInt(200)) {
        val b = rnd.nextInt(256); (if (b == 'T') 'U' else b).toByte
      }
      emitStream(decoy, flate = true)
      val tailStart = bos.size()
      put(s"xref\n0 $objNum\n0000000000 65535 f \n" +
        (1 until objNum).map(_ => "0000000017 00000 n \n").mkString +
        s"trailer\n<</Size $objNum/Root 1 0 R>>\nstartxref\n9\n%%EOF\n")
      (bos.toByteArray, sentences.toSeq, spans.toSeq, tailStart)
    }
    def assertInOrder(text: String, sents: Seq[String], what: String): Unit = {
      var from = 0
      sents.foreach { s =>
        val at = text.indexOf(s, from)
        require(at >= 0, s"$what: sentence '$s' missing (from $from)")
        from = at + s.length
      }
    }
    for (i <- 0 until 40) {
      val (bytes, sentences, _, _) = synthPdf()
      check(s"pdf_roundtrip_$i") {
        assertInOrder(PdfText.extract(bytes), sentences.flatten, "roundtrip")
      }
    }
    for (i <- 0 until 70) {
      val (bytes, _, _, _) = synthPdf()
      val baseline = PdfText.extract(bytes)
      val cut = rnd.nextInt(bytes.length)
      check(s"pdf_truncate_$i") {
        // a truncated stream loses its endstream and is dropped WHOLE,
        // so the extraction must be a prefix of the baseline text
        val got = PdfText.extract(java.util.Arrays.copyOf(bytes, cut))
        require(baseline.startsWith(got),
          s"truncation at $cut produced non-prefix text (${got.length} chars)")
      }
    }
    for (i <- 0 until 60) {
      val (bytes, sentences, spans, _) = synthPdf()
      val k = rnd.nextInt(spans.length)
      val (s0, e0) = spans(k)
      val bad = bytes.clone()
      val o = s0 + rnd.nextInt(e0 - s0)
      bad(o) = (bad(o) ^ (1 + rnd.nextInt(255))).toByte
      check(s"pdf_flip_stream_$i") {
        // damage confined to stream k's payload: total, bounded, every
        // OTHER stream's sentences intact and in order
        val got = PdfText.extract(bad)
        require(got.length < (1 << 22), s"unbounded output ${got.length}")
        assertInOrder(got,
          sentences.take(k).flatten ++ sentences.drop(k + 1).flatten,
          "unflipped streams")
      }
    }
    for (i <- 0 until 40) {
      val (bytes, _, _, tailStart) = synthPdf()
      val baseline = PdfText.extract(bytes)
      val bad = bytes.clone()
      val o = if (rnd.nextBoolean()) rnd.nextInt(8) // header
        else tailStart + rnd.nextInt(bytes.length - tailStart) // xref/trailer
      bad(o) = (bad(o) ^ (1 + rnd.nextInt(255))).toByte
      check(s"pdf_flip_container_$i") {
        // the header and xref/trailer are dead to the content scan:
        // extraction must be EXACTLY the baseline
        require(PdfText.extract(bad) == baseline,
          s"container flip at $o changed extracted text")
      }
    }

    // ---------------------------------------------------------- JBIG2
    // round 19: the T.88 minimal profile — MQ round-trips across
    // templates and TPGDON, and mutations through the segment walk
    // (header fields, MQ body) reject by name or decode to a sound
    // plane (the MQ decoder is total over w*h decisions by
    // construction; headers are bounds-checked)
    for (i <- 0 until 40) {
      import graft.sources.Jbig2Codec
      val w = 1 + rnd.nextInt(50); val h = 1 + rnd.nextInt(30)
      val plane = Array.fill(w * h)(
        (if (rnd.nextInt(4) == 0) 1 else 0).toByte)
      val tmpl = rnd.nextInt(4)
      val tp = rnd.nextBoolean()
      val good = Jbig2Codec.encode(plane, w, h, template = tmpl,
        tpgdon = tp)
      check(s"jbig2_roundtrip_$i") {
        require(Jbig2Codec.decode(good, w, h).sameElements(plane),
          s"tmpl=$tmpl tpgdon=$tp")
      }
      val bad = mutate(good)
      mutationCase(s"jbig2_mutation_$i",
        () => Jbig2Codec.decode(bad, w, h)) { plane2 =>
        plane2.length == w * h && plane2.forall(b => b == 0 || b == 1)
      }
    }
    // round 20: the symbol/text and MMR profiles under the same
    // round-trip + reject-or-sound oracles, with the full container
    // knob space (corner, transposition, strip height, DS offset,
    // tile shape, symbol-bitmap template) randomized
    for (i <- 0 until 40) {
      import graft.sources.Jbig2Codec
      val w = 1 + rnd.nextInt(50); val h = 1 + rnd.nextInt(30)
      val plane = Array.fill(w * h)(
        (if (rnd.nextInt(3) == 0) 1 else 0).toByte)
      val good = rnd.nextInt(3) match {
        case 0 =>
          // the symbol/text family, incl. (round 20) SDREFAGG
          // dictionaries and per-instance RI refinement
          val refMode = rnd.nextInt(3)
          val cfg = Jbig2Codec.SymTextCfg(
            tileW = 1 + rnd.nextInt(12), tileH = 1 + rnd.nextInt(12),
            refCorner = rnd.nextInt(4), transposed = rnd.nextBoolean(),
            logStrips = rnd.nextInt(4), dsOffset = rnd.nextInt(32) - 16,
            template = rnd.nextInt(4),
            refineText = refMode == 1, refineDict = refMode == 2,
            refTemplate = rnd.nextInt(2))
          Jbig2Codec.encodeSymbolText(plane, w, h, cfg)
        case 1 => Jbig2Codec.encodeMmr(plane, w, h)
        case _ => // refinement: decode must equal the REFINED plane
          val base = plane.map(b =>
            (if (rnd.nextInt(8) == 0) 1 - b else b.toInt).toByte)
          Jbig2Codec.encodeRefined(base, plane, w, h, rnd.nextInt(2))
      }
      check(s"jbig2_symtext_roundtrip_$i") {
        require(Jbig2Codec.decode(good, w, h).sameElements(plane),
          s"${w}x$h")
      }
      val bad = mutate(good)
      mutationCase(s"jbig2_symtext_mutation_$i",
        () => Jbig2Codec.decode(bad, w, h)) { plane2 =>
        plane2.length == w * h && plane2.forall(b => b == 0 || b == 1)
      }
    }

    // ------------------------------------------------------ PDF images
    // q176's container: embedded image XObjects across the eight filter
    // arms. Round-trips at random geometries (the width-residue lesson:
    // 1-bit row padding and CCITT change-element logic both key on
    // w mod 8), whole-file mutations under the reject-or-sound oracle,
    // and dead-region flips (header, trailer) that must leave the
    // extraction EXACTLY equal.
    def randImagePage(): graft.sources.PdfImages.PageEnc = {
      // round 20: 27 arms incl. JBIG2 symbol/text, MMR, refinement,
      // halftone, predictors, inline /Fl + /CCF, 4:2:2 DCT, LZW/RL,
      // ASCII chains
      val arm = rnd.nextInt(27)
      val (w, h) =
        if (arm == 3 || arm == 13 || arm == 19 || arm == 26)
          (8 * (1 + rnd.nextInt(5)), 8 * (1 + rnd.nextInt(4)))
        else (1 + rnd.nextInt(37), 1 + rnd.nextInt(19))
      val px = arm match {
        case 0 | 1 | 8 | 10 | 17 | 18 | 20 | 21 | 22 => Array.fill(w * h) {
          val c = rnd.nextInt(256); (c << 16) | (c << 8) | c
        }
        case 11 => Array.fill(w * h) {
          val c = rnd.nextInt(16) * 17; (c << 16) | (c << 8) | c
        }
        case 7 | 16 => Array.fill(w * h)(rnd.nextInt() & 0xffffff)
        case 9 => Array.fill(w * h)(rnd.nextInt() & 0xc0c0c0)
        case 3 | 13 | 19 | 26 => // block-constant bilevel (DCT aperture
          // and the halftone arm's cell-constant grid)
          val cols = (w + 7) / 8
          val cells = Array.fill(cols * ((h + 7) / 8))(rnd.nextBoolean())
          Array.tabulate(w * h) { i =>
            val c = if (cells((i % w) / 8 + (i / w) / 8 * cols)) 255 else 0
            (c << 16) | (c << 8) | c
          }
        case _ => Array.fill(w * h) {
          val c = if (rnd.nextBoolean()) 255 else 0
          (c << 16) | (c << 8) | c
        }
      }
      graft.sources.PdfImages.PageEnc(w, h, px, arm,
        filterAsArray = rnd.nextBoolean(), blackIs1 = rnd.nextBoolean(),
        rotate = Seq(0, 90, 180, 270)(rnd.nextInt(4)))
    }
    for (i <- 0 until 30) {
      val pages = Seq.fill(1 + rnd.nextInt(3))(randImagePage())
      check(s"pdfimg_roundtrip_$i") {
        val imgs = graft.sources.PdfImages.extract(
          graft.sources.PdfImages.encodePdf(pages, rnd.nextBoolean()))
        require(imgs.length == pages.length, "image count")
        pages.zip(imgs).foreach { case (p, img) =>
          require(img.width == p.width && img.height == p.height, "dims")
          require(img.pixels.zip(p.pixels).forall {
            case (a, b) => (a & 0xffffff) == (b & 0xffffff)
          }, "pixels")
        }
      }
    }
    for (i <- 0 until 80) {
      val good = graft.sources.PdfImages.encodePdf(
        Seq.fill(1 + rnd.nextInt(2))(randImagePage()), rnd.nextBoolean())
      val bad = mutate(good)
      mutationCase(s"pdfimg_mutation_$i",
        () => graft.sources.PdfImages.extract(bad)) { imgs =>
        imgs.forall(img => img.width > 0 && img.height > 0 &&
          img.pixels.length == img.width * img.height &&
          img.width.toLong * img.height <= (1L << 26))
      }
    }
    for (i <- 0 until 25) {
      val good = graft.sources.PdfImages.encodePdf(
        Seq.fill(1 + rnd.nextInt(2))(randImagePage()))
      val baseline = graft.sources.PdfImages.extract(good)
      val s = new String(good, "ISO-8859-1")
      val trailerAt = s.lastIndexOf("trailer")
      val bad = good.clone()
      val o = if (rnd.nextBoolean()) rnd.nextInt(8) // %PDF header
        else trailerAt + rnd.nextInt(good.length - trailerAt)
      bad(o) = (bad(o) ^ (1 + rnd.nextInt(255))).toByte
      check(s"pdfimg_deadflip_$i") {
        // header and trailer are dead to the object walk: the
        // extraction must be byte-identical
        val got = graft.sources.PdfImages.extract(bad)
        require(got.length == baseline.length &&
          got.zip(baseline).forall { case (a, b) =>
            a.width == b.width && a.height == b.height &&
              a.pixels.sameElements(b.pixels)
          }, s"dead-region flip at $o changed the extraction")
      }
    }

    println(s"[codecfuzz] ran $ran configs, $failed failed, seed=$seed")
    if (failed > 0) sys.exit(1)
  }
}
