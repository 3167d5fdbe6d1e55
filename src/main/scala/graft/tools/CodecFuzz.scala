package graft.tools

import graft.sources.{BmpImage, PngImage, WavAudio}

/** Generator-driven mutation fuzz for the pure-JVM codec family
  * (BMP / PNG / WAV) — the DedupFuzz discipline applied to parsers:
  * the hand-written adversarial spec cases prove the KNOWN failure
  * modes; this tool drives randomized ones. Two config classes per
  * codec, all seeded-deterministic:
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
    def check(name: String)(body: => Unit): Unit = {
      ran += 1
      try body catch { case e: Throwable =>
        failed += 1
        System.err.println((s"[codecfuzz] $name FAILED: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}").take(400))
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
    def mutate(b: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
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
    }

    // ---------------------------------------------------------- BMP
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
    for (i <- 0 until 80) {
      val w = 1 + rnd.nextInt(21)
      val h = 1 + rnd.nextInt(9)
      val good = BmpImage.encode24(w, h,
        Array.fill(w * h)(rnd.nextInt() & 0xffffff), rnd.nextBoolean())
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
    for (i <- 0 until 80) {
      val w = 1 + rnd.nextInt(14)
      val h = 1 + rnd.nextInt(9)
      // mutate across all four supported color layouts
      val good = rnd.nextInt(4) match {
        case 0 => PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          withAlpha = false, _ => rnd.nextInt(5), 1 + rnd.nextInt(200))
        case 1 => PngImage.encode(w, h, Array.fill(w * h)(rnd.nextInt()),
          withAlpha = true, _ => rnd.nextInt(5), 1 + rnd.nextInt(200))
        case 2 => PngImage.encodeGray(w, h, Array.fill(w * h)(rnd.nextInt(256)))
        case 3 => PngImage.encodeGray(w, h, Array.fill(w * h)(rnd.nextInt(256)),
          Array.fill(w * h)(rnd.nextInt(256)))
      }
      val bad = mutate(good)
      mutationCase(s"png_mutation_$i", () => PngImage.parse(bad)) { p =>
        p.width > 0 && p.height > 0 &&
          p.pixels.length == p.width * p.height
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
    for (i <- 0 until 80) {
      val good = WavAudio.encodePcm16Mono(8000 + rnd.nextInt(40000),
        Array.fill(1 + rnd.nextInt(500))(rnd.nextInt(65536) - 32768))
      val bad = mutate(good)
      mutationCase(s"wav_mutation_$i", () => WavAudio.parse(bad)) { wv =>
        wv.channels >= 1 && wv.sampleRate > 0 &&
          (wv.bits == 8 || wv.bits == 16) &&
          wv.samples.length % wv.channels == 0
      }
    }

    println(s"[codecfuzz] ran $ran configs, $failed failed, seed=$seed")
    if (failed > 0) sys.exit(1)
  }
}
