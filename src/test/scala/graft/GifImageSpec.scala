package graft

import graft.sources.GifImage
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM GIF codec: exact pixel recovery through palette sizes ×
  * interlace × sub-block splits × transparency, LZW dictionary growth
  * through a table RESET, decode of an INDEPENDENTLY assembled
  * container with HAND-COMPUTED LZW codes (the encoder-and-decoder-
  * agree-on-a-shared-mistake blind spot), and loud rejection of
  * malformed files — the strict-codec discipline applied to the
  * dictionary-coded container. */
class GifImageSpec extends AnyFunSuite {

  private def pal(n: Int, transparent: Int = -1): Array[Int] =
    Array.tabulate(n) { j =>
      val a = if (j == transparent) 0 else 0xff
      (a << 24) | (((j * 37 + 11) & 0xff) << 16) |
        (((j * 91 + 3) & 0xff) << 8) | ((j * 13 + 7) & 0xff)
    }

  test("round-trip: palette sizes x interlace x sub-block splits") {
    for {
      n <- Seq(1, 2, 3, 4, 16, 200, 256)
      interlaced <- Seq(false, true)
      split <- Seq(255, 7)
    } {
      val (w, h) = (11, 9)
      val p = pal(n)
      val idx = Array.tabulate(w * h)(i => (i * 7 + 3) % n)
      val gif = GifImage.parse(GifImage.encode(w, h, idx, p,
        interlaced, split))
      assert(gif.width == w && gif.height == h)
      assert(!gif.hasTransparency)
      for (y <- 0 until h; x <- 0 until w) {
        val want = p(idx(y * w + x))
        assert(gif.pixel(x, y) == (want & 0xffffff) &&
          gif.alpha(x, y) == 0xff,
          s"mismatch at ($x,$y) n=$n inter=$interlaced split=$split")
      }
    }
  }

  test("transparency: the alpha-0 palette entry round-trips via GCE") {
    val (w, h) = (8, 6)
    val p = pal(9, transparent = 4)
    val idx = Array.tabulate(w * h)(i => (i * 5 + 1) % 9)
    val gif = GifImage.parse(GifImage.encode(w, h, idx, p))
    assert(gif.hasTransparency)
    for (y <- 0 until h; x <- 0 until w) {
      val j = idx(y * w + x)
      assert(gif.pixel(x, y) == (p(j) & 0xffffff))
      assert(gif.alpha(x, y) == (if (j == 4) 0 else 0xff),
        s"alpha mismatch at ($x,$y)")
    }
    // two transparent entries / partial alpha are not representable
    intercept[IllegalArgumentException](
      GifImage.encode(1, 2, Array(0, 1), Array(0x00112233, 0x00445566)))
    intercept[IllegalArgumentException](
      GifImage.encode(1, 1, Array(0), Array(0x80112233)))
  }

  test("LZW dictionary growth through a 4096-entry reset round-trips") {
    // high-entropy indices over a 256-entry palette: ~1 new dictionary
    // entry per pixel, so 120x80 = 9600 pixels forces the encoder's
    // mid-stream Clear + table rebuild and the decoder's cap handling
    val (w, h) = (120, 80)
    val p = pal(256)
    val idx = Array.tabulate(w * h) { i =>
      (((i.toLong * 2654435761L) >>> 13) % 256).toInt
    }
    for (interlaced <- Seq(false, true)) {
      val gif = GifImage.parse(GifImage.encode(w, h, idx, p, interlaced))
      var k = 0
      var ok = true
      while (k < w * h && ok) { ok = gif.pixels(k) == p(idx(k)); k += 1 }
      assert(ok, s"reset round-trip mismatch (interlaced=$interlaced)")
    }
  }

  test("EOI at a width boundary round-trips (the tail-bump case)") {
    // the decoder's LAST dictionary add (after the final data code)
    // lands the table exactly on 1<<codeSize, bumping its width right
    // before EOI; the encoder must emit EOI one bit wider. High-entropy
    // index streams land on that boundary for some sizes — this exact
    // deterministic scan (seeded Random, 2000 configs) contained three
    // such configs (steps 534, 731, 1970) that failed before the
    // tail-alignment fix with "LZW stream ends mid-code after N of N
    // pixels". Replayed verbatim as the regression net.
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val w = 1 + rnd.nextInt(20); val h = 1 + rnd.nextInt(16)
      val n = 1 + rnd.nextInt(256)
      val pal = Array.tabulate(n)(j => 0xff000000 | j)
      val idx = Array.fill(w * h)(rnd.nextInt(n))
      val gif = GifImage.parse(GifImage.encode(w, h, idx, pal,
        rnd.nextBoolean()))
      var k = 0
      var ok = true
      while (k < w * h && ok) { ok = gif.pixels(k) == pal(idx(k)); k += 1 }
      assert(ok, s"round-trip mismatch w=$w h=$h n=$n")
    }
  }

  test("long single-color runs (maximal LZW chains) round-trip") {
    val (w, h) = (64, 64)
    val p = pal(4)
    val idx = Array.fill(w * h)(2)
    val gif = GifImage.parse(GifImage.encode(w, h, idx, p))
    assert(gif.pixels.forall(_ == p(2)))
  }

  // independent container assembler (NOT the encoder under test)
  private def bytesOf(parts: Seq[Int]*): Array[Byte] =
    parts.flatten.map(_.toByte).toArray
  private def header(w: Int, h: Int, gctBits: Int): Seq[Int] =
    "GIF89a".map(_.toInt) ++
      Seq(w & 0xff, w >> 8, h & 0xff, h >> 8, 0x80 | (gctBits - 1), 0, 0)
  private def imageDesc(w: Int, h: Int, flags: Int = 0): Seq[Int] =
    Seq(0x2c, 0, 0, 0, 0, w & 0xff, w >> 8, h & 0xff, h >> 8, flags)

  test("independently assembled container decodes (hand-computed LZW)") {
    // 2x2, GCT of 4 (entries: j -> (10j, 20j, 30j)), indices 0,1,2,3.
    // Hand-derived codes after Clear(4): 0, 1, 2 at width 3 (entries
    // 6,7 assigned; the 8th assignment lands AFTER code 2, bumping the
    // canonical encoder to width 4 one entry after the decoder), then
    // 3 and EOI(5) at width 4. LSB-first packing gives 0x44 0x34 0x05.
    val gct = Seq(0, 0, 0, 10, 20, 30, 20, 40, 60, 30, 60, 90)
    val bytes = bytesOf(header(2, 2, 2), gct, imageDesc(2, 2),
      Seq(2, 3, 0x44, 0x34, 0x05, 0), Seq(0x3b))
    val gif = GifImage.parse(bytes)
    assert(gif.width == 2 && gif.height == 2)
    for (k <- 0 until 4)
      assert(gif.pixels(k) == (0xff000000 | (10 * k << 16) | (20 * k << 8)
        | 30 * k), s"hand LZW mismatch at $k")
  }

  test("independently assembled INTERLACED container decodes") {
    // 2x4 (rows 0,1,2,3), interlaced row order: pass1 row 0, pass3 row
    // 2, pass4 rows 1,3 -> stream rows [0, 2, 1, 3]. One color per
    // row: stream indices 0,0, 2,2, 1,1, 3,3. Codes after Clear(4):
    // 0, then KwKwK 6 (=0,0 ... emitted as next free), wait — simpler:
    // literal run: 0,0,2,2,1,1,3,3 encodes as 0, KwKwK(6), 2, KwKwK?
    // — avoid hand-LZW here: use the ENCODER's bytes but swap in a
    // hand-built container around its sub-block payload, proving the
    // interlace ROW ORDER independently of the encoder's container
    // writer.
    val p = pal(4)
    val idxSeq = Array(0, 0, 1, 1, 2, 2, 3, 3) // image rows 0..3
    val enc = GifImage.encode(2, 4, idxSeq, p, interlaced = true)
    // encoder container: 6+7 header, 12 GCT, 10 desc, 1 minCode, then
    // sub-blocks; re-wrap everything after minCode with our own writer
    val minCodeOff = 6 + 7 + 12 + 10
    assert((enc(minCodeOff - 10) & 0xff) == 0x2c)
    assert((enc(minCodeOff) & 0xff) == 2)
    var o = minCodeOff + 1
    val payload = Array.newBuilder[Byte]
    var len = enc(o) & 0xff
    while (len != 0) {
      payload ++= enc.slice(o + 1, o + 1 + len)
      o += 1 + len
      len = enc(o) & 0xff
    }
    val lzw = payload.result()
    // one-byte sub-blocks, maximally split
    val rewrapped = bytesOf(
      header(2, 4, 2),
      p.toSeq.flatMap(c => Seq((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)),
      imageDesc(2, 4, flags = 0x40),
      Seq(2) ++ lzw.flatMap(b => Seq(1, b & 0xff)) ++ Seq(0),
      Seq(0x3b))
    val gif = GifImage.parse(rewrapped)
    for (y <- 0 until 4; x <- 0 until 2)
      assert(gif.pixels(y * 2 + x) == p(idxSeq(y * 2 + x)),
        s"interlaced row order mismatch at ($x,$y)")
  }

  test("extensions are walked strictly and skipped") {
    val p = pal(4)
    val enc = GifImage.encode(2, 2, Array(0, 1, 2, 3), p)
    // splice a comment extension (two sub-blocks) after the header+GCT
    val at = 6 + 7 + 12
    val ext = bytesOf(Seq(0x21, 0xfe, 3, 'h', 'e', 'y', 2, 'h', 'o', 0))
    val spliced = enc.take(at) ++ ext ++ enc.drop(at)
    assert(GifImage.parse(spliced).pixels.toSeq ==
      GifImage.parse(enc).pixels.toSeq)
    // same extension with its terminator cut off mid-chain
    val cut = enc.take(at) ++ ext.dropRight(1) ++ enc.drop(at)
    intercept[IllegalArgumentException](GifImage.parse(cut))
  }

  test("malformed containers are rejected loudly") {
    val p = pal(4)
    val good = GifImage.encode(3, 3, Array.tabulate(9)(_ % 4), p)
    // bad signature
    val badSig = good.clone(); badSig(3) = 'X'.toByte
    intercept[IllegalArgumentException](GifImage.parse(badSig))
    // truncation at every prefix must throw, never garbage-decode
    for (cut <- 1 until good.length)
      intercept[IllegalArgumentException](
        GifImage.parse(java.util.Arrays.copyOf(good, cut)))
    // trailing bytes after trailer
    intercept[IllegalArgumentException](
      GifImage.parse(good ++ Array[Byte](0)))
    // unknown block type where a block is expected
    val at = 6 + 7 + 12
    intercept[IllegalArgumentException](
      GifImage.parse(good.take(at) ++ Array[Byte](0x7f) ++ good.drop(at)))
    // multi-frame: the whole image stream twice before one trailer
    val body = good.slice(at, good.length - 1)
    assert(intercept[IllegalArgumentException](GifImage.parse(
      good.take(at) ++ body ++ body ++ Array[Byte](0x3b)))
      .getMessage.contains("multi-frame"))
    // GCE with wrong block size
    assert(intercept[IllegalArgumentException](GifImage.parse(
      good.take(at) ++ bytesOf(Seq(0x21, 0xf9, 5, 0, 0, 0, 0, 0, 0)) ++
        good.drop(at))).getMessage.contains("GCE"))
    // frame smaller than the logical screen
    assert(intercept[IllegalArgumentException](GifImage.parse(bytesOf(
      header(3, 3, 2),
      Seq.fill(12)(0),
      imageDesc(2, 2), Seq(2, 0x44, 0), Seq(0x3b))))
      .getMessage.contains("screen"))
  }

  test("LZW violations are rejected loudly") {
    // all hand-assembled around a 2x2 screen, GCT of 4, minCode 2
    def gif(lzwWithLen: Seq[Int], minCode: Int = 2,
        gctBits: Int = 2): Array[Byte] =
      bytesOf(header(2, 2, gctBits), Seq.fill(3 * (1 << gctBits))(7),
        imageDesc(2, 2), Seq(minCode) ++ lzwWithLen ++ Seq(0), Seq(0x3b))
    // first code after clear is not a literal: clear(100) then 6
    // (=0b110): bits 100 110 -> byte 0b00110100 = 0x34. Code 6 equals
    // the empty table's next-free slot, so with no prev the
    // beyond-table gate fires (the literal gate behind it is
    // belt-and-braces for the same class)
    assert(intercept[IllegalArgumentException](
      GifImage.parse(gif(Seq(1, 0x34))))
      .getMessage.contains("beyond table"))
    // code far beyond the table: clear then 0, then 7 with only 6
    // entries assigned... 7 is within width 3 but beyond next=7? next
    // grows; use width-3 code 7 right after first literal: codes
    // 4,0,7: bits 100 000 111 -> 0b111000100 = 0xC4, 0x01
    assert(intercept[IllegalArgumentException](
      GifImage.parse(gif(Seq(2, 0xc4, 0x01))))
      .getMessage.contains("beyond table"))
    // EOI before enough pixels: clear, 0, EOI(5): 100 000 101 ->
    // 0b101000100 = 0x44, 0x01
    assert(intercept[IllegalArgumentException](
      GifImage.parse(gif(Seq(2, 0x44, 0x01))))
      .getMessage.contains("EOI after"))
    // more pixels than declared: the valid 4-pixel stream under a 1x1
    // screen — 0x44 0x34 0x05 yields 4 pixels
    assert(intercept[IllegalArgumentException](GifImage.parse(bytesOf(
      header(1, 1, 2), Seq.fill(12)(7), imageDesc(1, 1),
      Seq(2, 3, 0x44, 0x34, 0x05, 0), Seq(0x3b))))
      .getMessage.contains("more than"))
    // stream ends mid-code (no EOI): clear + 4 literals then nothing:
    // 100 000 001 010 011 -> bytes 0b01000100=0x44, 0b0110100=0x34 and
    // 1 leftover bit — drop the EOI byte from the hand fixture
    assert(intercept[IllegalArgumentException](
      GifImage.parse(gif(Seq(2, 0x44, 0x34))))
      .getMessage.contains("mid-code"))
    // data continues past EOI: append a nonzero byte
    assert(intercept[IllegalArgumentException](
      GifImage.parse(gif(Seq(4, 0x44, 0x34, 0x05, 0x77))))
      .getMessage.contains("past EOI"))
    // index out of the color table: minCode 3 over a 4-entry GCT
    // (literal 5 is a legal width-4 code but table entry 5 is absent
    // ... table has 4 entries; clear=8, width 4; codes 8, 5: bits
    // 1000 0101 -> 0b01011000 = 0x58; then 0,1,2 and EOI(9):
    // 0000 0001 0010 1001 -> 0x10, 0x92 ... assemble: codes
    // 8,5,0,1,2,9 LSB-first 4-bit nibbles: bytes 0x58, 0x10, 0x92
    assert(intercept[IllegalArgumentException](
      GifImage.parse(gif(Seq(3, 0x58, 0x10, 0x92), minCode = 3)))
      .getMessage.contains("out of range"))
  }

  test("scanFrames: single-frame metadata matches the decode face") {
    val p = pal(5)
    val enc = GifImage.encode(7, 4, Array.tabulate(28)(_ % 5), p,
      interlaced = true)
    val fs = GifImage.scanFrames(enc)
    assert(fs.size == 1)
    val m = fs.head
    assert(m.left == 0 && m.top == 0 && m.width == 7 && m.height == 4)
    assert(m.delayCs == 0 && !m.transparent && m.interlaced)
    assert(m.lzwBytes > 0)
  }

  test("scanFrames: animation geometry, delays and flags round-trip") {
    val p = pal(6)
    val geoms = Seq((0, 0, 9, 6, 12), (2, 1, 4, 3, 25), (5, 2, 3, 2, 0),
      (1, 4, 6, 1, 99))
    val bytes = GifImage.encodeAnimation(9, 6, p, geoms,
      f => Array.tabulate(geoms(f)._3 * geoms(f)._4)(i => (i + f) % 6),
      interlacedFrame = f => f % 2 == 1)
    // parse() stays strict about animations; the scan walks them
    assert(intercept[IllegalArgumentException](GifImage.parse(bytes))
      .getMessage.contains("multi-frame"))
    val fs = GifImage.scanFrames(bytes)
    assert(fs.size == 4)
    for ((m, (l, t, w, h, d)) <- fs.zip(geoms)) {
      assert(m.left == l && m.top == t && m.width == w && m.height == h,
        s"geometry mismatch: $m vs ($l,$t,$w,$h)")
      assert(m.delayCs == d, s"delay mismatch: $m")
      assert(!m.transparent)
    }
    assert(fs.map(_.interlaced) == Seq(false, true, false, true))
  }

  test("scanFrames rejects structural damage loudly") {
    val p = pal(4)
    val geoms = Seq((0, 0, 5, 5, 10), (1, 1, 3, 3, 20))
    val good = GifImage.encodeAnimation(5, 5, p, geoms,
      f => Array.fill(geoms(f)._3 * geoms(f)._4)(f % 4))
    // sanity: the good animation scans
    assert(GifImage.scanFrames(good).size == 2)
    // truncation at every prefix
    for (cut <- 1 until good.length)
      intercept[IllegalArgumentException](
        GifImage.scanFrames(java.util.Arrays.copyOf(good, cut)))
    // trailing bytes
    intercept[IllegalArgumentException](
      GifImage.scanFrames(good ++ Array[Byte](1)))
    // a later frame pushed outside the screen: frame 1's left byte
    // (descriptor starts after frame 0's body; patch via re-encode)
    val badGeom = Seq((0, 0, 5, 5, 10), (3, 3, 3, 3, 20))
    intercept[IllegalArgumentException](
      GifImage.encodeAnimation(5, 5, p, badGeom,
        f => Array.fill(badGeom(f)._3 * badGeom(f)._4)(0)))
    // ...and a hand-assembled second frame outside the screen rejects
    // at its descriptor (before any of its body is read): reuse a
    // valid single-frame body, append a 4+3>5 descriptor, trailer
    val single = GifImage.encode(5, 5, Array.fill(25)(1), p)
    val bodyAt = 13 + 12 // header+LSD, GCT of 4
    val body0 = single.slice(bodyAt, single.length - 1)
    val oob = single.take(bodyAt) ++ body0 ++
      bytesOf(Seq(0x2c, 4, 0, 4, 0, 3, 0, 3, 0, 0), Seq(0x3b))
    assert(intercept[IllegalArgumentException](
      GifImage.scanFrames(oob))
      .getMessage.contains("outside"))
  }

  // -------------------------------------------- animation compositing

  test("compositing HAND FIXTURE: disposal 1/2/3 + transparency") {
    // 3x2 screen, palette A/B/C/T; scripted by hand, canvases derived
    // by hand — the disposal state machine cannot hide behind
    // generator symmetry
    val pal = Array(0xffff0000, 0xff00ff00, 0xff0000ff, 0xff111111)
    val A = 0xffff0000; val B = 0xff00ff00; val C = 0xff0000ff
    val bytes = GifImage.encodeAnimation(3, 2, pal,
      Seq((0, 0, 3, 2, 1), (1, 0, 1, 1, 1), (1, 1, 2, 1, 1),
        (0, 0, 1, 1, 1)),
      framePx = {
        case 0 => Array(0, 0, 0, 0, 0, 0) // all A
        case 1 => Array(1) // B at (1,0)
        case 2 => Array(3, 2) // T(transparent), C at (1,1)..(2,1)
        case _ => Array(1) // B at (0,0)
      },
      disposalFor = { case 1 => 2; case 2 => 3; case _ => 1 },
      transparentFor = { case 2 => 3; case _ => -1 })
    val (w, h, frames) = GifImage.decodeAnimation(bytes)
    assert(w == 3 && h == 2 && frames.length == 4)
    // f0: all A
    assert(frames(0).canvas.toSeq == Seq(A, A, A, A, A, A))
    // f1: B drawn at (1,0); disposal 2 clears it AFTER the snapshot
    assert(frames(1).canvas.toSeq == Seq(A, B, A, A, A, A))
    // f2: (1,0) is now an unpainted hole; frame 2's (1,1) is
    // transparent (stays A), (2,1) paints C; disposal 3 restores after
    assert(frames(2).canvas.toSeq == Seq(A, 0, A, A, A, C))
    assert(frames(2).disposal == 3)
    // f3: the restore undid C; B paints (0,0); the hole persists
    assert(frames(3).canvas.toSeq == Seq(B, 0, A, A, A, A))
    // metadata carried through
    assert(frames.map(_.delayCs) == Seq(1, 1, 1, 1))
    assert(frames(1).disposal == 2 && frames(3).disposal == 1)
  }

  test("compositing matches an independent reference model on random scripts") {
    // the reference compositor below is written directly from the
    // GIF89a rendering rules, sharing NO code with decodeAnimation —
    // randomized scripts (frames, offsets, disposals, transparency,
    // interlace) must composite identically
    val rnd = new scala.util.Random(3141)
    for (t <- 0 until 25) {
      val sw = 4 + rnd.nextInt(12); val sh = 3 + rnd.nextInt(9)
      val nPal = 4 + rnd.nextInt(12)
      val pal = Array.tabulate(nPal)(j => 0xff000000 | (rnd.nextInt() & 0xffffff))
      val nf = 1 + rnd.nextInt(5)
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
      val inter = (0 until nf).map(_ => rnd.nextBoolean())
      val bytes = GifImage.encodeAnimation(sw, sh, pal, geom, px(_),
        interlacedFrame = inter(_), disposalFor = disp(_),
        transparentFor = trans(_))
      val (_, _, frames) = GifImage.decodeAnimation(bytes)
      // independent reference: paint, snapshot, dispose
      val canvas = new Array[Int](sw * sh)
      for (f <- 0 until nf) {
        val (l, tp, fw, fh, _) = geom(f)
        val before = canvas.clone()
        for (v <- 0 until fh; u <- 0 until fw) {
          val idx = px(f)(v * fw + u)
          if (idx != trans(f)) canvas((tp + v) * sw + (l + u)) = pal(idx)
        }
        assert(frames(f).canvas.toSeq == canvas.toSeq,
          s"composite mismatch t=$t frame $f")
        disp(f) match {
          case 2 =>
            for (v <- 0 until fh; u <- 0 until fw)
              canvas((tp + v) * sw + (l + u)) = 0
          case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
          case _ => ()
        }
      }
    }
  }

  test("undefined disposal methods and multi-frame strictness") {
    val pal = Array(0xff000000, 0xffffffff)
    val good = GifImage.encodeAnimation(2, 2, pal,
      Seq((0, 0, 2, 2, 1), (0, 0, 1, 1, 1)),
      framePx = f => if (f == 0) Array(0, 1, 0, 1) else Array(1),
      disposalFor = _ => 1)
    assert(GifImage.decodeAnimation(good)._3.length == 2) // sanity
    // disposal 4 ("to be defined"): patch the second GCE's flags —
    // GCEs are the only 0x21 0xf9 pairs in the stream
    val gceAt = (0 until good.length - 1).filter(i =>
      (good(i) & 0xff) == 0x21 && (good(i + 1) & 0xff) == 0xf9)
    assert(gceAt.length == 2)
    val bad = good.clone()
    bad(gceAt(1) + 3) = ((4 << 2) | (bad(gceAt(1) + 3) & 3)).toByte
    assert(intercept[IllegalArgumentException](
      GifImage.decodeAnimation(bad))
      .getMessage.contains("disposal"))
    // the single-frame parse() face still refuses animations
    assert(intercept[IllegalArgumentException](GifImage.parse(good))
      .getMessage.contains("multi-frame"))
    // truncation anywhere must throw
    for (cut <- Seq(good.length / 3, good.length / 2, good.length - 2))
      intercept[IllegalArgumentException](
        GifImage.decodeAnimation(java.util.Arrays.copyOf(good, cut)))
  }

  test("encodeAnimation samples the interlace predicate ONCE per frame") {
    // a non-deterministic closure must not produce a GIF whose
    // interlace flag contradicts its payload row order — the flag byte
    // and the row permutation must come from the SAME evaluation
    // (advisor r17: the r16 fix only pinned the CodecFuzz call site)
    val pal = Array(0xff102030, 0xffffffff, 0xff336699, 0xff995511)
    val w = 5; val h = 7
    val px = Array.tabulate(w * h)(i => i % 4)
    var calls = 0
    val bytes = GifImage.encodeAnimation(w, h, pal, Seq((0, 0, w, h, 0)),
      _ => px,
      interlacedFrame = _ => { calls += 1; calls % 2 == 1 })
    val (_, _, frames) = GifImage.decodeAnimation(bytes)
    assert(frames.length == 1)
    assert(frames.head.canvas.map(_ & 0xffffff).toSeq ==
      px.map(k => pal(k) & 0xffffff).toSeq)
  }
}

/** Container-independence of the perceptual-hash seam, third container:
  * the SAME synthesized pixels carried in a GIF (exact first-occurrence
  * palette, LZW, interlace and sub-block splits varying by id) must
  * hash identically to the BMP and PNG paths — what lets q148 grade
  * against q136's oracle without a fourth hash definition. */
class GifPhashParitySpec extends SparkSuite {
  test("imageHashesOf(gif) equals imageHashesOf(bmp) corpus-wide") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bmp = graft.operators.Multimodal.imageHashesOf(docs, "bmp")
    val gif = graft.operators.Multimodal.imageHashesOf(docs, "gif")
    assert(bmp.count() > 0)
    assert(bmp.exceptAll(gif).isEmpty && gif.exceptAll(bmp).isEmpty,
      "phash differs between BMP and GIF containers")
  }
}
