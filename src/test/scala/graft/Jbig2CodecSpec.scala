package graft

import graft.sources.Jbig2Codec
import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 minimal scanned profile (T.88): encoder-mirror round-trips
  * across content classes that stress the MQ coder differently (noise
  * exercises LPS churn, sparse text-like content drives long MPS runs
  * into the high-index Qe states, blank pages hit the fast path,
  * stripes hit context periodicity), geometry sweeps across byte
  * boundaries, and named rejects. Decode correctness against
  * INDEPENDENT encoders is additionally pinned by the round-19 corpus
  * probe (all 100 scanner-produced streams in the reference's PDFs
  * decode majority-white with the spec's 1-equals-black convention);
  * the specs here keep CI self-contained. */
class Jbig2CodecSpec extends AnyFunSuite {

  private def mix(m: Long): Long = {
    var z = m * 0x9E3779B97F4A7C15L
    z ^= (z >>> 29); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 32)
    z
  }

  test("round-trip matrix: content class x geometry") {
    for {
      (w, h) <- Seq((1, 1), (7, 3), (8, 8), (17, 9), (64, 48), (33, 21))
      kind <- 0 to 3
    } {
      val plane = Array.tabulate(w * h) { i =>
        (kind match {
          case 0 => (mix(w * 1000 + h * 31 + i) & 1).toInt // noise
          case 1 => if ((mix(i * 7 + w) & 15) == 0) 1 else 0 // sparse
          case 2 => 0 // blank page
          case _ => if ((i % w) / 3 % 2 == 0) 1 else 0 // stripes
        }).toByte
      }
      val enc = Jbig2Codec.encode(plane, w, h)
      val dec = Jbig2Codec.decode(enc, w, h)
      assert(dec.sameElements(plane), s"${w}x$h kind=$kind")
    }
  }

  test("templates 1-3 and TPGDON round-trip across content classes") {
    for {
      tmpl <- 0 to 3
      tpgdon <- Seq(false, true)
      kind <- 0 to 2
    } {
      val (w, h) = (41, 23)
      val plane = Array.tabulate(w * h) { i =>
        (kind match {
          case 0 => (mix(tmpl * 77 + i) & 1).toInt
          case 1 => if (i / w % 5 == 0) (mix(i) & 1).toInt else 0 // runs
          case _ => if ((mix(i / w * 3) & 1) == 1) 1 else 0 // row bands
        }).toByte
      }
      val enc = Jbig2Codec.encode(plane, w, h, template = tmpl,
        tpgdon = tpgdon)
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"tmpl=$tmpl tpgdon=$tpgdon kind=$kind")
    }
    // TPGDON earns its keep on typical content: a page of long
    // identical-row runs must compress markedly better with it
    val (w, h) = (128, 64)
    val page = Array.tabulate(w * h)(i =>
      if (i / w >= 30 && i / w <= 33) 1 else 0).map(_.toByte)
    val plain = Jbig2Codec.encode(page, w, h)
    val tp = Jbig2Codec.encode(page, w, h, tpgdon = true)
    assert(Jbig2Codec.decode(tp, w, h).sameElements(page))
    assert(tp.length < plain.length,
      s"TPGDON (${tp.length} B) not smaller than plain (${plain.length} B)")
  }

  test("long MPS runs drive the Qe state ladder to its floor and back") {
    // a mostly-white page with one black row in the middle: thousands
    // of consecutive MPS decisions push the per-context state to the
    // ladder's bottom (Qe 0x0001), then the black row forces LPS
    // excursions through the SWITCH states
    val (w, h) = (200, 60)
    val plane = Array.tabulate(w * h)(i => if (i / w == 30) 1 else 0)
      .map(_.toByte)
    val enc = Jbig2Codec.encode(plane, w, h)
    assert(enc.length < w * h / 8, "compresses far below the raw plane")
    assert(Jbig2Codec.decode(enc, w, h).sameElements(plane))
  }

  test("named rejects: truncation, foreign segment types, geometry lies") {
    val plane = Array.tabulate(64)(i => (i % 2).toByte)
    val good = Jbig2Codec.encode(plane, 8, 8)
    // header truncation
    intercept[IllegalArgumentException] {
      Jbig2Codec.decode(java.util.Arrays.copyOf(good, 5), 8, 8)
    }
    // a region NARROWER than the page is legal (composites at its
    // (x, y); uncovered columns stay white) — the round-20 page-
    // composite model
    val wide = Jbig2Codec.decode(good, 9, 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(wide(y * 9 + x) == plane(y * 8 + x), s"($x,$y)")
    for (y <- 0 until 8) assert(wide(y * 9 + 8) == 0, s"pad col row $y")
    // ...but a region overrunning the page is a geometry lie
    val e = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(good, 7, 8)
    }
    assert(e.getMessage.contains("overruns"))
    // intermediate-region segment types stay named rejects (they need
    // retained auxiliary buffers no embedded PDF stream uses)
    val bad = good.clone()
    bad(4) = 4 // segment type 48 -> 4 (intermediate text region)
    val e2 = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(bad, 8, 8)
    }
    assert(e2.getMessage.contains("segment type 4 unsupported"))
  }

  test("MMR generic regions round-trip through the T.6 core") {
    for {
      (w, h) <- Seq((8, 8), (17, 9), (64, 48), (33, 21), (1, 5))
      kind <- 0 to 2
    } {
      val plane = Array.tabulate(w * h) { i =>
        (kind match {
          case 0 => (mix(w * 131 + i) & 1).toInt // noise
          case 1 => if ((mix(i * 5 + h) & 7) == 0) 1 else 0 // sparse
          case _ => if ((i % w) / 4 % 2 == 0) 1 else 0 // stripes
        }).toByte
      }
      val enc = Jbig2Codec.encodeMmr(plane, w, h)
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"mmr ${w}x$h kind=$kind")
    }
  }

  test("symbol/text profile round-trips with symbol reuse") {
    // a "text page": a small glyph alphabet stamped repeatedly — the
    // encoder must deduplicate repeated tiles into dictionary symbols
    // and the text region must reassemble the exact plane
    val (w, h) = (64, 40)
    val plane = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      val glyph = mix((x / 8).toLong * 31 + (y / 8) * 7) & 3 // 4 glyphs
      val (gx, gy) = (x % 8, y % 8)
      (glyph match {
        case 0 => if (gx == gy) 1 else 0
        case 1 => if (gx == 0 || gy == 0) 1 else 0
        case 2 => if ((gx + gy) % 3 == 0) 1 else 0
        case _ => 0
      }).toByte
    }
    val enc = Jbig2Codec.encodeSymbolText(plane, w, h,
      Jbig2Codec.SymTextCfg(tileW = 8, tileH = 8))
    assert(Jbig2Codec.decode(enc, w, h).sameElements(plane))
    // symbol reuse must make the text coding far smaller than the
    // generic coding of the same page is allowed to be dumb about
    val generic = Jbig2Codec.encode(plane, w, h)
    assert(enc.length < generic.length + 200,
      s"text ${enc.length} B vs generic ${generic.length} B")
  }

  test("symbol/text knob matrix: corners x transposed x strips x offset") {
    val (w, h) = (40, 28)
    val plane = Array.tabulate(w * h)(i =>
      (if ((mix(i * 13L) & 3) == 0) 1 else 0).toByte)
    for {
      corner <- 0 to 3
      transposed <- Seq(false, true)
      logStrips <- Seq(0, 2)
      ds <- Seq(0, -3, 5)
      (tw, th) <- Seq((8, 8), (7, 5), (16, 9))
    } {
      val cfg = Jbig2Codec.SymTextCfg(tileW = tw, tileH = th,
        refCorner = corner, transposed = transposed,
        logStrips = logStrips, dsOffset = ds)
      val enc = Jbig2Codec.encodeSymbolText(plane, w, h, cfg)
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"corner=$corner transposed=$transposed logStrips=$logStrips " +
          s"ds=$ds tile=${tw}x$th")
    }
  }

  test("symbol/text round-trips across templates and edge tile shapes") {
    for {
      tmpl <- 0 to 3
      (w, h) <- Seq((9, 7), (31, 17), (1, 1), (5, 40))
    } {
      val plane = Array.tabulate(w * h)(i =>
        (if ((mix(i * 7L + tmpl * 997 + w) & 1) == 0) 1 else 0).toByte)
      val enc = Jbig2Codec.encodeSymbolText(plane, w, h,
        Jbig2Codec.SymTextCfg(tileW = 6, tileH = 6, template = tmpl))
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"tmpl=$tmpl ${w}x$h")
    }
  }

  test("refinement regions: rough base + refinement decode to the exact plane") {
    // the lossy-then-lossless touch-up shape: the base approximation
    // can be arbitrarily wrong — decode must equal the REFINED plane
    for {
      tmpl <- 0 to 1
      (w, h) <- Seq((8, 8), (19, 13), (64, 40), (1, 6))
      damage <- Seq(0, 1, 3)
    } {
      val plane = Array.tabulate(w * h)(i =>
        (if ((mix(i * 11L + w * 7 + tmpl) & 3) == 0) 1 else 0).toByte)
      val base = plane.clone()
      var k = 0
      while (k < w * h) { // flip a damage-dependent subset
        if (damage > 0 && (mix(k * 13L + damage) & 7) < damage)
          base(k) = (1 - base(k)).toByte
        k += 1
      }
      val enc = Jbig2Codec.encodeRefined(base, plane, w, h, tmpl)
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"tmpl=$tmpl ${w}x$h damage=$damage")
    }
    // a refinement stream is SMALLER than a from-scratch recode when
    // the base is already close (the reason the shape exists)
    val (w, h) = (128, 64)
    val plane = Array.tabulate(w * h)(i =>
      (if ((mix(i * 3L) & 15) == 0) 1 else 0).toByte)
    val near = plane.clone(); near(w * 5 + 7) = (1 - near(w * 5 + 7)).toByte
    val refined = Jbig2Codec.encodeRefined(near, plane, w, h)
    assert(Jbig2Codec.decode(refined, w, h).sameElements(plane))
    // TPGRON stays a named reject: the refinement segment's flags
    // byte sits at region-info+17 of segment 2 — located via the
    // base segment's stated data length (u32 at offset 30+7)
    val baseLen = (((refined(37) & 0xffL) << 24) |
      ((refined(38) & 0xffL) << 16) | ((refined(39) & 0xffL) << 8) |
      (refined(40) & 0xffL)).toInt
    val refFlagsAt = 30 + 11 + baseLen + 11 + 17
    val bad = refined.clone()
    bad(refFlagsAt) = (bad(refFlagsAt) | 2).toByte // TPGRON bit
    val e = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(bad, w, h)
    }
    assert(e.getMessage.contains("TPGRON"))
  }

  test("refinement inside symbol/text coding: SDREFAGG and per-instance RI") {
    // the lossy-text-encoder shapes: refineDict codes every distinct
    // tile as an SDREFAGG refinement of its geometry representative
    // (imported from a FIRST dictionary); refineText keeps only the
    // representatives and refines per instance (RI = 1 where the tile
    // differs). Both must reproduce the exact plane.
    for {
      mode <- Seq("dict", "text")
      rTmpl <- 0 to 1
      (w, h) <- Seq((32, 24), (17, 9), (48, 16))
      (tw, th) <- Seq((8, 8), (5, 7))
    } {
      val plane = Array.tabulate(w * h)(i =>
        (if ((mix(i * 17L + w * 3 + rTmpl) & 3) == 0) 1 else 0).toByte)
      val cfg = Jbig2Codec.SymTextCfg(tileW = tw, tileH = th,
        refineText = mode == "text", refineDict = mode == "dict",
        refTemplate = rTmpl)
      val enc = Jbig2Codec.encodeSymbolText(plane, w, h, cfg)
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"mode=$mode rTmpl=$rTmpl ${w}x$h tile=${tw}x$th")
    }
    // refinement composes with the container knobs
    for (corner <- Seq(0, 3); transposed <- Seq(false, true);
         mode <- Seq("dict", "text")) {
      val (w, h) = (40, 24)
      val plane = Array.tabulate(w * h)(i =>
        (if ((mix(i * 29L + corner) & 7) == 0) 1 else 0).toByte)
      val cfg = Jbig2Codec.SymTextCfg(tileW = 8, tileH = 8,
        refCorner = corner, transposed = transposed, logStrips = 2,
        refineText = mode == "text", refineDict = mode == "dict")
      val enc = Jbig2Codec.encodeSymbolText(plane, w, h, cfg)
      assert(Jbig2Codec.decode(enc, w, h).sameElements(plane),
        s"mode=$mode corner=$corner transposed=$transposed")
    }
    // the shapes must EARN their keep on glyph-variant content: a page
    // of near-identical LARGE glyphs (one representative + one-pixel
    // dents) should cost less via SDREFAGG than via a full per-tile
    // dictionary, mirroring why lossy text encoders exist (small
    // glyphs amortize too little — the generic coder adapts well —
    // so the economics are asserted at 16x16)
    val (w, h) = (96, 48)
    val glyph = Array.tabulate(256)(i =>
      (if (i % 16 == i / 16 || i % 16 < 2 || i / 16 == 15) 1 else 0)
        .toByte)
    val plane = new Array[Byte](w * h)
    for (m <- 0 until h / 16; n <- 0 until w / 16; py <- 0 until 16;
         px <- 0 until 16) {
      val dent = (mix(m * 31L + n * 7) & 255) == (py * 16 + px)
      plane((m * 16 + py) * w + n * 16 + px) =
        (glyph(py * 16 + px) ^ (if (dent) 1 else 0)).toByte
    }
    val plain = Jbig2Codec.encodeSymbolText(plane, w, h,
      Jbig2Codec.SymTextCfg(tileW = 16, tileH = 16))
    val refined = Jbig2Codec.encodeSymbolText(plane, w, h,
      Jbig2Codec.SymTextCfg(tileW = 16, tileH = 16, refineDict = true))
    assert(Jbig2Codec.decode(refined, w, h).sameElements(plane))
    assert(refined.length < plain.length,
      s"SDREFAGG (${refined.length} B) not smaller than per-tile " +
        s"dictionary (${plain.length} B) on glyph-variant content")
  }

  test("halftone regions: pattern dictionary + Gray-coded planes stamp exactly") {
    // the halftone profile: a pattern dictionary (one WIDE collective
    // generic region, pattern k at column k·side) + a grid of
    // Gray-coded values stamping patterns on the axis-aligned grid
    for {
      tmpl <- 0 to 3
      nPats <- Seq(1, 2, 3, 5, 8)
      (gw, gh) <- Seq((4, 3), (8, 8), (1, 1))
      side <- Seq(4, 8)
    } {
      val patterns = (0 until nPats).map { k =>
        (side, side, Array.tabulate(side * side)(i =>
          (if ((mix(k * 131L + i) & 3) == 0) 1 else 0).toByte))
      }
      val grays = Array.tabulate(gw * gh)(i =>
        (mix(i * 7L + nPats) % nPats).toInt.abs)
      val enc = Jbig2Codec.encodeHalftone(grays, gw, gh, patterns, tmpl)
      val got = Jbig2Codec.decode(enc, gw * side, gh * side)
      // expected: stamp locally
      val want = new Array[Byte](gw * side * gh * side)
      for (m <- 0 until gh; n <- 0 until gw; py <- 0 until side;
           px <- 0 until side)
        want((m * side + py) * (gw * side) + n * side + px) =
          patterns(grays(m * gw + n))._3(py * side + px)
      assert(got.sameElements(want),
        s"tmpl=$tmpl nPats=$nPats grid=${gw}x$gh side=$side")
    }
    // named rejects: MMR halftone, skip-enabled halftone
    val patterns = IndexedSeq((4, 4, Array.fill(16)(1.toByte)))
    val good = Jbig2Codec.encodeHalftone(Array.fill(4)(0), 2, 2, patterns)
    // halftone flags byte: page(30) + pattern-dict segment (11 header
    // + stated length) + region header 11 + region info 17
    val dictLen = (((good(37) & 0xffL) << 24) |
      ((good(38) & 0xffL) << 16) | ((good(39) & 0xffL) << 8) |
      (good(40) & 0xffL)).toInt
    val hflagsAt = 30 + 11 + dictLen + 12 + 17 // +12: header has 1 ref
    val mmr = good.clone()
    mmr(hflagsAt) = (mmr(hflagsAt) | 1).toByte
    val e = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(mmr, 8, 8)
    }
    assert(e.getMessage.contains("MMR halftone"))
    val skip = good.clone()
    skip(hflagsAt) = (skip(hflagsAt) | 8).toByte
    val e2 = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(skip, 8, 8)
    }
    assert(e2.getMessage.contains("HENABLESKIP"))
  }

  test("symbol/text named rejects: huffman, refinement, halftone flags") {
    val (w, h) = (16, 16)
    val plane = Array.tabulate(w * h)(i => (i % 2).toByte)
    val good = Jbig2Codec.encodeSymbolText(plane, w, h,
      Jbig2Codec.SymTextCfg(tileW = 8, tileH = 8))
    // the symbol dictionary payload starts after the page-info segment
    // (11-byte header + 19-byte payload) and its own 11-byte header;
    // its first two bytes are the dictionary flags
    val dictFlagsAt = 30 + 11
    val huff = good.clone()
    huff(dictFlagsAt + 1) = (huff(dictFlagsAt + 1) | 1).toByte // SDHUFF
    val e1 = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(huff, w, h)
    }
    assert(e1.getMessage.contains("SDHUFF"))
    // SDREFAGG itself DECODES as of round 20 (its own round-trip test
    // above); the remaining refinement-tier reject is an aggregate of
    // more than one instance — not craftable by flag surgery (the
    // count is arithmetic-coded), pinned instead by the decoder's
    // REFAGGNINST require and the fuzz family's mutation oracle.
    // Huffman text regions stay named rejects:
    val textFlagsAt = {
      // segment 2 header starts after page(30) + dict segment; its
      // data length is the u32 at 30+7
      val dictLen = (((good(37) & 0xffL) << 24) |
        ((good(38) & 0xffL) << 16) | ((good(39) & 0xffL) << 8) |
        (good(40) & 0xffL)).toInt
      30 + 11 + dictLen + 12 + 17 // 12-byte header (1 ref) + region info
    }
    val huffText = good.clone()
    huffText(textFlagsAt + 1) = (huffText(textFlagsAt + 1) | 1).toByte
    val e2 = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(huffText, w, h)
    }
    assert(e2.getMessage.contains("SBHUFF"))
  }
}
