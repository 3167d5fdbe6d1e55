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
    // geometry contradiction: dict says 9 wide, region says 8
    val e = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(good, 9, 8)
    }
    assert(e.getMessage.contains("does not fill"))
    // symbol-dictionary segment type is a named reject
    val bad = good.clone()
    bad(4) = 0 // segment type 48 -> 0 (symbol dictionary)
    val e2 = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(bad, 8, 8)
    }
    assert(e2.getMessage.contains("unsupported"))
    // MMR flag in the generic region flags
    val good2 = Jbig2Codec.encode(plane, 8, 8)
    // generic flags byte: segment 2 header is 11 bytes after the
    // page-info segment (11 header + 19 payload); region data starts
    // after its own 11-byte header; flags at +17+... locate by
    // construction: 30 (page seg) + 11 (region header) + 17 = byte 58
    val flagsAt = 30 + 11 + 17
    good2(flagsAt) = (good2(flagsAt) | 1).toByte
    val e3 = intercept[IllegalArgumentException] {
      Jbig2Codec.decode(good2, 8, 8)
    }
    assert(e3.getMessage.contains("MMR"))
  }
}
