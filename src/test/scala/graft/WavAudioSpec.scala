package graft

import graft.sources.WavAudio
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM WAV codec against hand-built byte vectors — the
  * PdfTextSpec discipline for the audio half of the multimodal decode:
  * exact sample recovery, container edge cases (unknown chunks, word
  * alignment, 8-bit and stereo layouts built byte-by-byte here, not via
  * the encoder under test), and loud rejection of malformed input. */
class WavAudioSpec extends AnyFunSuite {

  test("PCM16 round-trip recovers every sample exactly") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val w = WavAudio.parse(WavAudio.encodePcm16Mono(44100, samples))
    assert(w.sampleRate == 44100)
    assert(w.channels == 1)
    assert(w.bits == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("unknown chunks are skipped, including odd sizes (word alignment)") {
    // hand-build: RIFF [junk size=3 -> padded to 4] [fmt] [data]
    val bb = java.nio.ByteBuffer.allocate(100)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0) // size patched below
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("junk".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](9, 9, 9, 0)) // 3 bytes payload + 1 pad
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(4)
      .putShort(100).putShort(-100)
    val len = bb.position()
    val bytes = java.util.Arrays.copyOf(bb.array(), len)
    // patch RIFF size
    val sz = len - 8
    bytes(4) = (sz & 0xff).toByte; bytes(5) = ((sz >> 8) & 0xff).toByte
    bytes(6) = ((sz >> 16) & 0xff).toByte; bytes(7) = ((sz >> 24) & 0xff).toByte
    val w = WavAudio.parse(bytes)
    assert(w.samples.toSeq == Seq(100, -100))
  }

  test("8-bit PCM is re-centered to signed") {
    val bb = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(4)
    bb.put(Array[Byte](0, 128.toByte, 255.toByte, 127))
    val w = WavAudio.parse(java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(w.bits == 8)
    assert(w.samples.toSeq == Seq(-128, 0, 127, -1))
  }

  test("stereo PCM16: interleaved samples and frame count") {
    val bb = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(44)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(16000).putInt(64000)
      .putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(1).putShort(-1).putShort(2).putShort(-2)
    val w = WavAudio.parse(java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(w.channels == 2)
    assert(w.samples.toSeq == Seq(1, -1, 2, -2))
    assert(w.nFrames == 2)
  }

  test("trailing bytes past the declared RIFF size are ignored") {
    val good = WavAudio.encodePcm16Mono(8000, Array(7, -7))
    // taggers append junk past the RIFF boundary; the declared size
    // bounds the chunk walk, so this must decode identically
    val tagged = good ++ Array[Byte]('I', 'D', '3', 9, 9, 9, 9)
    assert(WavAudio.parse(tagged).samples.toSeq == Seq(7, -7))
  }

  test("malformed containers are rejected loudly") {
    val good = WavAudio.encodePcm16Mono(8000, Array(1, 2, 3))
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](WavAudio.parse(badMagic))
    // truncated mid-chunk
    intercept[IllegalArgumentException](
      WavAudio.parse(java.util.Arrays.copyOf(good, good.length - 2)))
    // a chunk whose declared size overruns the file
    val overrun = good.clone()
    // the data chunk size field sits 8 bytes from the end of header;
    // corrupt the LAST chunk's size to something huge
    val dataSizeOff = good.length - 6 - 4 // data payload 6 bytes, size u32
    overrun(dataSizeOff) = 0x7f.toByte
    overrun(dataSizeOff + 1) = 0x7f.toByte
    intercept[IllegalArgumentException](WavAudio.parse(overrun))
    // non-PCM format tag
    val nonPcm = good.clone()
    // fmt chunk starts at 12; format tag at 12+8
    nonPcm(20) = 3 // IEEE float
    intercept[IllegalArgumentException](WavAudio.parse(nonPcm))
    // not even RIFF-sized
    intercept[IllegalArgumentException](WavAudio.parse(Array[Byte](1, 2)))
  }

  test("truncated multi-channel data (partial trailing frame) is rejected") {
    // stereo PCM16: frame = 4 bytes; declare a 6-byte data chunk — one
    // whole frame plus half a frame. The old % 2 check let this decode
    // silently (nFrames floored the partial frame away); strict
    // validation must name the frame-size mismatch instead
    val bb = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(42)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(16000).putInt(64000)
      .putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(6)
      .putShort(1).putShort(-1).putShort(2)
    val ex = intercept[IllegalArgumentException](
      WavAudio.parse(java.util.Arrays.copyOf(bb.array(), bb.position())))
    assert(ex.getMessage.contains("frame size"))
  }

  test("duplicate fmt/data chunks are rejected, not last-win") {
    def container(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
      val body = chunks.flatMap { case (id, payload) =>
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
        bb.array().toSeq
      }.toArray
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("WAVE".getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val fmtMono8k = {
      val bb = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
      bb.array()
    }
    val data = Array[Byte](1, 0, 2, 0)
    val dupFmt = container(Seq(
      "fmt " -> fmtMono8k, "fmt " -> fmtMono8k, "data" -> data))
    assert(intercept[IllegalArgumentException](WavAudio.parse(dupFmt))
      .getMessage.contains("duplicate fmt"))
    val dupData = container(Seq(
      "fmt " -> fmtMono8k, "data" -> data, "data" -> data))
    assert(intercept[IllegalArgumentException](WavAudio.parse(dupData))
      .getMessage.contains("duplicate data"))
  }

  test("24-bit PCM round-trip recovers every sample exactly") {
    val rnd = new scala.util.Random(161)
    for (t <- 0 until 6) {
      val n = 1 + rnd.nextInt(500)
      val samples = Array.fill(n)(rnd.nextInt(1 << 24) - (1 << 23))
      val rate = 8000 + rnd.nextInt(40000)
      val w = WavAudio.parse(WavAudio.encodePcm24Mono(rate, samples))
      assert(w.sampleRate == rate && w.channels == 1 && w.bits == 24 &&
        w.format == 1)
      assert(w.samples.toSeq == samples.toSeq, s"PCM24 samples (t=$t)")
      // odd data sizes exercise the word-alignment pad byte
    }
    // sign extension at the extremes and around zero
    val edge = Array(-(1 << 23), (1 << 23) - 1, -1, 0, 1, -256, 256)
    assert(WavAudio.parse(WavAudio.encodePcm24Mono(8000, edge))
      .samples.toSeq == edge.toSeq)
  }

  test("IEEE-float WAV (tag 3) round-trips raw float bits exactly") {
    val rnd = new scala.util.Random(261)
    for (t <- 0 until 6) {
      val n = 1 + rnd.nextInt(400)
      val samples = Array.fill(n)(rnd.nextFloat() * 2f - 1f)
      val rate = 8000 + rnd.nextInt(40000)
      val w = WavAudio.parse(WavAudio.encodeFloat32Mono(rate, samples))
      assert(w.format == 3 && w.bits == 32 && w.channels == 1)
      assert(w.nFrames == n)
      for (i <- 0 until n)
        assert(w.floatSample(i) == samples(i), s"float sample $i (t=$t)")
    }
  }

  test("float gates: non-finite samples, wrong width, misalignment") {
    val good = WavAudio.encodeFloat32Mono(8000,
      Array(0.5f, -0.25f, 1.0f, 0.0f))
    assert(WavAudio.parse(good).nFrames == 4) // sanity
    // NaN sample injected into the data chunk (never legitimate audio)
    val nan = good.clone()
    val dataAt = good.length - 16 // 4 samples x 4 bytes from the end
    val nanBits = java.lang.Float.floatToRawIntBits(Float.NaN)
    for (i <- 0 until 4)
      nan(dataAt + i) = ((nanBits >> (8 * i)) & 0xff).toByte
    assert(intercept[IllegalArgumentException](WavAudio.parse(nan))
      .getMessage.contains("non-finite"))
    // tag 3 with a 16-bit width: float requires 32
    val w16 = good.clone(); w16(34) = 16
    assert(intercept[IllegalArgumentException](WavAudio.parse(w16))
      .getMessage.contains("must be 32"))
    // data size knocked off the 4-byte frame grid
    val mis = good.clone()
    val ds = 4 * 4 - 1
    mis(good.length - 16 - 8 + 4) = (ds & 0xff).toByte
    intercept[IllegalArgumentException](WavAudio.parse(mis))
  }

  test("format tags beyond the decode family reject by name (ADPCM)") {
    val good = WavAudio.encodePcm16Mono(8000, Array(1, -2, 3, -4))
    // tags 6/7 became the G.711 decode lane in round 17, tags 2/17
    // the ADPCM lanes in round 18 — the formerly-rejected classes
    // RETARGET onto still-invalid gates: unknown tags stay named
    // rejects, and an in-family tag claiming the wrong width is its
    // own gate (this container says 16)
    for (tag <- Seq(0x55, 0x31)) { // MPEG L3, GSM 6.10
      val b = good.clone(); b(20) = tag.toByte
      assert(intercept[IllegalArgumentException](WavAudio.parse(b))
        .getMessage.contains(s"format tag $tag"))
    }
    for (tag <- Seq(2, 17)) { // ADPCM on a 16-bit container: width gate
      val b = good.clone(); b(20) = tag.toByte
      assert(intercept[IllegalArgumentException](WavAudio.parse(b))
        .getMessage.contains("must be 4"))
    }
    for (tag <- Seq(6, 7)) {
      val b = good.clone(); b(20) = tag.toByte
      assert(intercept[IllegalArgumentException](WavAudio.parse(b))
        .getMessage.contains("must be 8"))
    }
    // 20-bit width (the retargeted q154 quarantine class)
    val w20 = good.clone(); w20(34) = 20
    assert(intercept[IllegalArgumentException](WavAudio.parse(w20))
      .getMessage.contains("bit width 20"))
  }

  test("G.711 expansion matches hand-derived ITU table values") {
    // μ-law: both zero codes, both extremes (±32124)
    assert(WavAudio.ulawExpand(0xff) == 0)
    assert(WavAudio.ulawExpand(0x7f) == 0)
    assert(WavAudio.ulawExpand(0x00) == -32124)
    assert(WavAudio.ulawExpand(0x80) == 32124)
    // A-law: minimum magnitude ±8 (no zero sample), extremes ±32256
    assert(WavAudio.alawExpand(0x55) == -8)
    assert(WavAudio.alawExpand(0xd5) == 8)
    assert(WavAudio.alawExpand(0x2a) == -32256)
    assert(WavAudio.alawExpand(0xaa) == 32256)
    // compand identities over the full code space (μ-law's negative
    // zero 0x7f folds onto 0xff; every other code is a fixed point)
    for (c <- 0 until 256 if c != 0x7f)
      assert(WavAudio.ulawCompress(WavAudio.ulawExpand(c)) == c, s"u $c")
    for (c <- 0 until 256)
      assert(WavAudio.alawCompress(WavAudio.alawExpand(c)) == c, s"a $c")
  }

  test("G.711 container round-trip: codes in, expanded linear out") {
    for (law <- Seq(6, 7)) {
      val codes = Array.tabulate(201)(i => (i * 37 + law) % 256)
      val w = WavAudio.parse(WavAudio.encodeG711Mono(law, 8000, codes))
      assert(w.format == law && w.bits == 8 && w.channels == 1)
      assert(w.nFrames == 201)
      val expand: Int => Int =
        if (law == 6) WavAudio.alawExpand else WavAudio.ulawExpand
      assert(w.samples.toSeq == codes.map(expand).toSeq, s"law $law")
    }
  }

  test("G.711 parity: javax.sound decodes our files to the same linear values") {
    import javax.sound.sampled._
    for (law <- Seq(6, 7)) {
      val codes = Array.tabulate(256)(identity) // every code once
      val bytes = WavAudio.encodeG711Mono(law, 8000, codes)
      val ours = WavAudio.parse(bytes).samples
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pcm = AudioSystem.getAudioInputStream(
        new AudioFormat(8000f, 16, 1, true, false), ais)
      val buf = pcm.readAllBytes()
      assert(buf.length == 2 * 256, s"law $law frames")
      val theirs = Array.tabulate(256)(i =>
        ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt)
      assert(ours.toSeq == theirs.toSeq, s"law $law")
    }
  }

  test("G.711 parity: a javax.sound-written mu-law WAV decodes identically") {
    import javax.sound.sampled._
    // PCM16 source -> JDK μ-law transcode -> WAVE container; compare
    // OUR parse of that file against the JDK's own decode of the same
    // file (decoder-vs-decoder on the same bytes)
    val n = 300
    val pcmBytes = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val v = ((i * 211 + 17) % 32768 - 16384).toShort
      pcmBytes(2 * i) = (v & 0xff).toByte
      pcmBytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val srcFmt = new AudioFormat(8000f, 16, 1, true, false)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcmBytes), srcFmt, n.toLong)
    val ulaw = AudioSystem.getAudioInputStream(
      AudioFormat.Encoding.ULAW, src)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.WAVE, out)
    val file = out.toByteArray
    val ours = WavAudio.parse(file)
    assert(ours.format == 7 && ours.nFrames == n)
    val back = AudioSystem.getAudioInputStream(srcFmt,
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(file)))
    val buf = back.readAllBytes()
    val theirs = Array.tabulate(n)(i =>
      ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt)
    assert(ours.samples.toSeq == theirs.toSeq)
  }

  // ------------------------------------------------ IMA ADPCM (r18)

  /** Hand-assemble a mono IMA ADPCM container independent of the
    * encoder (the fixture-ladder rule: the decoder's oracle must not
    * share code with the writer under test). */
  private def imaContainer(spb: Int, blocks: Array[Byte]): Array[Byte] = {
    val blockAlign = 4 + (spb - 1) / 2
    val riffSize = 4 + (8 + 20) + (8 + blocks.length) + (blocks.length & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1).putInt(8000)
      .putInt(8000 * blockAlign / spb).putShort(blockAlign.toShort)
      .putShort(4).putShort(2).putShort(spb.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(blocks.length)
    out.put(blocks)
    if ((blocks.length & 1) == 1) out.put(0.toByte)
    out.array()
  }

  test("IMA ADPCM: hand-derived step-table fixture decodes exactly") {
    // pred=0 idx=0 (step 7); nibbles 2,12,7,0,1,8,15,4 walked by hand
    // through the public IMA tables:
    //  nib 2 : diff 0+3        -> s   3, idx 0-1 -> 0  (step 7)
    //  nib 12: diff 0+7, sign  -> s  -4, idx 0+2 -> 2  (step 9)
    //  nib 7 : diff 1+9+4+2=16 -> s  12, idx 2+8 -> 10 (step 19)
    //  nib 0 : diff 19>>3=2    -> s  14, idx 10-1-> 9  (step 17)
    //  nib 1 : diff 2+4=6      -> s  20, idx 9-1 -> 8  (step 16)
    //  nib 8 : diff 2, sign    -> s  18, idx 8-1 -> 7  (step 14)
    //  nib 15: diff 1+14+7+3=25, sign -> s -7, idx 7+8 -> 15 (step 31)
    //  nib 4 : diff 3+31=34    -> s  27, idx 15+2 -> 17
    val block = Array[Byte](0, 0, 0, 0,
      0xC2.toByte, 0x07, 0x81.toByte, 0x4F)
    val w = WavAudio.parse(imaContainer(9, block))
    assert(w.format == 17 && w.channels == 1 && w.nFrames == 9)
    assert(w.samples.toSeq == Seq(0, 3, -4, 12, 14, 20, 18, -7, 27))
  }

  test("IMA ADPCM: stereo blocks interleave 4-byte groups per channel") {
    // same nibble stream on both channels but different header
    // predictors: decoded channels must be the mono fixture shifted
    val hdr0 = Array[Byte](100, 0, 0, 0)
    val hdr1 = Array[Byte](-100.toByte, 0xFF.toByte, 0, 0) // int16 -100
    val nibs = Array[Byte](0xC2.toByte, 0x07, 0x81.toByte, 0x4F)
    val block = hdr0 ++ hdr1 ++ nibs ++ nibs
    val blockAlign = 16
    val riffSize = 4 + (8 + 20) + (8 + block.length)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(2).putInt(8000)
      .putInt(8000 * blockAlign / 9).putShort(blockAlign.toShort)
      .putShort(4).putShort(2).putShort(9)
    out.put("data".getBytes("US-ASCII")).putInt(block.length)
    out.put(block)
    val w = WavAudio.parse(out.array())
    assert(w.channels == 2 && w.nFrames == 9)
    val mono = Seq(0, 3, -4, 12, 14, 20, 18, -7, 27)
    val ch0 = (0 until 9).map(i => w.samples(2 * i))
    val ch1 = (0 until 9).map(i => w.samples(2 * i + 1))
    assert(ch0 == mono.map(_ + 100))
    assert(ch1 == mono.map(_ - 100))
  }

  test("IMA ADPCM: encoder-mirror round-trip and constant-block aperture") {
    val rnd = new scala.util.Random(1831)
    for (spb <- Seq(9, 17, 33); trial <- 0 until 5) {
      val n = spb * (1 + rnd.nextInt(4))
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val (bytes, recon) = WavAudio.encodeImaAdpcmMono(8000, samples, spb)
      val w = WavAudio.parse(bytes)
      // the mirror property: the decoder reproduces the encoder's
      // internal reconstruction EXACTLY (this is what makes a lossy
      // codec testable without an external oracle)
      assert(w.samples.toSeq == recon.toSeq, s"spb=$spb trial=$trial")
      // block-leading samples are carried verbatim in the headers
      for (b <- 0 until n / spb)
        assert(recon(b * spb) == samples(b * spb))
    }
    // the q173 aperture: constant blocks at initial index 0 are
    // drift-free because step 7 >> 3 == 0 and index can never rise
    val const = Array.fill(3 * 17)(-12345)
    val (bytes, recon) = WavAudio.encodeImaAdpcmMono(8000, const, 17)
    assert(recon.toSeq == const.toSeq)
    assert(WavAudio.parse(bytes).samples.toSeq == const.toSeq)
  }

  test("IMA ADPCM: strict gates reject by name") {
    val good = WavAudio.encodeImaAdpcmMono(8000,
      Array.fill(9)(5), 9)._1
    // step index > 88 in a block header
    val badIdx = good.clone()
    // data chunk starts after RIFF(12) + fmt(28) + fact(12) + hdr(8)
    val dOff = 12 + 28 + 12 + 8
    badIdx(dOff + 2) = 89.toByte
    val e1 = intercept[IllegalArgumentException](WavAudio.parse(badIdx))
    assert(e1.getMessage.contains("step index"))
    // nonzero header pad byte
    val badPad = good.clone(); badPad(dOff + 3) = 1
    val e2 = intercept[IllegalArgumentException](WavAudio.parse(badPad))
    assert(e2.getMessage.contains("pad byte"))
    // a 20-bit ADPCM width claim
    val badBits = good.clone(); badBits(34) = 20
    val e3 = intercept[IllegalArgumentException](WavAudio.parse(badBits))
    assert(e3.getMessage.contains("bit width"))
    // samples/block contradicting block align
    val badSpb = good.clone(); badSpb(38) = 11
    val e4 = intercept[IllegalArgumentException](WavAudio.parse(badSpb))
    assert(e4.getMessage.contains("samples/block"))
  }

  // ------------------------------------------------ MS ADPCM (r18)

  /** Hand-assemble a MS-ADPCM container independent of the encoder,
    * with the standard 7-pair coefficient table in the fmt chunk. */
  private def msContainer(ch: Int, blockAlign: Int, spb: Int,
      blocks: Array[Byte]): Array[Byte] = {
    val fmtSize = 16 + 2 + 2 + 2 + 28
    val riffSize = 4 + (8 + fmtSize) + (8 + blocks.length) +
      (blocks.length & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(fmtSize)
      .putShort(2).putShort(ch.toShort).putInt(8000)
      .putInt(8000 * blockAlign / spb).putShort(blockAlign.toShort)
      .putShort(4).putShort(32).putShort(spb.toShort).putShort(7)
    for ((a, c) <- Seq((256, 0), (512, -256), (0, 0), (192, 64),
      (240, 0), (460, -208), (392, -232)))
      out.putShort(a.toShort).putShort(c.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(blocks.length)
    out.put(blocks)
    if ((blocks.length & 1) == 1) out.put(0.toByte)
    out.array()
  }

  test("MS ADPCM: hand-derived coefficient-table fixture decodes exactly") {
    // predictor 1 (512,-256), delta 16, s1=100, s2=50; nibbles
    // 3, 12(-4), 7, 8(-8) walked by hand:
    //  3: pred (100*512-50*256)/256 = 150, +3*16  -> 198, delta 16
    // 12: pred (198*512-100*256)/256 = 296, -4*16 -> 232, delta 19
    //  7: pred (232*512-198*256)/256 = 266, +7*19 -> 399, delta 45
    //  8: pred (399*512-232*256)/256 = 566, -8*45 -> 206
    val block = Array[Byte](1, 16, 0, 100, 0, 50, 0, 0x3C, 0x78)
    val w = WavAudio.parse(msContainer(1, 9, 6, block))
    assert(w.format == 2 && w.channels == 1 && w.nFrames == 6)
    assert(w.samples.toSeq == Seq(50, 100, 198, 232, 399, 206))
  }

  test("MS ADPCM: stereo headers group by field, nibbles alternate channels") {
    // both channels predictor 1, delta 16; ch0 s1=100 s2=50 (the mono
    // fixture), ch1 s1=200 s2=-50 (hand walk: 450+48=498, 796-64=732,
    // 966+133=1099, 1466-360=1106); interleaved nibbles 0x33 0xCC
    // 0x77 0x88
    val block = Array[Byte](1, 1, 16, 0, 16, 0,
      100, 0, (200 & 0xff).toByte, 0,
      50, 0, (-50).toByte, 0xFF.toByte,
      0x33, 0xCC.toByte, 0x77, 0x88.toByte)
    val w = WavAudio.parse(msContainer(2, 18, 6, block))
    assert(w.channels == 2 && w.nFrames == 6)
    val ch0 = (0 until 6).map(i => w.samples(2 * i))
    val ch1 = (0 until 6).map(i => w.samples(2 * i + 1))
    assert(ch0 == Seq(50, 100, 198, 232, 399, 206))
    assert(ch1 == Seq(-50, 200, 498, 732, 1099, 1106))
  }

  test("MS ADPCM: encoder-mirror round-trip and constant-block aperture") {
    val rnd = new scala.util.Random(1861)
    for (spb <- Seq(4, 8, 14); trial <- 0 until 5) {
      val n = spb * (1 + rnd.nextInt(4))
      val samples = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val (bytes, recon) = WavAudio.encodeMsAdpcmMono(8000, samples, spb)
      val w = WavAudio.parse(bytes)
      assert(w.samples.toSeq == recon.toSeq, s"spb=$spb trial=$trial")
      // block-leading pairs are carried verbatim in the headers
      for (b <- 0 until n / spb) {
        assert(recon(b * spb) == samples(b * spb))
        assert(recon(b * spb + 1) == samples(b * spb + 1))
      }
    }
    // the q174 aperture: constant blocks encode exactly (predictor 0
    // reproduces them with all-zero codes)
    val const = Array.fill(3 * 10)(23456)
    val (bytes, recon) = WavAudio.encodeMsAdpcmMono(8000, const, 10)
    assert(recon.toSeq == const.toSeq)
    assert(WavAudio.parse(bytes).samples.toSeq == const.toSeq)
  }

  test("MS ADPCM: strict gates reject by name") {
    val good = WavAudio.encodeMsAdpcmMono(8000, Array.fill(8)(7), 8)._1
    // data starts after RIFF(12) + fmt(8+50) + fact(12) + data hdr(8)
    val dOff = 12 + 58 + 12 + 8
    // predictor index outside the coefficient table
    val badP = good.clone(); badP(dOff) = 9
    val e1 = intercept[IllegalArgumentException](WavAudio.parse(badP))
    assert(e1.getMessage.contains("predictor index"))
    // non-positive initial delta
    val badD = good.clone(); badD(dOff + 1) = 0; badD(dOff + 2) = 0
    val e2 = intercept[IllegalArgumentException](WavAudio.parse(badD))
    assert(e2.getMessage.contains("delta"))
    // samples/block contradicting block align
    val badSpb = good.clone(); badSpb(38) = 99
    val e3 = intercept[IllegalArgumentException](WavAudio.parse(badSpb))
    assert(e3.getMessage.contains("samples/block"))
    // a 20-bit width claim
    val badBits = good.clone(); badBits(34) = 20
    val e4 = intercept[IllegalArgumentException](WavAudio.parse(badBits))
    assert(e4.getMessage.contains("bit width"))
  }
}
