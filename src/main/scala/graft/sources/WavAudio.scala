package graft.sources

/** Pure-JVM WAV (RIFF/WAVE) audio codec — the audio analog of
  * [[PdfText]]: the multimodal family's decode step implemented for
  * real where the environment allows it (PCM needs no external codec
  * library; image/video stay behind the documented stub). Implements
  * the public RIFF container format: chunk walk (`fmt ` + `data`,
  * unknown chunks skipped by their declared size, word-aligned), PCM
  * integer samples — 16-bit signed little-endian, 8-bit unsigned and
  * 24-bit signed (round 16) — plus IEEE-float samples (format tag 3,
  * 32-bit, round 16: the two largest formerly-quarantined real-corpus
  * classes) and the G.711 companded formats (tags 6 A-law / 7 μ-law,
  * round 17: closed-form 8-bit integer expansion — the telephony
  * corpus formats), with strict validation (truncated container, missing
  * chunks, unsupported format tags and widths, non-finite float
  * samples all throw with the offending field named, never return
  * garbage samples).
  *
  * Scale shape: decode is per-row imperative byte work inside the
  * task — the one place a UDF is the right tool (there is no builtin
  * to prefer; the PdfText ladder) — and media bytes never shuffle.
  */
object WavAudio {

  /** Decoded audio: interleaved samples, one Int per sample per
    * channel. For the integer formats (tag 1: 8/16/24-bit) these are
    * sign-normalized sample VALUES (8-bit input re-centered to
    * signed). For IEEE float (tag 3, bits = 32) each Int holds the
    * sample's RAW FLOAT BITS — exactness-preserving in the same array
    * shape — and [[Wav.floatSample]] is the typed accessor. For the
    * G.711 companded formats (tag 6 A-law, tag 7 μ-law — round 17)
    * each Int holds the EXPANDED linear value (13/14-bit range): the
    * expansion is an exact integer table, so downstream stats are
    * oracle-replayable from the code bytes. */
  final case class Wav(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Int], format: Int = 1) {
    def nFrames: Int = samples.length / math.max(channels, 1)
    /** Sample as float (format tag 3 only). */
    def floatSample(i: Int): Float = {
      require(format == 3, s"floatSample on format-$format audio")
      java.lang.Float.intBitsToFloat(samples(i))
    }
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse a RIFF/WAVE byte array. Throws IllegalArgumentException on
    * malformed input — a corrupt media file must surface as a row
    * error, not as silently wrong features. */
  def parse(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", s"bad magic '${tag(bytes, 0)}'")
    require(tag(bytes, 8) == "WAVE", s"bad form type '${tag(bytes, 8)}'")
    // honor the DECLARED RIFF size (review find): the chunk walk stops
    // at the RIFF boundary, so spec-legal trailing data (tagger junk
    // appended past the container) is ignored instead of misparsed as a
    // chunk header, and a declared size overrunning the file is the
    // named error it claims to be
    val riffSize = u32(bytes, 4)
    require(riffSize >= 4 && 8 + riffSize <= bytes.length,
      s"declared RIFF size $riffSize vs file ${bytes.length} bytes")
    val end = (8 + riffSize).toInt
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= end) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= end,
        s"chunk '$id' size $size overruns the RIFF chunk ($end bytes)")
      id match {
        case "fmt " =>
          // duplicate chunks are rejected, not last-win: two fmt
          // chunks mean the container is ambiguous about its own
          // sample layout, and silently honoring the later one would
          // decode the data against a format the first header
          // contradicts (advisor r12 find)
          require(fmt.isEmpty, "duplicate fmt chunk")
          require(size >= 16, s"fmt chunk too small: $size")
          fmt = Some((u16(bytes, off + 8), u16(bytes, off + 10),
            u32(bytes, off + 12).toInt, u16(bytes, off + 22)))
        case "data" =>
          require(data.isEmpty, "duplicate data chunk")
          data = Some((off + 8, size.toInt))
        case _ => // LIST/fact/cue/…: skip by declared size
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    val (format, ch, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("missing fmt chunk"))
    val (dOff, dSize) = data.getOrElse(
      throw new IllegalArgumentException("missing data chunk"))
    require(format == 1 || format == 3 || format == 6 || format == 7,
      s"unsupported format tag $format " +
        "(only 1=PCM, 3=IEEE float, 6=A-law, 7=mu-law)")
    require(ch >= 1, s"bad channel count $ch")
    require(rate > 0, s"bad sample rate $rate")
    // data size must be FRAME-aligned (bits/8 × channels), not merely
    // sample-aligned: a truncated stereo PCM16 file with dSize % 4 == 2
    // passed the old % 2 check and decoded silently with a partial
    // trailing frame that nFrames floored away — at odds with the
    // strict-validation posture (advisor r12 find)
    def frameAligned(what: String): Unit = {
      val frameBytes = (bits / 8) * ch
      require(dSize % frameBytes == 0,
        s"data chunk size $dSize not a multiple of the $what " +
          s"frame size $frameBytes ($ch channel(s) × ${bits / 8} bytes)")
    }
    val samples = (format, bits) match {
      case (1, 16) =>
        frameAligned("PCM16")
        Array.tabulate(dSize / 2) { i =>
          u16(bytes, dOff + 2 * i).toShort.toInt
        }
      case (1, 8) =>
        frameAligned("PCM8")
        Array.tabulate(dSize)(i => (bytes(dOff + i) & 0xff) - 128)
      case (1, 24) =>
        frameAligned("PCM24")
        Array.tabulate(dSize / 3) { i =>
          val o = dOff + 3 * i
          val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
            ((bytes(o + 2) & 0xff) << 16)
          (v << 8) >> 8 // sign-extend from 24 bits
        }
      case (3, 32) =>
        frameAligned("FLOAT32")
        Array.tabulate(dSize / 4) { i =>
          val v = u32(bytes, dOff + 4 * i).toInt
          // a NaN/Inf sample is never legitimate audio; at corpus
          // scale it silently poisons every downstream aggregate —
          // strict-reject like every other garbage-sample path
          require(java.lang.Float.isFinite(
            java.lang.Float.intBitsToFloat(v)),
            s"non-finite float sample at frame ${i / ch}")
          v // raw float bits (see Wav doc)
        }
      case (3, w) =>
        throw new IllegalArgumentException(
          s"IEEE-float format (tag 3) with bit width $w (must be 32)")
      case (6, 8) =>
        frameAligned("ALAW")
        Array.tabulate(dSize)(i => alawExpand(bytes(dOff + i) & 0xff))
      case (7, 8) =>
        frameAligned("ULAW")
        Array.tabulate(dSize)(i => ulawExpand(bytes(dOff + i) & 0xff))
      case (6 | 7, w) =>
        throw new IllegalArgumentException(
          s"G.711 format (tag $format) with bit width $w (must be 8)")
      case (_, w) =>
        throw new IllegalArgumentException(s"unsupported bit width $w")
    }
    Wav(rate, ch, bits, samples, format)
  }

  // -------------------------------------------------- G.711 companding

  /** μ-law code byte → linear value (ITU-T G.711, exact integer form:
    * magnitude = ((mantissa·8 + 132) << exponent) − 132, sign from the
    * inverted code's top bit). Codes 0x7f and 0xff both expand to 0 —
    * μ-law's positive and negative zero. */
  private[graft] def ulawExpand(code: Int): Int = {
    val u = ~code & 0xff
    val e = (u >> 4) & 7
    val m = u & 0x0f
    val mag = (((m << 3) + 0x84) << e) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** A-law code byte → linear value (ITU-T G.711: even bits inverted
    * by the 0x55 mask, 7 chord segments, minimum magnitude 8 — A-law
    * has no zero sample). Sign bit SET means positive. */
  private[graft] def alawExpand(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a >> 4) & 7
    val m = a & 0x0f
    val mag = seg match {
      case 0 => (m << 4) + 8
      case 1 => (m << 4) + 0x108
      case s => ((m << 4) + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) mag else -mag
  }

  /** Linear → μ-law code byte (BIAS 0x84, clip 32635). Pinned by the
    * identity compress(expand(c)) == c over every code except 0x7f
    * (negative zero folds onto 0xff) in WavAudioSpec. */
  private[graft] def ulawCompress(pcm: Int): Int = {
    var s = pcm
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var e = 7
    while (e > 0 && (s & (0x80 << e)) == 0) e -= 1
    val m = (s >> (e + 3)) & 0x0f
    ~(sign | (e << 4) | m) & 0xff
  }

  /** Linear → A-law code byte. Identity-pinned over all 256 codes. */
  private[graft] def alawCompress(pcm: Int): Int = {
    var s = pcm
    val sign = if (s >= 0) 0x80 else { s = -s; 0 }
    if (s > 32767) s = 32767
    val (seg, m) =
      if (s < 256) (0, s >> 4)
      else {
        var sg = 1
        var t = s
        while (t >= 512 && sg < 7) { t >>= 1; sg += 1 }
        (sg, (t - 256) >> 4)
      }
    (sign | (seg << 4) | m) ^ 0x55
  }

  /** Encode mono PCM16 — the writer half (test vectors, fixture
    * synthesis, and the binary-sink path). Emits a junk LIST chunk
    * before `data` so every parse exercises the skip-unknown-chunks
    * path. */
  def encodePcm16Mono(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 2
    val listPayload = "graf".getBytes("US-ASCII")
    val riffSize = 4 + (8 + 16) + (8 + listPayload.length) + (8 + dataSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    out.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
      .put(listPayload)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach { s =>
      require(s >= Short.MinValue && s <= Short.MaxValue, s"sample $s")
      out.putShort(s.toShort)
    }
    out.array()
  }

  /** Encode mono 24-bit PCM — the writer half for the PCM24 decode
    * path (samples in ±2²³). Same junk-LIST discipline. */
  def encodePcm24Mono(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = samples.length * 3
    val listPayload = "graf".getBytes("US-ASCII")
    val riffSize = 4 + (8 + 16) + (8 + listPayload.length) +
      (8 + dataSize) + (dataSize & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 3).putShort(3).putShort(24)
    out.put("LIST".getBytes("US-ASCII")).putInt(listPayload.length)
      .put(listPayload)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach { s =>
      require(s >= -(1 << 23) && s < (1 << 23), s"24-bit sample $s")
      out.put((s & 0xff).toByte).put(((s >> 8) & 0xff).toByte)
        .put(((s >> 16) & 0xff).toByte)
    }
    if ((dataSize & 1) == 1) out.put(0.toByte) // word-align the chunk
    out.array()
  }

  /** Encode mono IEEE-float WAV (format tag 3) — the writer half for
    * the float decode path. Emits the `fact` chunk the non-PCM formats
    * carry (frame count) and an 18-byte fmt (cbSize = 0), both shapes
    * real float writers emit, so every parse exercises them. */
  def encodeFloat32Mono(sampleRate: Int, samples: Array[Float]):
      Array[Byte] = {
    val dataSize = samples.length * 4
    val riffSize = 4 + (8 + 18) + (8 + 4) + (8 + dataSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(3).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 4).putShort(4).putShort(32)
      .putShort(0) // cbSize
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach { s =>
      require(java.lang.Float.isFinite(s), s"non-finite sample $s")
      out.putFloat(s)
    }
    out.array()
  }

  /** Encode a mono G.711 stream from raw CODE bytes (`law` 6 = A-law,
    * 7 = μ-law) — the writer half for the companded decode paths. Same
    * non-PCM container shape as the float writer (18-byte fmt with
    * cbSize 0 + a fact chunk), byte rate = sample rate (one code byte
    * per frame), word-aligned data chunk. */
  def encodeG711Mono(law: Int, sampleRate: Int,
      codes: Array[Int]): Array[Byte] = {
    require(law == 6 || law == 7, s"law $law (6=A-law, 7=mu-law)")
    val dataSize = codes.length
    val riffSize = 4 + (8 + 18) + (8 + 4) + (8 + dataSize) + (dataSize & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(law.toShort).putShort(1).putInt(sampleRate)
      .putInt(sampleRate).putShort(1).putShort(8)
      .putShort(0) // cbSize
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(codes.length)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    codes.foreach { c =>
      require(c >= 0 && c <= 255, s"code byte $c")
      out.put(c.toByte)
    }
    if ((dataSize & 1) == 1) out.put(0.toByte) // word-align the chunk
    out.array()
  }
}
