package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame

/** Incrementally-maintained ANIMATION near-dup index — q166's
  * streaming twin: a re-encoded animated meme arriving on the stream
  * is paired with every earlier re-encode without ever re-decoding the
  * corpus. All mechanics live in the shared [[FrameSetIndex]] kernel
  * (round 18 extracted it when [[DocIndexStream]] became the second
  * multi-row instantiation); hashing is [[Multimodal.animHashFrame]]
  * (decode + GIF89a compositing + per-frame aHash), scoring
  * [[Multimodal.animScore]], presentation
  * [[Multimodal.animPresentation]] — the same one-copy kernels batch
  * q166 runs, so stream ≡ batch by construction (AnimIndexStreamSpec
  * pins it over sharded replays where every canon's re-encodes are
  * split across triggers). */
object AnimIndexStream extends FrameSetIndex {
  protected def hashFrame(docs: DataFrame): DataFrame =
    Multimodal.animHashFrame(docs)
  protected def bands(fh: DataFrame): DataFrame = Multimodal.animBands(fh)
  protected def score(candKeys: DataFrame, allFh: DataFrame): DataFrame =
    Multimodal.animScore(candKeys, allFh)
  protected def present(pairs: DataFrame): DataFrame =
    Multimodal.animPresentation(pairs)
}

/** Incrementally-maintained SCANNED-DOCUMENT near-dup index — q171's
  * streaming twin and the second instantiation of the multi-row
  * [[FrameSetIndex]] kernel: a re-scanned/re-encoded multi-page
  * document (different byte order, per-page compression, strip/tile
  * layout, stored orientation) arriving on the stream is paired with
  * every earlier re-encode of the same document through the
  * accumulated full-hash page-set index. Hashing is
  * [[Multimodal.docHashFrame]] (multi-page TIFF chain walk + per-page
  * upright aHash), scoring/presentation the shared frame-set kernels —
  * batch q171's exact pipeline, so stream ≡ batch by construction
  * (DocIndexStreamSpec pins it over sharded replays). */
object DocIndexStream extends FrameSetIndex {
  protected def hashFrame(docs: DataFrame): DataFrame =
    Multimodal.docHashFrame(docs)
  protected def bands(fh: DataFrame): DataFrame = Multimodal.animBands(fh)
  protected def score(candKeys: DataFrame, allFh: DataFrame): DataFrame =
    Multimodal.animScore(candKeys, allFh)
  protected def present(pairs: DataFrame): DataFrame =
    Multimodal.animPresentation(pairs)
}

/** Incrementally-maintained SCANNED-PDF near-dup index — q176's
  * streaming twin and the third instantiation of the multi-row
  * [[FrameSetIndex]] kernel: a re-scanned PDF (different image-XObject
  * filter — DCT vs CCITT vs Flate — array vs name filter form,
  * BlackIs1 convention) arriving on the stream is paired with every
  * earlier re-encode through the accumulated full-hash page-set index.
  * Hashing is [[Multimodal.pdfHashFrame]] (PDF object walk +
  * per-filter decode + per-page aHash), scoring/presentation the
  * shared frame-set kernels — batch q176's exact pipeline, so
  * stream ≡ batch by construction (PdfIndexStreamSpec pins it over
  * sharded replays). */
object PdfIndexStream extends FrameSetIndex {
  protected def hashFrame(docs: DataFrame): DataFrame =
    Multimodal.pdfHashFrame(docs)
  protected def bands(fh: DataFrame): DataFrame = Multimodal.animBands(fh)
  protected def score(candKeys: DataFrame, allFh: DataFrame): DataFrame =
    Multimodal.animScore(candKeys, allFh)
  protected def present(pairs: DataFrame): DataFrame =
    Multimodal.animPresentation(pairs)
}

/** Incrementally-maintained AUDIO near-dup index — q177's streaming
  * twin and the fourth instantiation of the multi-row [[FrameSetIndex]]
  * kernel: a re-encoded recording (PCM16 / G.711 mu/A-law / IMA / MS
  * ADPCM, any sample-rate tag) arriving on the stream is paired with
  * every earlier re-encode through the accumulated full-hash
  * window-set index. Hashing is [[Multimodal.audioHashFrame]] (WAV
  * decode + fixed-window splitmix fold), scoring/presentation the
  * shared frame-set kernels — batch q177's exact pipeline, so
  * stream ≡ batch by construction (PcmIndexStreamSpec pins it over
  * sharded replays). */
object PcmIndexStream extends FrameSetIndex {
  protected def hashFrame(docs: DataFrame): DataFrame =
    Multimodal.audioHashFrame(docs)
  protected def bands(fh: DataFrame): DataFrame = Multimodal.animBands(fh)
  protected def score(candKeys: DataFrame, allFh: DataFrame): DataFrame =
    Multimodal.animScore(candKeys, allFh)
  protected def present(pairs: DataFrame): DataFrame =
    Multimodal.animPresentation(pairs)
}
