package graft

import graft.operators.Bpe

/** BPE merge training (q95) — pins the greedy-merge semantics the
  * cross-engine oracle relies on: weighted argmax with deterministic
  * tie-break, exact left-to-right merge application (the leading-
  * separator encoding), and early stop when the vocab runs dry. */
class BpeSpec extends SparkSuite {

  private def words(ws: String*) = {
    import spark.implicits._
    ws.toDF("w")
  }

  test("classic corpus: merge order and weighted counts by hand") {
    // Sennrich's running example shape: low×2, lower×1, newest×3.
    // Hand derivation: iter1 best = (w,e,4); after merging, six pairs
    // tie at 3 and the (left ASC, right ASC) break picks (e,we); then
    // ('ewe','s') wins the next tie the same way.
    val corpus = Seq.fill(2)("low") ++ Seq("lower") ++ Seq.fill(3)("newest")
    val m = Bpe.trainMerges(words(corpus: _*), 3)
    assert(m == Seq((1, "w", "e", 4L), (2, "e", "we", 3L), (3, "ewe", "s", 3L)))
  }

  test("consecutive occurrences merge greedily left-to-right") {
    // 'xyxyxy': (x,y) appears 3 times -> after the merge the word must
    // be exactly [xy, xy, xy] (every occurrence merged — the case the
    // leading-separator encoding exists for: with a SURROUNDING
    // separator, replace would skip every second occurrence). Then
    // (xy,xy) merges greedily from the left: [xyxy, xy], not [xy, xyxy].
    val m = Bpe.trainMerges(words("xyxyxy"), 3)
    assert(m == Seq((1, "x", "y", 3L), (2, "xy", "xy", 2L),
      (3, "xyxy", "xy", 1L)))
  }

  test("single-char words contribute no pairs; training stops when dry") {
    // 'a' has no adjacent pairs; after (b,c) merges there is nothing
    // left to merge, so asking for 3 iterations yields 1 row.
    val m = Bpe.trainMerges(words("a", "a", "bc", "bc"), 3)
    assert(m == Seq((1, "b", "c", 2L)))
  }

  test("tokens with quotes and backslashes merge safely (bound as values)") {
    // "don't" ×3: the four pairs tie at 3; (left ASC, right ASC) picks
    // ("'", t) first (ASCII 39 < letters), then (d, o), then (do, n).
    // Before the column-form replace fix, the apostrophe broke the
    // interpolated expr() SQL outright.
    val m = Bpe.trainMerges(words("don't", "don't", "don't"), 3)
    assert(m == Seq((1, "'", "t", 3L), (2, "d", "o", 3L), (3, "do", "n", 3L)))
    // backslit token: '\' (92) < 'a' (97) so ("\\", b) merges first,
    // then (a, "\\b") completes the word and training runs dry.
    val b = Bpe.trainMerges(words("a\\b", "a\\b"), 3)
    assert(b == Seq((1, "\\", "b", 2L), (2, "a", "\\b", 2L)))
  }

  test("tokens containing newlines and the old '~' separator are safe") {
    // a word carrying an embedded newline must char-split fully (dotall
    // regex); '~' is an ordinary symbol now that the separator is 
    val m = Bpe.trainMerges(words("x\ny", "x\ny", "p~q"), 2)
    assert(m.head == ((1, "\n", "y", 2L)))
    assert(m(1) == ((2, "x", "\ny", 2L)))
  }

  test("q99 encode: canonical vocab ids and greedy token counts by hand") {
    // corpus 'abab' ×2, 'ab' ×1, 'cc' ×1: merge1 = (a,b) weight 5,
    // merge2 = (ab,ab) weight 2, merge3 = (c,c) weight 1. Alphabet
    // sorted = [a,b,c] -> ids 0,1,2; merge products ab=3, abab=4, cc=5.
    // Encoded corpus: abab×2 -> [abab]×2, ab -> [ab], cc -> [cc].
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_enc").toString
    Seq((1L, "abab abab ab cc"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Bpe.q99BpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // counts: abab 2, ab 1, cc 1; order (count desc, token asc)
    assert(rows == Seq((4L, "abab", 2L), (3L, "ab", 1L), (5L, "cc", 1L)))
  }

  test("q95 shape: three deterministic merges over the fixture corpus") {
    val rows = graft.operators.Bpe.q95BpeMerges(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // merged symbols grow: step-2/3 operands may be multi-char
    assert(rows.forall(_.getLong(3) > 0))
  }

  test("q122 fertility: hand-derived totals on the Sennrich corpus") {
    // merges on low×2, lower×1, newest×3 are (w,e), (e,we), (ewe,s)
    // (pinned by the first test). Encoded: low -> [l,o,w] (3 tok),
    // lower -> [l,o,we,r] (4), newest -> [n,ewes,t] (3).
    // en totals: 6 words, 2·3+4+3·3 = 19 tokens, 2·3+5+3·6 = 29 chars.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_fert").toString
    val text = "low low lower newest newest newest"
    Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Bpe.q122TokenizerFertility(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "en")
    assert(r.getAs[Long]("n_words") == 6L, r.toString)
    assert(r.getAs[Long]("n_tokens") == 19L, r.toString)
    assert(r.getAs[Double]("fertility") == 3.166667, r.toString)
    assert(r.getAs[Double]("chars_per_token") == 1.526316, r.toString)
  }

  test("q122 fertility invariants on the fixture corpus") {
    val rows = graft.operators.Bpe
      .q122TokenizerFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))
      // every (non-empty) word is at least one token, every token at
      // least one char — fertility ≥ 1 and chars_per_token ≥ 1
      assert(t >= w, r.toString)
      assert(r.getAs[Double]("fertility") >= 1.0, r.toString)
      assert(r.getAs[Double]("chars_per_token") >= 1.0, r.toString)
    }
  }
}
