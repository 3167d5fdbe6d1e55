package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed BPE tokenizer training (Sennrich et al., arXiv:1508.07909
  * — the subword vocabulary algorithm behind GPT-2/LLaMA tokenizers).
  * A training-data engine that tokenizes 100 TB needs the MERGE TABLE
  * first, and producing it is a corpus-scale aggregation problem.
  *
  * Scale shape — the classic two-tier trick that makes BPE training
  * tractable at corpus scale:
  *   1. ONE pass over the corpus builds the weighted word-frequency
  *      vocabulary (map-side-combined groupBy; output is vocab-sized,
  *      i.e. millions of rows at web scale, independent of corpus TB).
  *   2. Every merge iteration then runs on the VOCAB table only:
  *      adjacent-pair counts weighted by word frequency, global argmax,
  *      replace. Cost per iteration is O(|vocab| · word_len) — the
  *      corpus is never rescanned. The vocab table is cached; the
  *      per-iteration global top-1 is a single tiny collect (the
  *      "model state on the driver" pattern shared with q86 k-means).
  *
  * Cross-engine determinism: the symbol sequence is encoded with a
  * LEADING separator per token (`fast`), so a
  * merge is a plain `replace(seq, SEP+l+SEP+r, SEP+l+r)`. With a
  * leading (not surrounding) separator, consecutive occurrences share
  * no boundary character, so the left-to-right non-rescanning scan of
  * `replace` — identical in Spark (Java) and DuckDB — IS exact greedy
  * BPE application. Argmax ties break on (count DESC, left ASC,
  * right ASC). The separator is the non-printable  (corpus text
  * cannot plausibly contain it, unlike the previous '~'), the
  * char-splitting regex is dotall on both engines (words carrying
  * embedded newlines encode correctly), and the per-iteration merge is
  * applied with the COLUMN form of replace — merge tokens are bound as
  * values, never interpolated into SQL text, so apostrophes and
  * backslashes in real corpora cannot alter parsing or semantics.
  */
object Bpe {

  private val Sep = ""
  private val Iters = 3
  // lineage cut cadence: each merge layers one withColumn on the vocab;
  // unchecked, iteration k re-applies all k-1 earlier replaces from the
  // cached base (quadratic work, and eventually an analyzer stack
  // overflow). A localCheckpoint every few merges keeps per-iteration
  // cost flat for realistic merge-table sizes (10k+).
  private val CheckpointEvery = 8

  /** q95 — three BPE merge-training iterations over the `documents`
    * corpus: emits (step, merge_left, merge_right, pair_count) — the
    * head of the merge table a tokenizer trained on this corpus would
    * ship. Pair extraction guards single-char words (no pairs) and the
    * argmax is fully deterministic, so the result hash-matches the
    * DuckDB replay of the same derivation. */
  /** Core trainer: `words` is a one-column DataFrame of raw word
    * occurrences (duplicates = weight). Returns up to `iters` merges as
    * (step, left, right, weighted pair count); stops early if the vocab
    * runs out of adjacent pairs. */
  def trainMerges(words: DataFrame, iters: Int = Iters)
      : Seq[(Int, String, String, Long)] = {
    val s = words.sparkSession
    import s.implicits._
    // tier 1: the only corpus-scale pass — word -> weighted count
    val wc = words.toDF("w")
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace($"w", "(?s)(.)", s"$Sep$$1").as("seq"), $"cnt")
      .cache()
    wc.count() // materialize once; iterations reuse the cached vocab

    var vocab = wc
    // release handle for the checkpointed frame currently backing `vocab`
    // (no-op until the first checkpoint); superseded frames are freed as
    // soon as their successor is materialized — see Checkpoints doc
    var freeVocab: () => Unit = () => ()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    // released in the finally: nothing distributed outlives this call —
    // only the driver-side merge list leaves it (exception included;
    // review find on exception-path checkpoint leaks)
    try {
    while (step <= iters && !exhausted) {
      // tier 2: pair counts over the vocab only. split('~f~a~s~t') =
      // ['', f, a, s, t]; with Spark's 0-based a[j], pairs are
      // (a[j], a[j+1]) for j in 1..size-2. sequence() would DESCEND
      // when size-2 < 1, so single-char words are filtered out first.
      val best = vocab
        .withColumn("a", split($"seq", Sep))
        .filter(size($"a") >= 3)
        .select(explode(expr(
          "transform(sequence(1, size(a)-2), j -> struct(a[j] AS l, a[j+1] AS r))"))
          .as("p"), $"cnt")
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"cnt").as("pc"))
        .orderBy($"pc".desc, $"l".asc, $"r".asc)
        .limit(1).collect().headOption
      best match {
        case Some(row) =>
          val (l, r, pc) = (row.getString(0), row.getString(1), row.getLong(2))
          // column-form replace: l/r are corpus-derived strings — bound
          // as VALUES (never spliced into SQL text), so quotes and
          // backslashes in tokens cannot break parsing or semantics
          vocab = vocab.withColumn("seq",
            replace($"seq", lit(s"$Sep$l$Sep$r"), lit(s"$Sep$l$r")))
          if (step % CheckpointEvery == 0) {
            val (ck, free) = graft.tools.Checkpoints.tracked(vocab)
            freeVocab() // superseded once the new frame is materialized
            vocab = ck
            freeVocab = free
          }
          merges += ((step, l, r, pc))
          step += 1
        case None => exhausted = true // no adjacent pairs left anywhere
      }
    }
    } finally { wc.unpersist(); freeVocab() }
    merges.result()
  }

  def q95BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
    trainMerges(words, Iters)
      .toDF("step", "merge_left", "merge_right", "pair_count")
      .orderBy($"step")
  }

  /** DuckDB replay of the training derivation, three iterations
    * unrolled, shared by the q95 and q99 oracles. string_split 1-based:
    * s[1]='' and pairs are (s[j], s[j+1]) for j in 2..len-1
    * (generate_series yields an empty list when the range is inverted,
    * so single-char words vanish for free). */
  private val TrainCte: String = {
    def iter(i: Int): String =
      s"""p$i AS (SELECT s[j] AS l, s[j + 1] AS r, CAST(sum(c) AS BIGINT) AS pc
        |       FROM (SELECT string_split(seq, '$Sep') AS s, c FROM v${i - 1}) t,
        |            LATERAL (SELECT unnest(generate_series(2, len(t.s) - 1)) AS j) u
        |       GROUP BY 1, 2),
        |b$i AS (SELECT l, r, pc FROM p$i ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
        |v$i AS (SELECT replace(seq, '$Sep' || l || '$Sep' || r, '$Sep' || l || r) AS seq, c
        |       FROM v${i - 1}, b$i)""".stripMargin
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |wc AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
      |v0 AS (SELECT regexp_replace(w, '(.)', '$Sep\\1', 'gs') AS seq, c FROM wc),
      |${iter(1)},
      |${iter(2)},
      |${iter(3)}""".stripMargin
  }

  val q95Oracle: String =
    s"""$TrainCte
      |SELECT step, merge_left, merge_right, pair_count FROM (
      |  SELECT 1 AS step, l AS merge_left, r AS merge_right, pc AS pair_count FROM b1
      |  UNION ALL SELECT 2, l, r, pc FROM b2
      |  UNION ALL SELECT 3, l, r, pc FROM b3)
      |ORDER BY step""".stripMargin

  // ----------------------------------------------------------- encoding

  /** q99 — BPE ENCODING, the other half of the tokenizer pipeline: apply
    * the trained merge table to the corpus and emit the top-30 tokens by
    * weighted occurrence as (token_id, token, token_count).
    *
    * Scale shape mirrors training: the corpus-scale pass is the weighted
    * word-vocabulary groupBy; every distinct word is then encoded ONCE
    * (its count is the weight), by folding the ordered merge list —
    * broadcast-sized driver state, 10k-100k entries for a real
    * tokenizer, 3 here — over the leading-separator symbol sequence with
    * the same column-form `replace` used in training. Left-to-right
    * non-rescanning `replace` in merge order IS deterministic greedy BPE
    * application, and is engine-identical, so DuckDB replays it exactly.
    *
    * Token ids follow the canonical BPE vocab layout: the corpus
    * alphabet sorted by codepoint gets ids 0..k-1, then each merge
    * product takes id k+step-1 in training order (duplicate product
    * strings keep their first id). The alphabet is collected to the
    * driver — bounded by construction (distinct codepoints in the
    * corpus, ≤ a few thousand at any scale; the q86-centroid pattern) —
    * and sorted by codepoint sequence, which equals DuckDB's binary
    * collation order, not UTF-16 code-unit order. The final top-30 is a
    * TakeOrdered reduction (no window); the cached vocab is released
    * after the bounded result materializes (q94's pattern). */
  def q99BpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("w"))
    val merges = trainMerges(words, Iters)
    val wc = words.groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace($"w", "(?s)(.)", s"$Sep$$1").as("seq"), $"cnt")
      .cache()
    // the corpus alphabet, driver-side (bounded by construction)
    val chars = wc.select(explode(split($"seq", Sep)).as("c"))
      .filter($"c" =!= "").distinct().as[String].collect()
      .sortBy(c => c.codePoints().toArray.toSeq)(
        math.Ordering.Implicits.seqOrdering[Seq, Int])
    val vocab = (chars.zipWithIndex.map { case (c, i) => (c, i.toLong) } ++
      merges.map { case (step, l, r, _) => (l + r, chars.length + step - 1L) })
      .toSeq.toDF("token", "tid")
      .groupBy($"token").agg(min($"tid").as("token_id"))
    val encodedSeq = merges.foldLeft($"seq": org.apache.spark.sql.Column) {
      case (c, (_, l, r, _)) =>
        replace(c, lit(s"$Sep$l$Sep$r"), lit(s"$Sep$l$r"))
    }
    val out = wc.select(explode(split(encodedSeq, Sep)).as("token"), $"cnt")
      .filter($"token" =!= "")
      .groupBy($"token").agg(sum($"cnt").cast("long").as("token_count"))
      .join(broadcast(vocab), Seq("token"))
      .select($"token_id", $"token", $"token_count")
      .orderBy($"token_count".desc, $"token".asc)
      .limit(30)
    val rows = out.collect() // bounded: 30 rows
    wc.unpersist()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  val q99Oracle: String =
    s"""$TrainCte,
      |chars AS (SELECT DISTINCT c FROM (
      |    SELECT unnest(string_split(seq, '$Sep')) AS c FROM v0) t WHERE c <> ''),
      |charids AS (SELECT c AS token,
      |    CAST(row_number() OVER (ORDER BY c) - 1 AS BIGINT) AS tid FROM chars),
      |mergeids AS (SELECT l || r AS token,
      |    CAST((SELECT count(*) FROM chars) + step - 1 AS BIGINT) AS tid FROM (
      |      SELECT 1 AS step, l, r FROM b1
      |      UNION ALL SELECT 2, l, r FROM b2
      |      UNION ALL SELECT 3, l, r FROM b3) m),
      |vocab AS (SELECT token, CAST(min(tid) AS BIGINT) AS token_id FROM (
      |    SELECT * FROM charids UNION ALL SELECT * FROM mergeids) u GROUP BY token),
      |tc AS (SELECT token, CAST(sum(c) AS BIGINT) AS token_count FROM (
      |    SELECT unnest(string_split(seq, '$Sep')) AS token, c FROM v3) e
      |  WHERE token <> '' GROUP BY token)
      |SELECT v.token_id, t.token, t.token_count
      |FROM tc t JOIN vocab v ON t.token = v.token
      |ORDER BY t.token_count DESC, t.token ASC LIMIT 30""".stripMargin

  // ----------------------------------------------------------- fertility

  /** q122 — tokenizer fertility per language: tokens-per-word and
    * chars-per-token under the corpus-trained merge table. Fertility is
    * THE cross-lingual tokenizer-fairness metric (a language whose words
    * fragment into 3× the tokens pays 3× the context budget and 3× the
    * inference cost — the standard argument for vocabulary rebalancing),
    * and the token total per language is what converts a char-mass
    * budget into an actual token budget (q118's input at the next
    * refinement). Reference analog: the reference counts chunks per
    * document before indexing; this is the same capacity accounting one
    * level down, at the token level.
    *
    * Scale shape — the q99 two-tier discipline: the corpus-scale pass is
    * the (lang, word) weighted-count groupBy (map-combined,
    * vocab-per-language-sized output, sub-linear by Heaps' law); every
    * DISTINCT word is then encoded exactly once by folding the broadcast
    * merge list over its symbol sequence (merge-table-sized driver
    * state, 3 merges here / 10k-100k real), and per-word token counts
    * join back to the weighted table — an equi-join on the word,
    * AQE-planned (broadcast while the distinct-word table fits). No
    * window, no corpus rescan per merge.
    *
    * Cross-engine exactness: token counts are separator counts on the
    * SAME left-to-right `replace` encoding DuckDB replays (q99's
    * argument), all masses are int64 sums, and each reported ratio is a
    * single double division of exact int64 inputs. */
  def q122TokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, dir)
      .select($"lang", explode(split($"text", " ")).as("w"))
    val merges = trainMerges(base.select($"w"), Iters)
    // corpus-scale tier: weighted (lang, word) counts, map-side combined
    val lw = base.groupBy($"lang", $"w").agg(count(lit(1)).as("cnt"))
    // vocab tier: encode each distinct word once (q99's fold); token
    // count = separator count of the encoded form (leading-separator
    // encoding ⇒ exactly one separator per emitted token)
    val encodedSeq = merges.foldLeft(
        regexp_replace($"w", "(?s)(.)", s"$Sep$$1")) {
      case (c, (_, l, r, _)) =>
        replace(c, lit(s"$Sep$l$Sep$r"), lit(s"$Sep$l$r"))
    }
    val ntok = lw.select($"w").distinct()
      .select($"w", (size(split(encodedSeq, Sep)) - 1).cast("long").as("ntok"))
    lw.join(ntok, Seq("w"))
      .groupBy($"lang")
      .agg(sum($"cnt").cast("long").as("n_words"),
        sum($"cnt" * $"ntok").cast("long").as("n_tokens"),
        sum($"cnt" * length($"w")).cast("long").as("n_chars"))
      .select($"lang", $"n_words", $"n_tokens",
        round($"n_tokens" / $"n_words".cast("double"), 6).as("fertility"),
        round($"n_chars" / $"n_tokens".cast("double"), 6)
          .as("chars_per_token"))
      .orderBy($"lang")
  }

  val q122Oracle: String =
    s"""$TrainCte,
      |lw AS (SELECT lang, w, count(*) AS c
      |       FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
      |             FROM documents) t
      |       GROUP BY 1, 2),
      |dw AS (SELECT DISTINCT w FROM lw),
      |enc AS (SELECT dw.w,
      |          replace(replace(replace(
      |            regexp_replace(dw.w, '(.)', '$Sep\\1', 'gs'),
      |            '$Sep' || b1.l || '$Sep' || b1.r, '$Sep' || b1.l || b1.r),
      |            '$Sep' || b2.l || '$Sep' || b2.r, '$Sep' || b2.l || b2.r),
      |            '$Sep' || b3.l || '$Sep' || b3.r, '$Sep' || b3.l || b3.r)
      |            AS seq
      |        FROM dw, b1, b2, b3),
      |nt AS (SELECT w, CAST(len(string_split(seq, '$Sep')) - 1 AS BIGINT)
      |               AS ntok
      |       FROM enc)
      |SELECT lw.lang,
      |       CAST(sum(lw.c) AS BIGINT) AS n_words,
      |       CAST(sum(lw.c * nt.ntok) AS BIGINT) AS n_tokens,
      |       round(CAST(sum(lw.c * nt.ntok) AS DOUBLE)
      |             / CAST(sum(lw.c) AS DOUBLE), 6) AS fertility,
      |       round(CAST(sum(lw.c * len(lw.w)) AS DOUBLE)
      |             / CAST(sum(lw.c * nt.ntok) AS DOUBLE), 6)
      |         AS chars_per_token
      |FROM lw JOIN nt ON lw.w = nt.w
      |GROUP BY lw.lang
      |ORDER BY lang""".stripMargin

  // ------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_bpe_merges" -> q95BpeMerges _,
    "q99_bpe_encode" -> q99BpeEncode _,
    "q122_tokenizer_fertility" -> q122TokenizerFertility _)

  val oracle: Map[String, String] = Map(
    "q95_bpe_merges" -> q95Oracle,
    "q99_bpe_encode" -> q99Oracle,
    "q122_tokenizer_fertility" -> q122Oracle)
}
