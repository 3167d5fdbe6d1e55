package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for LLM training-data pipelines (north-star
  * surface): language-ID heuristic, quality scoring, token counting,
  * document fingerprinting. All over `documents`, all oracle-checked.
  *
  * Scale notes: every operator here is a narrow per-document map (explode
  * + re-group on the already-partition-local doc_id, or a pure
  * projection) — no cross-document shuffle except the final presentation
  * sort, so they pipeline behind whatever scan feeds them at 100 TB.
  */
object TextStats {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The engine's stopword list for the lang-ID heuristic (top English
    * function words; the fixture corpus is synthetic so the interesting
    * part is the ratio machinery, not the list). */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "that", "for", "it")

  private val stopSqlList = EnStopwords.map(w => s"'$w'").mkString(", ")

  /** q30 — language ID via stopword-ratio n-gram heuristic: fraction of
    * tokens that are English function words; ≥ 3% → 'en'. */
  def q30LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("token"))
      .groupBy($"doc_id", $"lang")
      .agg((sum(when($"token".isin(EnStopwords: _*), 1).otherwise(0)) /
        count(lit(1))).as("stop_ratio"))
      .select($"doc_id", $"lang",
        when($"stop_ratio" >= 0.03, "en").otherwise("other").as("lang_guess"),
        round($"stop_ratio", 6).as("stop_ratio"))
      .orderBy($"doc_id")
  }

  val q30Oracle: String =
    s"""WITH toks AS (SELECT doc_id, lang,
      |                unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |r AS (SELECT doc_id, lang,
      |        sum(CASE WHEN token IN ($stopSqlList) THEN 1 ELSE 0 END)
      |          / count(*) AS stop_ratio
      |      FROM toks GROUP BY 1, 2)
      |SELECT doc_id, lang,
      |       CASE WHEN stop_ratio >= 0.03 THEN 'en' ELSE 'other' END AS lang_guess,
      |       round(stop_ratio, 6) AS stop_ratio
      |FROM r ORDER BY doc_id""".stripMargin

  /** q31 — quality scoring: length/punctuation/stopword components folded
    * into one score (the shape of Gopher/C4-style quality filters). */
  def q31Quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", $"text", explode(split($"text", " ")).as("token"))
    toks.groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        (sum(length($"token")) / count(lit(1))).as("avg_token_len"),
        (sum(when($"token".isin(EnStopwords: _*), 1).otherwise(0)) /
          count(lit(1))).as("stop_ratio"),
        max(length($"text")).as("n_chars"),
        max(length(regexp_replace($"text", "[a-z0-9 ]", ""))).as("n_punct"))
      .select($"doc_id", $"n_tokens", round($"avg_token_len", 6).as("avg_token_len"),
        $"n_chars", $"n_punct",
        round(
          least($"n_tokens" / 200.0, lit(1.0)) * 0.5 +
            $"stop_ratio" * 0.3 +
            when($"n_punct" / $"n_chars" < 0.1, 0.2).otherwise(0.0),
          6).as("quality_score"))
      .orderBy($"doc_id")
  }

  val q31Oracle: String =
    s"""WITH toks AS (SELECT doc_id, text,
      |                unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |a AS (SELECT doc_id,
      |        count(*) AS n_tokens,
      |        sum(length(token)) / count(*) AS avg_token_len,
      |        sum(CASE WHEN token IN ($stopSqlList) THEN 1 ELSE 0 END)
      |          / count(*) AS stop_ratio,
      |        max(length(text)) AS n_chars,
      |        max(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))) AS n_punct
      |      FROM toks GROUP BY 1)
      |SELECT doc_id, n_tokens, round(avg_token_len, 6) AS avg_token_len,
      |       n_chars, n_punct,
      |       round(least(n_tokens / 200.0, 1.0) * 0.5 + stop_ratio * 0.3 +
      |             CASE WHEN n_punct / n_chars < 0.1 THEN 0.2 ELSE 0.0 END,
      |             6) AS quality_score
      |FROM a ORDER BY doc_id""".stripMargin

  /** q32 — token counting: whitespace tokens, regex (BPE-ish pre-token)
    * matches, and a chars/4 BPE estimate. */
  def q32TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id",
        size(split($"text", " ")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+"), lit(0)))
          .as("re_tokens"),
        ceil(length(regexp_replace($"text", " ", "")) / 4.0).cast("long")
          .as("est_bpe_tokens"))
      .orderBy($"doc_id")
  }

  val q32Oracle: String =
    """SELECT doc_id,
      |       len(string_split(text, ' ')) AS ws_tokens,
      |       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
      |       CAST(ceil(length(replace(text, ' ', '')) / 4.0) AS BIGINT) AS est_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q33 — document fingerprinting: whole-document digest over normalized
    * text + min/max word-5-gram digests (the winnowing primitive used for
    * fuzzy containment checks). */
  def q33Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docs(s, dir)
      .select($"doc_id",
        md5(trim(regexp_replace($"text", " +", " "))).as("doc_fp"),
        split($"text", " ").as("t"))
    // build the gram STRINGS inside the lambda, hash AFTER the explode:
    // HOF lambdas evaluate interpreted, so an md5 inside transform() runs
    // ~4× slower than the same md5 as a codegen'd projection (measured on
    // the Jaccard kernel); the string concat is the only non-codegen part
    val grams = base
      .filter(size($"t") >= 5)
      .select($"doc_id", $"doc_fp", expr(
        """explode(transform(sequence(1, size(t) - 4),
          |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
          |       element_at(t, i + 2), element_at(t, i + 3),
          |       element_at(t, i + 4))))""".stripMargin).as("gram"))
      .select($"doc_id", $"doc_fp", md5($"gram").as("g"))
    grams.groupBy($"doc_id", $"doc_fp")
      .agg(min($"g").as("min_gram_fp"), max($"g").as("max_gram_fp"))
      .orderBy($"doc_id")
  }

  val q33Oracle: String =
    """WITH base AS (SELECT doc_id,
      |                md5(trim(regexp_replace(text, ' +', ' ', 'g'))) AS doc_fp,
      |                string_split(text, ' ') AS t
      |              FROM documents),
      |grams AS (SELECT doc_id, doc_fp,
      |            md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
      |                t[i+3] || ' ' || t[i+4]) AS g
      |          FROM base, LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) x
      |          WHERE len(t) >= 5)
      |SELECT doc_id, doc_fp, min(g) AS min_gram_fp, max(g) AS max_gram_fp
      |FROM grams GROUP BY 1, 2
      |ORDER BY doc_id""".stripMargin

  /** q59 — deterministic hash split: every doc lands in train/val/test by
    * an md5 bucket of its id — stable across runs, machines, and engines
    * (unlike rand()-seeded sampling, which no two engines reproduce).
    * 16 buckets: 0-b train (75%), c-d val (12.5%), e-f test (12.5%).
    * This is how a 100 TB corpus gets reproducible held-out splits: the
    * assignment is a pure projection (no shuffle, no state), and any
    * engine that can md5 re-derives the same membership. */
  def q59HashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = substring(md5(concat(lit("split:"), $"doc_id")), 1, 1)
    docs(s, dir)
      .withColumn("split",
        when(bucket.isin("c", "d"), "val")
          .when(bucket.isin("e", "f"), "test")
          .otherwise("train"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"split", $"lang")
  }

  val q59Oracle: String =
    """WITH b AS (SELECT *, substr(md5('split:' || doc_id), 1, 1) AS bk
      |           FROM documents)
      |SELECT CASE WHEN bk IN ('c', 'd') THEN 'val'
      |            WHEN bk IN ('e', 'f') THEN 'test'
      |            ELSE 'train' END AS split,
      |       lang, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM b
      |GROUP BY 1, 2
      |ORDER BY split, lang""".stripMargin

  /** q69 — deterministic stratified sampling: ~10% of every language,
    * membership decided by `md5(doc_id) mod 100 < 10` — a pure
    * projection any engine re-derives (rand()-based sampling reproduces
    * on no two engines, and TABLESAMPLE is partition-layout-dependent).
    * This is curation's workhorse: carve an eval slice / debug subset /
    * annotation batch out of a 100 TB corpus with no shuffle, no state,
    * and a membership test that is re-runnable forever. Per-language
    * accounting shows the realized rate beside the target. */
  def q69StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sampled = expr(
      "pmod(cast(conv(substring(md5(concat('samp:', doc_id)), 1, 15), 16, 10) as bigint), 100) < 10")
    docs(s, dir)
      .withColumn("in_sample", sampled)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"in_sample", 1L).otherwise(0L)).as("n_sampled"),
        round(avg(when($"in_sample", 1.0).otherwise(0.0)), 6).as("rate"))
      .orderBy($"lang")
  }

  val q69Oracle: String =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |       round(avg(CASE WHEN s THEN 1.0 ELSE 0.0 END), 6) AS rate
      |FROM (SELECT lang,
      |        CAST('0x' || substr(md5('samp:' || doc_id), 1, 15) AS BIGINT) % 100 < 10 AS s
      |      FROM documents)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** q71 — intra-document repetition score (the Gopher/Rae-style
    * repetition quality filter): fraction of a doc's 3-gram slots
    * occupied by repeats, 1 − |distinct 3-grams| / |3-grams|. Computed
    * ENTIRELY task-local — the gram array and its array_distinct never
    * leave the projection, so the only shuffle is the final per-language
    * aggregate (one row per doc). Highly repetitive docs are the classic
    * low-quality training-data signature this filter removes. */
  def q71Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = expr(
      """transform(sequence(1, size(t) - 2),
        |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
        |                 element_at(t, i + 2)))""".stripMargin)
    docs(s, dir)
      .select($"doc_id", $"lang", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
      .select($"doc_id", $"lang",
        (lit(1.0) - size(array_distinct(grams)).cast("double")
          / size(grams).cast("double")).as("rep"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"rep"), 6).as("avg_repetition"),
        round(max($"rep"), 6).as("max_repetition"))
      .orderBy($"lang")
  }

  val q71Oracle: String =
    """WITH g AS (SELECT doc_id, lang,
      |             1.0 - CAST(len(list_distinct(gs)) AS DOUBLE)
      |                   / CAST(len(gs) AS DOUBLE) AS rep
      |           FROM (SELECT doc_id, lang,
      |                   list_transform(generate_series(1, len(t) - 2),
      |                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS gs
      |                 FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
      |                       FROM documents)
      |                 WHERE len(t) >= 3) x)
      |SELECT lang, count(*) AS n_docs,
      |       round(avg(rep), 6) AS avg_repetition,
      |       round(max(rep), 6) AS max_repetition
      |FROM g GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** q72 — unigram-LM perplexity (the CCNet-style quality filter): a
    * unigram model with add-one smoothing is fit on the corpus itself,
    * then every document is scored by exp(−mean ln p(token)). High
    * perplexity = tokens the corpus finds surprising = likely noise;
    * the classic cheap LM filter before an expensive neural one. Plan
    * shape at 100 TB: the model is ONE vocabulary-sized aggregate;
    * scoring joins tokens to it + one per-doc aggregate — no
    * corpus-sized shuffle beyond the tokenize. The model join is NOT
    * hint-forced to broadcast: vocabulary grows with corpus size
    * (Heaps' law, ~K·N^0.5), so a web-scale corpus's unigram table can
    * exceed executor memory — the planner (with AQE runtime sizes)
    * picks broadcast while the model fits and falls back to a shuffle
    * hash join past the autoBroadcastJoinThreshold instead of OOMing.
    * The totals join stays an explicit broadcast: it is one row by
    * construction. Deterministic: ln/exp over integer-derived ratios,
    * rounded on both engines. */
  def q72UnigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("token"))
    val model = toks.groupBy($"token").agg(count(lit(1)).as("c"))
    val totals = model.agg(
      sum($"c").as("n_total"), count(lit(1)).as("v_size"))
    val scored = toks
      .join(model, "token")
      .crossJoin(broadcast(totals))
      .withColumn("lp",
        log(($"c" + 1.0) / ($"n_total" + $"v_size")))
      .groupBy($"doc_id", $"lang")
      .agg(exp(-avg($"lp")).as("ppl"))
    scored.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"ppl"), 2).as("avg_ppl"),
        round(max($"ppl"), 2).as("max_ppl"))
      .orderBy($"lang")
  }

  val q72Oracle: String =
    """WITH toks AS (SELECT doc_id, lang,
      |                unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |model AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total,
      |               CAST(count(*) AS DOUBLE) AS v_size FROM model),
      |scored AS (SELECT t.doc_id, t.lang,
      |             exp(-avg(ln((m.c + 1.0) / (tot.n_total + tot.v_size))))
      |               AS ppl
      |           FROM toks t JOIN model m ON t.token = m.token, tot
      |           GROUP BY 1, 2)
      |SELECT lang, count(*) AS n_docs,
      |       round(avg(ppl), 2) AS avg_ppl,
      |       round(max(ppl), 2) AS max_ppl
      |FROM scored GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** q60 — vocabulary heavy hitters: global top-20 tokens by corpus
    * frequency with doc-frequency alongside. The orderBy+limit plans as
    * TakeOrderedAndProject — per-partition top-k then a driver merge of
    * 20-row heaps, never a global sort; the groupBy shuffles one row
    * per distinct token (map-side combined), not one per occurrence. */
  def q60HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("tf"), countDistinct($"doc_id").as("df"))
      .orderBy($"tf".desc, $"token".asc)
      .limit(20)
  }

  val q60Oracle: String =
    """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |      FROM documents)
      |GROUP BY token
      |ORDER BY tf DESC, token ASC LIMIT 20""".stripMargin

  /** q61 — greedy shard packing: group documents into training shards of
    * ≤ 4000 estimated tokens per language, closing a shard when the next
    * doc would overflow (an oversized doc occupies a shard alone) — the
    * sequence-packing step between curation and tokenization. Sequential
    * per group, so it runs as a typed `flatMapGroups` (the Dataset face
    * of per-key imperative logic); each group's docs sort in memory,
    * bounded by docs-per-lang — the 100 TB form packs per (lang,
    * date-bucket) so no group outgrows an executor. The oracle replays
    * the same walk as a per-language recursive CTE. */
  def q61PackShards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cap = 4000L
    docs(s, dir)
      .select($"lang", $"doc_id",
        ceil($"n_chars" / 4.0).cast("long").as("est_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (lang, it) =>
        var shard = 0L
        var total = 0L
        var first = true
        it.toSeq.sortBy(_._2).map { case (_, docId, tok) =>
          // close on overflow for every doc but the first — including a
          // zero-token running total, exactly like the oracle's
          // unguarded `total + tok > cap` recursion step
          if (!first && total + tok > cap) { shard += 1; total = 0 }
          first = false
          total += tok
          (lang, shard, docId, tok)
        }
      }
      .toDF("lang", "shard", "doc_id", "est_tokens")
      .groupBy($"lang", $"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"est_tokens").as("sum_tokens"))
      .orderBy($"lang", $"shard")
  }

  val q61Oracle: String =
    """WITH RECURSIVE
      |d AS (SELECT lang, doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS tok,
      |             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      |      FROM documents),
      |walk AS (
      |  SELECT lang, rn, tok, CAST(0 AS BIGINT) AS shard, tok AS total
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.lang, d.rn, d.tok,
      |         CASE WHEN w.total + d.tok > 4000 THEN w.shard + 1
      |              ELSE w.shard END,
      |         CASE WHEN w.total + d.tok > 4000 THEN d.tok
      |              ELSE w.total + d.tok END
      |  FROM walk w JOIN d ON d.lang = w.lang AND d.rn = w.rn + 1
      |)
      |SELECT lang, shard, count(*) AS n_docs,
      |       CAST(sum(tok) AS BIGINT) AS sum_tokens
      |FROM walk GROUP BY 1, 2
      |ORDER BY lang, shard""".stripMargin

  // ---------------------------------------------------------------- q91

  /** q91 — PMI collocations (pointwise mutual information over adjacent
    * token pairs — the classic collocation-mining statistic, Church &
    * Hanks 1990; in training-data pipelines it surfaces boilerplate
    * phrases and templated text that per-token stats miss).
    * pmi(a,b) = ln(p(ab) / (p(a)·p(b))) with p(ab) over bigram slots
    * and p(·) over unigrams; a min-count ≥ 5 floor drops the unstable
    * tail. Every input to ln() is a product/quotient of exact integer
    * counts written IDENTICALLY in both engines (left-to-right
    * evaluation), and ranking orders on round(pmi, 6) with a (w1, w2)
    * tiebreak so ln ulps can't flip the cut. Scale shape: one shuffle
    * of distinct bigrams, one of distinct unigrams (both vocabulary-
    * sized, map-side combined); the two scalar totals broadcast. */
  def q91PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("t"))
    val big = toks.filter(size($"t") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> named_struct('w1', element_at(t, i),
          |                    'w2', element_at(t, i + 1)))""".stripMargin))
        .as("bg"))
      .select($"bg.w1".as("w1"), $"bg.w2".as("w2"))
    val uni = toks.select(explode($"t").as("w"))
    val cab = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
      .filter($"c_ab" >= 5)
    val ca = uni.groupBy($"w").agg(count(lit(1)).as("c"))
    val nb = big.agg(count(lit(1)).as("n_bi"))
    val nu = uni.agg(count(lit(1)).as("n_uni"))
    cab
      .join(ca.select($"w".as("w1"), $"c".as("c_a")), "w1")
      .join(ca.select($"w".as("w2"), $"c".as("c_b")), "w2")
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .select($"w1", $"w2", $"c_ab",
        round(log($"c_ab".cast("double") * $"n_uni" * $"n_uni" /
          ($"n_bi".cast("double") * $"c_a" * $"c_b")), 6).as("pmi"))
      .orderBy($"pmi".desc, $"w1".asc, $"w2".asc)
      .limit(20)
  }

  val q91Oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |big AS (SELECT t[i] AS w1, t[i + 1] AS w2
      |        FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)
      |        WHERE len(t) >= 2),
      |uni AS (SELECT unnest(t) AS w FROM t),
      |cab AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1, 2
      |        HAVING count(*) >= 5),
      |ca AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
      |nb AS (SELECT count(*) AS n_bi FROM big),
      |nu AS (SELECT count(*) AS n_uni FROM uni)
      |SELECT cab.w1, cab.w2, cab.c_ab,
      |       round(ln(CAST(cab.c_ab AS DOUBLE) * nu.n_uni * nu.n_uni /
      |         (CAST(nb.n_bi AS DOUBLE) * a.c * b.c)), 6) AS pmi
      |FROM cab
      |JOIN ca a ON cab.w1 = a.w
      |JOIN ca b ON cab.w2 = b.w, nb, nu
      |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin

  /** q101 — the Gopher repetition-filter pair (Rae et al.,
    * arXiv:2112.11446 §A1.1) complementing q71's slot-fraction and q84's
    * span coverage with the paper's CHARACTER-MASS weighted signals:
    * (a) fraction of doc characters contributed by occurrences of the
    * single most frequent word bigram; (b) fraction of n-gram character
    * mass lying in DUPLICATED n-grams (n=3 here — the paper's n=5..10
    * is vacuous on the 10–99-token fixture docs, every 5-gram is
    * unique; the statistic is the same). A doc passes when
    * top_bigram_frac ≤ 0.20 (the paper's top-2-gram threshold) and
    * dup_trigram_frac ≤ 0.10. Ties for the top bigram break
    * lexicographically (min over (-count, gram) structs — the engine's
    * deterministic-argmax idiom).
    *
    * Scale shape: two gram streams explode and re-group on
    * (doc_id, gram) — hash-partitioned, map-side combinable, the same
    * cost class as every other gram operator here; the per-doc rollups
    * then group on doc_id alone. No windows, no driver state. */
  def q101GopherRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = docs(s, dir)
      .select($"doc_id", split($"text", " ").as("t"),
        length($"text").as("nc"))
    val bigrams = t.select($"doc_id", $"nc", explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"""
          .stripMargin)).as("g"))
      .groupBy($"doc_id", $"nc", $"g").agg(count(lit(1)).as("cnt"))
    val top2 = bigrams.groupBy($"doc_id")
      .agg(max($"nc").as("nc"),
        min(struct((-$"cnt").as("neg"), $"g".as("g"))).as("m"))
      .select($"doc_id",
        $"m.g".as("top_bigram"),
        round((-$"m.neg") * length($"m.g") / $"nc", 6)
          .as("top_bigram_frac"))
    val trigrams = t.select($"doc_id", explode(expr(
        """transform(sequence(1, size(t) - 2),
          |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
          |                 element_at(t, i + 2)))""".stripMargin)).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
    val dup3 = trigrams.groupBy($"doc_id")
      .agg(round(
        sum(when($"cnt" > 1, $"cnt" * length($"g")).otherwise(0L))
          .cast("double") / sum($"cnt" * length($"g")), 6)
        .as("dup_trigram_frac"))
    top2.join(dup3, Seq("doc_id"))
      .withColumn("pass",
        when($"top_bigram_frac" <= 0.20 && $"dup_trigram_frac" <= 0.10, 1)
          .otherwise(0))
      .orderBy($"doc_id")
  }

  val q101Oracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
      |             length(text) AS nc FROM documents),
      |bc AS (SELECT doc_id, g, count(*) AS cnt FROM (
      |         SELECT doc_id,
      |           unnest(list_transform(generate_series(1, len(t) - 1),
      |             i -> t[i] || ' ' || t[i+1])) AS g
      |         FROM t) GROUP BY 1, 2),
      |top2 AS (SELECT doc_id, g AS top_bigram, cnt FROM (
      |           SELECT doc_id, g, cnt, row_number() OVER (
      |             PARTITION BY doc_id ORDER BY cnt DESC, g) AS rn
      |           FROM bc) WHERE rn = 1),
      |fc AS (SELECT doc_id, g, count(*) AS cnt FROM (
      |         SELECT doc_id,
      |           unnest(list_transform(generate_series(1, len(t) - 2),
      |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      |         FROM t) GROUP BY 1, 2),
      |d3 AS (SELECT doc_id,
      |         round(CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(g)
      |                             ELSE 0 END) AS DOUBLE)
      |               / sum(cnt * length(g)), 6) AS dup_trigram_frac
      |       FROM fc GROUP BY 1)
      |SELECT t.doc_id, top2.top_bigram,
      |       round(CAST(top2.cnt * length(top2.top_bigram) AS DOUBLE)
      |             / t.nc, 6) AS top_bigram_frac,
      |       d3.dup_trigram_frac,
      |       CASE WHEN round(CAST(top2.cnt * length(top2.top_bigram)
      |                            AS DOUBLE) / t.nc, 6) <= 0.20
      |                 AND d3.dup_trigram_frac <= 0.10
      |            THEN 1 ELSE 0 END AS pass
      |FROM t JOIN top2 USING (doc_id) JOIN d3 USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  /** q104 — length-bucketed batching efficiency: bucket docs by token
    * count (width 16), and report per bucket the padding waste a trainer
    * pays when every sequence in a batch pads to the bucket's longest
    * member — the number q61's greedy packing exists to drive down, here
    * measured instead of assumed (the "why length-bucket your
    * dataloader" table). waste_frac = 1 − sum(len)/(n·max_len), exact
    * integer inputs so only the final division is floating point.
    *
    * Scale shape: one projection + one hash aggregate on a ≤few-hundred
    * key space (token counts are bounded by sequence length); map-side
    * combine collapses the corpus before the shuffle. */
  def q104LengthBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select(size(split($"text", " ")).cast("long").as("ntok"))
      .withColumn("bucket_lo", expr("(ntok div 16) * 16"))
      .groupBy($"bucket_lo")
      .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"),
        max($"ntok").as("max_len"))
      .select($"bucket_lo", $"n_docs", $"n_tokens", $"max_len",
        ($"n_docs" * $"max_len" - $"n_tokens").as("pad_tokens"),
        round(lit(1.0) - $"n_tokens" /
          ($"n_docs" * $"max_len").cast("double"), 6).as("waste_frac"))
      .orderBy($"bucket_lo")
  }

  val q104Oracle: String =
    """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
      |             AS ntok FROM documents),
      |b AS (SELECT (ntok // 16) * 16 AS bucket_lo,
      |        CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |        max(ntok) AS max_len
      |      FROM t GROUP BY 1)
      |SELECT bucket_lo, n_docs, n_tokens, max_len,
      |       CAST(n_docs * max_len - n_tokens AS BIGINT) AS pad_tokens,
      |       round(1.0 - CAST(n_tokens AS DOUBLE)
      |             / CAST(n_docs * max_len AS DOUBLE), 6) AS waste_frac
      |FROM b ORDER BY bucket_lo""".stripMargin

  /** q107 — vocabulary coverage curve (the Zipf table a tokenizer/vocab
    * design starts from): what fraction of corpus token OCCURRENCES is
    * covered by the top-N most frequent types, N ∈ {1,10,100,1000}. The
    * "how big must the vocab be" number — complements q95 (which builds
    * the vocab) and q60 (which lists the head).
    *
    * Scale shape: global frequency rank WITHOUT a global window (the
    * q102 decomposition, keyed differently): types bucket by
    * floor(log2(cnt)) — counts in a higher bucket strictly exceed every
    * count in a lower one, and cnt-ties land in the SAME bucket, so
    * offset(bucket) + rank-within-bucket IS the global (cnt desc, tok)
    * rank; the bucket histogram is ≤64 rows of driver state however
    * large the vocabulary grows. One conditional-sum aggregate then
    * emits all four coverage levels in a single pass (stack unpivots
    * it). Total-occurrence count rides in the same aggregate — no
    * second corpus scan. */
  def q107VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cached: consumed by the histogram collect AND the ranked plan —
    // uncached, the token explode + frequency aggregate would run twice
    // per evaluation (review find); harness sweep releases it post-query
    val tc = docs(s, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .withColumn("lb", floor(log2($"cnt")).cast("int"))
      .cache()
    val wb = Window.partitionBy($"lb").orderBy($"cnt".desc, $"tok".asc)
    val ranked = tc.withColumn("rb", row_number().over(wb))
    // ≤64-row histogram, DESCENDING bucket order (higher counts first)
    val hist = tc.groupBy($"lb").agg(count(lit(1)).as("c"))
      .orderBy($"lb".desc).collect()
    var running = 0L
    val offsets = hist.toSeq.map { r =>
      val o = (r.getInt(0), running); running += r.getLong(1); o
    }.toDF("lb", "cum")
    val agg = ranked.join(broadcast(offsets), Seq("lb"))
      .withColumn("rank", $"cum" + $"rb")
      .agg(
        sum(when($"rank" <= 1, $"cnt")).as("c1"),
        sum(when($"rank" <= 10, $"cnt")).as("c10"),
        sum(when($"rank" <= 100, $"cnt")).as("c100"),
        sum(when($"rank" <= 1000, $"cnt")).as("c1000"),
        sum($"cnt").as("tot"), count(lit(1)).as("ntypes"))
    agg.select(
        expr("stack(4, 1, c1, 10, c10, 100, c100, 1000, c1000) AS (n_top, covered)"),
        $"tot", $"ntypes")
      .select($"n_top", least($"n_top", $"ntypes").as("n_types_used"),
        $"covered", $"tot".as("total_tokens"),
        round($"covered" / $"tot".cast("double"), 6).as("coverage"))
      .orderBy($"n_top")
  }

  val q107Oracle: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
      |           FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
      |r AS (SELECT tok, cnt,
      |        row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
      |      FROM c),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,
      |          count(*) AS ntypes FROM c),
      |lv AS (SELECT unnest([1, 10, 100, 1000]) AS n_top),
      |cov AS (SELECT lv.n_top,
      |          CAST(sum(CASE WHEN r.rank <= lv.n_top THEN r.cnt
      |                        ELSE 0 END) AS BIGINT) AS covered
      |        FROM lv CROSS JOIN r GROUP BY lv.n_top)
      |SELECT cov.n_top,
      |       CAST(least(cov.n_top, tot.ntypes) AS BIGINT) AS n_types_used,
      |       cov.covered, tot.tot AS total_tokens,
      |       round(CAST(cov.covered AS DOUBLE) / tot.tot, 6) AS coverage
      |FROM cov CROSS JOIN tot ORDER BY n_top""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_pmi_collocations" -> q91PmiCollocations _,
    "q61_pack_shards" -> q61PackShards _,
    "q60_heavy_hitters" -> q60HeavyHitters _,
    "q30_text_langid" -> q30LangId _,
    "q31_text_quality" -> q31Quality _,
    "q32_text_tokens" -> q32TokenCount _,
    "q33_text_fingerprint" -> q33Fingerprint _,
    "q59_hash_split" -> q59HashSplit _,
    "q69_stratified_sample" -> q69StratifiedSample _,
    "q71_repetition" -> q71Repetition _,
    "q72_unigram_perplexity" -> q72UnigramPerplexity _,
    "q101_gopher_repetition" -> q101GopherRepetition _,
    "q104_length_buckets" -> q104LengthBuckets _,
    "q107_vocab_coverage" -> q107VocabCoverage _)

  val oracle: Map[String, String] = Map(
    "q91_pmi_collocations" -> q91Oracle,
    "q61_pack_shards" -> q61Oracle,
    "q60_heavy_hitters" -> q60Oracle,
    "q30_text_langid" -> q30Oracle,
    "q31_text_quality" -> q31Oracle,
    "q32_text_tokens" -> q32Oracle,
    "q33_text_fingerprint" -> q33Oracle,
    "q59_hash_split" -> q59Oracle,
    "q69_stratified_sample" -> q69Oracle,
    "q71_repetition" -> q71Oracle,
    "q72_unigram_perplexity" -> q72Oracle,
    "q101_gopher_repetition" -> q101Oracle,
    "q104_length_buckets" -> q104Oracle,
    "q107_vocab_coverage" -> q107Oracle)
}
