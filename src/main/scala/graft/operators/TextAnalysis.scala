package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for training-data pipelines, over the
  * `documents` table: token stats/quality scoring, n-gram language ID,
  * and document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` (no UDFs), and all
  * scoring uses integer arithmetic or md5-string comparisons so the
  * DuckDB oracle is bit-identical. Per-row map-only transforms: no
  * shuffle, scales linearly with input splits.
  */
object TextAnalysis {

  /** Whitespace-collapsed, lowercased normal form (regex-free kernel,
    * bit-identical to `lower(trim(regexp_replace(c, "\\s+", " ")))` —
    * property-tested in KernelPropertySpec). */
  def norm(c: Column): Column = graft.functions.TextStatFunctions.normText(c)
  /** Token array of the normal form (single-pass kernel, ≡
    * `split(norm(c), " ")`). Every operator deriving tokens goes
    * through here, so the whole pipeline family shed its per-row
    * regex pass in one place. */
  def tokens(c: Column): Column = graft.functions.TextStatFunctions.tokenArr(c)

  private[operators] val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private[operators] val tokensSql = s"string_split($normSql, ' ')"

  /** ta_stats: token counting + quality signals. Quality score =
    * integer percent of stopword tokens (a crude fluency proxy) plus
    * length stats; `div` keeps it engine-exact. All four counts come
    * from ONE single-pass kernel call ([[graft.functions.TokenStats]])
    * — the previous `size(filter(...))`/`array_distinct` HOF forms ran
    * interpreted and re-derived the token array per output column. */
  def taStats(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "in", "is", "to")
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        graft.functions.TextStatFunctions.tokenStats(col("text"), stop)
          .as("st"))
      .select(
        col("doc_id"),
        col("st").getItem(0).as("n_chars_norm"),
        col("st").getItem(1).as("n_tokens"),
        col("st").getItem(2).as("n_distinct_tokens"),
        col("st").getItem(3).as("n_stopwords"))
      .withColumn("stopword_pct",
        expr("n_stopwords * 100 div n_tokens"))
      .withColumn("ttr_pct", // type-token ratio as integer percent
        expr("n_distinct_tokens * 100 div n_tokens"))
      .orderBy(col("doc_id"))
  }

  val taStatsOracle: String = {
    val stopList = "('the','a','of','and','in','is','to')"
    s"""SELECT doc_id,
       |  CAST(length($normSql) AS BIGINT) AS n_chars_norm,
       |  CAST(len($tokensSql) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($tokensSql)) AS BIGINT) AS n_distinct_tokens,
       |  CAST(len(list_filter($tokensSql, t -> t IN $stopList)) AS BIGINT) AS n_stopwords,
       |  CAST(len(list_filter($tokensSql, t -> t IN $stopList)) * 100 // len($tokensSql) AS BIGINT) AS stopword_pct,
       |  CAST(len(list_distinct($tokensSql)) * 100 // len($tokensSql) AS BIGINT) AS ttr_pct
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Marker stopwords per language for the n-gram-free language-ID
    * heuristic (score = marker-token occurrences). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "que", "y", "es"))

  /** ta_langid: language identification via marker-word counts, argmax
    * with first-wins tie-break in fixed language order. All four
    * language scores come from ONE single-pass kernel call
    * ([[graft.functions.TokenSetCounts]], bitmask dispatch) — the
    * previous form paid 4 × (regex-normalize + split + interpreted
    * HOF filter) per row. */
  def taLangId(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        graft.functions.TextStatFunctions
          .tokenSetCounts(col("text"), langMarkers.map(_._2)).as("sc"))
      .select(Seq(col("doc_id"), col("labeled_lang")) ++
        langMarkers.zipWithIndex.map { case ((l, _), i) =>
          col("sc").getItem(i).as(s"score_$l")
        }: _*)
    // argmax, ties resolved by declaration order (en first)
    val pred = langMarkers.tail.foldLeft(
      when(lit(true), lit(langMarkers.head._1))) { case (acc, (l, _)) =>
      when(langMarkers.takeWhile(_._1 != l)
        .map(p => col(s"score_$l") > col(s"score_${p._1}"))
        .reduce(_ && _), lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
      .withColumn("agrees", (col("pred_lang") === col("labeled_lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  val taLangIdOracle: String = {
    def scoreSql(ms: Seq[String]) =
      s"CAST(len(list_filter($tokensSql, t -> t IN (${ms.map(m => s"'$m'").mkString(",")}))) AS BIGINT)"
    val scores = langMarkers.map { case (l, ms) => s"${scoreSql(ms)} AS score_$l" }
    // same fold: later language wins only if strictly greater than all before it
    val pred = langMarkers.tail.foldLeft("'en'") { case (acc, (l, _)) =>
      val cond = langMarkers.takeWhile(_._1 != l)
        .map(p => s"score_$l > score_${p._1}").mkString(" AND ")
      s"CASE WHEN $cond THEN '$l' ELSE $acc END"
    }
    s"""SELECT doc_id, labeled_lang, score_en, score_de, score_fr, score_es,
       |  $pred AS pred_lang,
       |  CAST($pred = labeled_lang AS INT) AS agrees
       |FROM (SELECT doc_id, lang AS labeled_lang, ${scores.mkString(", ")}
       |      FROM documents) ORDER BY doc_id""".stripMargin
  }

  /** ta_fingerprint: two content fingerprints — an order-sensitive md5
    * of the normal form, and an order-insensitive "bag" fingerprint of
    * the sorted token multiset (catches word-order permutations). */
  def taFingerprint(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextStatFunctions.{bagNorm, normText}
    // norm/bag via regex-free kernels; md5 is already codegen'd. The
    // interpreted `array_sort` HOF and per-column regexp_replace are
    // gone; values are bit-identical (ASCII sort order).
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"),
        md5(normText(col("text"))).as("fp_exact"),
        md5(bagNorm(col("text"))).as("fp_bag"),
        substring(md5(normText(col("text"))), 1, 4).as("fp_bucket"))
      .orderBy(col("doc_id"))
  }

  val taFingerprintOracle: String =
    s"""SELECT doc_id,
       |  md5($normSql) AS fp_exact,
       |  md5(array_to_string(list_sort($tokensSql), ' ')) AS fp_bag,
       |  substring(md5($normSql), 1, 4) AS fp_bucket
       |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-ish subword pattern over the normal form: letter runs, digit
    * runs, single other symbols — the shape of byte-pair pre-tokenizer
    * regexes, with semantics identical in Java regex and RE2. */
  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** ta_tokens: token counting three ways — whitespace tokens, BPE-ish
    * regex tokens, and a polynomial rolling-hash fingerprint (kernel
    * expression; the fold is defined by the SQL in the oracle). */
  def taTokens(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextStatFunctions.{bpeCount, wsTokenCount}
    // three independent single-pass kernels replace split-regex `size`
    // and `regexp_count` over the (re-derived) normal form
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(
        col("doc_id"),
        wsTokenCount(col("text")).as("ws_tokens"),
        bpeCount(col("text")).as("bpe_tokens"),
        graft.functions.TextFunctions.rollingHash(col("text"))
          .as("rollhash"))
      .orderBy(col("doc_id"))
  }

  val taTokensOracle: String =
    s"""SELECT doc_id,
       |  CAST(len($tokensSql) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all($normSql, '$bpePattern')) AS BIGINT) AS bpe_tokens,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($normSql, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (acc, c) -> (acc * 31 + c) % 2147483647) AS BIGINT) AS rollhash
       |FROM documents ORDER BY doc_id""".stripMargin

  /** q128 duplicate-n-gram thresholds (Gopher, Rae et al. 2021 §A1.1
    * table A1 gives 0.20/0.18 for dup-2/3-gram FRACTIONS; integer
    * percents here). Mean-word-length band ×100 of Gopher's 3–10. */
  val GopherDup2MaxPct = 20L
  val GopherDup3MaxPct = 18L
  val GopherWlenMinE2 = 300L
  val GopherWlenMaxE2 = 1000L

  /** q128: Gopher-style repetition/quality rules (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", appendix A1.1) — the
    * standard pre-training text filter family: duplicate-2-gram and
    * duplicate-3-gram fractions (repetitious boilerplate), mean word
    * length band, and the all-numeric token share, folded into one
    * pass/fail flag per document.
    *
    * Everything is computed IN-ROW from the token array (n-gram
    * arrays via `transform(sequence(...))`, duplicate share via
    * `size − size(array_distinct)`) — a map-only plan with NO
    * shuffle: per-document rules never need cross-document state, so
    * the operator scales as pure scan bandwidth at 100 TB (the same
    * shape as ta_stats/ta_langid). Integer `div` percents keep both
    * engines bit-identical; empty/one-token documents define their
    * dup fractions as 0 (no n-grams exist). */
  def q128GopherQuality(s: SparkSession, dir: String): DataFrame = {
    // sequence(1, 0) is DESCENDING in Spark, so the n-gram builder
    // must gate on size >= n rather than clamping the sequence end
    def ngrams(t: Column, n: Int): Column =
      when(size(t) >= n,
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ",
            (0 until n).map(o => element_at(t, i + o)): _*)))
        .otherwise(typedLit(Seq.empty[String]))
    // integer percents via `div` in expr (Column `/` is true division)
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .withColumn("g2", ngrams(col("t"), 2))
      .withColumn("g3", ngrams(col("t"), 3))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        when(size(col("g2")) === 0, 0L).otherwise(expr(
          "(size(g2) - size(array_distinct(g2))) * 100L div size(g2)"))
          .as("dup2_pct"),
        when(size(col("g3")) === 0, 0L).otherwise(expr(
          "(size(g3) - size(array_distinct(g3))) * 100L div size(g3)"))
          .as("dup3_pct"),
        expr("aggregate(t, 0L, (acc, x) -> acc + length(x)) * 100" +
          " div size(t)").as("mean_wlen_e2"),
        expr("size(filter(t, x -> x rlike '^[0-9]+$')) * 100L" +
          " div size(t)").as("numeric_tok_pct"))
      .withColumn("gopher_pass",
        (col("dup2_pct") < GopherDup2MaxPct &&
          col("dup3_pct") < GopherDup3MaxPct &&
          col("mean_wlen_e2") >= GopherWlenMinE2 &&
          col("mean_wlen_e2") <= GopherWlenMaxE2).cast("int"))
      .orderBy(col("doc_id"))
  }

  val q128GopherQualityOracle: String = {
    def ngramsSql(n: Int) = {
      val parts = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
      s"list_transform(range(1, greatest(len(t) - ${n - 2}, 1)), i -> $parts)"
    }
    def dupPctSql(g: String) =
      s"""CASE WHEN len($g) = 0 THEN 0
         | ELSE (len($g) - len(list_distinct($g))) * 100 // len($g)
         | END""".stripMargin.replace("\n", "")
    s"""WITH tok AS (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS BIGINT) AS n_tokens,
       |    CAST(${dupPctSql(ngramsSql(2))} AS BIGINT) AS dup2_pct,
       |    CAST(${dupPctSql(ngramsSql(3))} AS BIGINT) AS dup3_pct,
       |    CAST(list_sum(list_transform(t, x -> length(x))) * 100
       |      // len(t) AS BIGINT) AS mean_wlen_e2,
       |    CAST(len(list_filter(t, x -> regexp_full_match(x, '[0-9]+')))
       |      * 100 // len(t) AS BIGINT) AS numeric_tok_pct
       |  FROM tok)
       |SELECT *,
       |  CAST(dup2_pct < $GopherDup2MaxPct AND dup3_pct < $GopherDup3MaxPct
       |    AND mean_wlen_e2 BETWEEN $GopherWlenMinE2 AND $GopherWlenMaxE2
       |    AS INT) AS gopher_pass
       |FROM m ORDER BY doc_id""".stripMargin
  }
  // ---- q133: language-ID confidence calibration (ECE) ----------------

  /** Reliability-diagram bins for q133. */
  val EceBins = 10

  /** q133: calibration audit of the ta_langid classifier — the
    * reliability diagram + expected calibration error (Guo et al.,
    * ICML 2017) every production quality/language classifier is
    * audited with before its scores gate a corpus. Confidence is the
    * winning marker score normalized by all marker hits
    * (`s_max·10⁶ div (Σs + 1)`, add-one so zero-marker documents are
    * "no confidence", not a division error); documents land in ten
    * fixed confidence deciles (map-only binning — NO rank/ntile, so
    * no sort); per bin the mean stated confidence sits next to the
    * realized accuracy (`pred_lang = labeled_lang` rate) and their
    * gap; ECE is the doc-weighted mean gap.
    *
    * Scale shape: the scoring pass is ta_langid's map-only kernel;
    * then ONE 10-group aggregate, a ≤10-row ECE reduction, and a
    * 1-row broadcast back onto the bins — the q36/q55 totals shape.
    * The ×10⁶ numerators are DECIMAL(38,0)-widened (HUGEINT in the
    * oracle) so counts at warehouse scale cannot wrap BIGINT. */
  def q133LangidCalibration(s: SparkSession, dir: String): DataFrame = {
    val conf = taLangId(s, dir)
      .withColumn("s_max", greatest(col("score_en"), col("score_de"),
        col("score_fr"), col("score_es")))
      .withColumn("conf_ppm", expr("s_max * 1000000 div" +
        " (score_en + score_de + score_fr + score_es + 1)"))
      .withColumn("bin",
        least(expr(s"conf_ppm * $EceBins div 1000000"),
          lit(EceBins - 1L)))
    val bins = conf.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      expr("CAST(sum(CAST(conf_ppm AS DECIMAL(38,0))) div count(1)" +
        " AS BIGINT)").as("mean_conf_ppm"),
      expr("CAST(CAST(sum(agrees) AS DECIMAL(38,0)) * 1000000" +
        " div count(1) AS BIGINT)").as("acc_ppm"))
      .withColumn("gap_ppm", abs(col("mean_conf_ppm") - col("acc_ppm")))
    val ece = bins.agg(
      expr("CAST(sum(CAST(n AS DECIMAL(38,0)) * gap_ppm) div sum(n)" +
        " AS BIGINT)").as("ece_ppm"))
    bins.crossJoin(broadcast(ece)).orderBy(col("bin"))
  }

  val q133LangidCalibrationOracle: String = {
    val langidSub = taLangIdOracle
    s"""WITH langid AS ($langidSub),
       |conf AS (
       |  SELECT agrees,
       |    greatest(score_en, score_de, score_fr, score_es) * 1000000
       |      // (score_en + score_de + score_fr + score_es + 1)
       |      AS conf_ppm
       |  FROM langid),
       |binned AS (
       |  SELECT agrees, conf_ppm,
       |    least(conf_ppm * $EceBins // 1000000,
       |          ${EceBins - 1}) AS bin
       |  FROM conf),
       |bins AS (
       |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(conf_ppm AS HUGEINT)) // count(*)
       |      AS BIGINT) AS mean_conf_ppm,
       |    CAST(CAST(sum(agrees) AS HUGEINT) * 1000000 // count(*)
       |      AS BIGINT) AS acc_ppm
       |  FROM binned GROUP BY bin),
       |g AS (
       |  SELECT bin, n, mean_conf_ppm, acc_ppm,
       |    CAST(abs(mean_conf_ppm - acc_ppm) AS BIGINT) AS gap_ppm
       |  FROM bins),
       |e AS (
       |  SELECT CAST(sum(CAST(n AS HUGEINT) * gap_ppm) // sum(n)
       |    AS BIGINT) AS ece_ppm
       |  FROM g)
       |SELECT g.bin, g.n, g.mean_conf_ppm, g.acc_ppm, g.gap_ppm,
       |  e.ece_ppm
       |FROM g CROSS JOIN e ORDER BY bin""".stripMargin
  }

  // ---- q138: temperature-weighted multilingual sampling ---------------

  /** q138: temperature-based multilingual sampling allocation — the
    * α-smoothed language mixture every multilingual training corpus
    * is drawn with (Lample & Conneau 2019; XLM-R's p_l^α
    * renormalization), at α = 1/2 so the whole computation stays in
    * correctly-rounded territory: share·10¹² is exact BIGINT
    * arithmetic, IEEE 754 requires sqrt to be correctly rounded, and
    * floor pins the result — both engines produce the identical
    * weight with NO libm-variance (pow(x, 0.3) would not be
    * reproducible across engines; sqrt is).
    *
    * Per language: corpus share (ppm), the α=½ weight w = ⌊√(share·
    * 10¹²)⌋, the resampled document allocation under a same-size
    * budget, and the boost each language receives (alloc/n, ppm) —
    * low-resource languages get boost > 1, the head language < 1.
    *
    * Scale shape: one |langs|-group aggregate with map-side combine,
    * then 1-row totals broadcast twice (corpus size, Σw) — the
    * q36/q55 totals shape; nothing wider than the language list ever
    * shuffles. */
  def q138LangSampling(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(s, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      expr("CAST(sum(n_docs) AS BIGINT)").as("n_corpus"))
    val w = counts.crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000" +
          " div n_corpus AS BIGINT)"))
      .withColumn("w_e6",
        expr("CAST(floor(sqrt(CAST(CAST(n_docs AS DECIMAL(38,0))" +
          " * 1000000000000 div n_corpus AS DOUBLE))) AS BIGINT)"))
    val sw = w.agg(expr("CAST(sum(w_e6) AS BIGINT)").as("sum_w"))
    w.crossJoin(broadcast(sw))
      .withColumn("alloc_docs",
        expr("CAST(CAST(w_e6 AS DECIMAL(38,0)) * n_corpus div sum_w" +
          " AS BIGINT)"))
      .withColumn("boost_ppm",
        expr("CAST(CAST(alloc_docs AS DECIMAL(38,0)) * 1000000" +
          " div n_docs AS BIGINT)"))
      .select(col("lang"), col("n_docs"), col("n_corpus"),
        col("share_ppm"), col("w_e6"), col("alloc_docs"),
        col("boost_ppm"))
      .orderBy(col("lang"))
  }

  val q138LangSamplingOracle: String =
    """WITH c AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_corpus FROM c),
      |w AS (
      |  SELECT lang, n_docs, n_corpus,
      |    CAST(CAST(n_docs AS HUGEINT) * 1000000 // n_corpus
      |      AS BIGINT) AS share_ppm,
      |    CAST(floor(sqrt(CAST(CAST(n_docs AS HUGEINT)
      |      * 1000000000000 // n_corpus AS DOUBLE))) AS BIGINT) AS w_e6
      |  FROM c CROSS JOIN t),
      |s AS (SELECT CAST(sum(w_e6) AS BIGINT) AS sum_w FROM w)
      |SELECT lang, n_docs, n_corpus, share_ppm, w_e6,
      |  CAST(CAST(w_e6 AS HUGEINT) * n_corpus // sum_w AS BIGINT)
      |    AS alloc_docs,
      |  CAST(CAST(CAST(w_e6 AS HUGEINT) * n_corpus // sum_w AS HUGEINT)
      |    * 1000000 // n_docs AS BIGINT) AS boost_ppm
      |FROM w CROSS JOIN s ORDER BY lang""".stripMargin
}
