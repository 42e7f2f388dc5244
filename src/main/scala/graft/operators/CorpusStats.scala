package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokensSql

/** Corpus-level lexical statistics — the measurements a training-data
  * team runs before spending tokenizer/model budget on a crawl:
  * vocabulary growth (Heaps' law curve, q142), per-source lexical
  * diversity (Simpson/dominance indices, q143), and the
  * vocabulary-budget coverage curve (Zipf coverage, q145 — what OOV
  * rate does a V-token vocabulary buy on THIS corpus).
  *
  * House rules throughout: exact integer/DECIMAL arithmetic (a log-
  * or pow-based diversity index is not bit-reproducible across
  * engines — the q136 PMI argument), cumulative scans via the
  * OrderStats Blelloch bucket machinery (never an unpartitioned
  * Window), and per-token aggregation with map-side combine as the
  * only corpus-scale exchange.
  */
object CorpusStats {

  /** q142: Heaps'-law vocabulary-growth curve — cumulative distinct
    * vocabulary after ingesting each decile of the corpus in doc_id
    * order, the curve V(n) whose flattening tells a tokenizer team
    * when more crawl stops buying vocabulary (Heaps 1978; Baeza-Yates
    * & Ribeiro-Neto's standard formulation). One row per decile:
    * (decile, n_docs, n_tokens, vocab) — n_tokens the cumulative
    * token OCCURRENCES (the Heaps x-axis), vocab the cumulative
    * distinct-token count.
    *
    * Exactness without a global sort: a token's contribution to the
    * curve is fully described by its FIRST document (min doc_id
    * containing it) — a token-keyed aggregate — so per-doc
    * new-vocabulary counts are corpus-derived once, and the three
    * cumulative series (doc rank, token occurrences, new vocabulary)
    * are exact [[OrderStats.prefixCounts]] bucket scans over the
    * DOC-COUNT-scale per-doc table (no unpartitioned Window; the
    * doc table is sublinear in corpus bytes). Decile report rows are
    * an equi-join of rank against the 10 computed boundary ranks.
    *
    * 100 TB posture: one corpus-scale exchange (token → min doc_id,
    * map-side combined); everything after runs at doc-count or
    * vocabulary scale. */
  def q142HeapsLaw(s: SparkSession, dir: String): DataFrame = {
    // token-keyed min-doc: the ONLY corpus-scale exchange in the query
    val firsts = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("tok"))
      .groupBy(col("tok"))
      .agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nv"))
    // separate map-only scan for per-doc token totals — no postings
    // checkpoint needed, and zero-token docs stay in the curve
    val perDoc = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .join(firsts, Seq("doc_id"), "left")
      .select(col("doc_id"), lit(1L).as("one"), col("nt"),
        coalesce(col("nv"), lit(0L)).as("nv"))
      .localCheckpoint(false) // three scans + the count read it
    val rank = OrderStats.prefixCounts(perDoc, "doc_id", "one")
      .select(col("doc_id"), col("cum").as("rk"))
    val toks = OrderStats.prefixCounts(perDoc, "doc_id", "nt")
      .select(col("doc_id"), col("cum").as("toks"))
    val vocab = OrderStats.prefixCounts(perDoc, "doc_id", "nv")
      .select(col("doc_id"), col("cum").as("vocab"))
    val n = perDoc.agg(count(lit(1)).as("n_total"))
    val deciles = s.range(1, 11).toDF("decile")
      .crossJoin(broadcast(n))
      .select(col("decile"),
        greatest(lit(1L), expr("decile * n_total div 10")).as("rk"))
    rank.join(toks, "doc_id").join(vocab, "doc_id")
      .join(broadcast(deciles), "rk")
      .select(col("decile"), col("rk").as("n_docs"),
        col("toks").as("n_tokens"), col("vocab"))
      .orderBy(col("decile"))
  }

  val q142HeapsLawOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id, len($tokensSql) AS nt,
       |    unnest(list_distinct($tokensSql)) AS tok
       |  FROM documents),
       |firsts AS (
       |  SELECT tok, min(doc_id) AS doc_id FROM tok GROUP BY tok),
       |newv AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nv
       |  FROM firsts GROUP BY doc_id),
       |per AS (
       |  SELECT t.doc_id, CAST(any_value(t.nt) AS BIGINT) AS nt,
       |    CAST(coalesce(any_value(n.nv), 0) AS BIGINT) AS nv
       |  FROM tok t LEFT JOIN newv n ON n.doc_id = t.doc_id
       |  GROUP BY t.doc_id),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rk,
       |    CAST(sum(nt) OVER (ORDER BY doc_id) AS BIGINT) AS toks,
       |    CAST(sum(nv) OVER (ORDER BY doc_id) AS BIGINT) AS vocab
       |  FROM per),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM per)
       |SELECT CAST(d.decile AS BIGINT) AS decile, sc.rk AS n_docs,
       |  sc.toks AS n_tokens, sc.vocab AS vocab
       |FROM (SELECT unnest(range(1, 11)) AS decile) d, n
       |JOIN sc ON sc.rk = greatest(1, (d.decile * n.n_total) // 10)
       |ORDER BY decile""".stripMargin

  /** q143: per-source lexical diversity — Simpson's concentration
    * index λ = Σ c_i(c_i−1) / (N(N−1)) (the probability two tokens
    * drawn without replacement are the same type; Simpson 1949 —
    * the unbiased finite-sample form) and the Berger–Parker
    * dominance index max c_i / N, both in exact ppm, next to raw
    * (n_tokens, vocab). A template-generated or boilerplate-heavy
    * source shows high concentration before any model ever sees it —
    * the cheap pre-training screen next to q52's repetition gate.
    *
    * Integer-exactness: both indices are pure count ratios — no log,
    * no float (a Shannon-entropy variant would not be bit-stable
    * across engines). c_i·(c_i−1) and N·(N−1) widen to DECIMAL(38,0)
    * (BIGINT² overflows at warehouse scale — the q114 lift rule).
    *
    * 100 TB posture: one (source, token)-keyed corpus-scale exchange
    * with map-side combine, then a source-keyed aggregate at
    * vocabulary scale. */
  def q143SimpsonDiversity(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        max(col("c")).as("maxc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).as("ss"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        expr("""CAST(ss * 1000000
                div (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))
                AS BIGINT)""").as("simpson_ppm"),
        expr("""CAST(CAST(maxc AS DECIMAL(38,0)) * 1000000
                div n_tokens AS BIGINT)""").as("dominance_ppm"))
      .orderBy(col("source"))
  }

  val q143SimpsonDiversityOracle: String =
    s"""WITH tok AS (
       |  SELECT source, unnest($tokensSql) AS tok FROM documents),
       |cnt AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM tok GROUP BY source, tok),
       |agg AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS vocab,
       |    CAST(max(c) AS BIGINT) AS maxc,
       |    sum(CAST(c AS HUGEINT) * (c - 1)) AS ss
       |  FROM cnt GROUP BY source)
       |SELECT source, n_tokens, vocab,
       |  CAST(ss * 1000000
       |    // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
       |    AS BIGINT) AS simpson_ppm,
       |  CAST(CAST(maxc AS HUGEINT) * 1000000 // n_tokens AS BIGINT)
       |    AS dominance_ppm
       |FROM agg ORDER BY source""".stripMargin

  /** Vocabulary budgets evaluated by q145 — power-of-4 ladder from
    * the subword regime to the full-word regime. */
  val ZipfBudgets: Seq[Long] = Seq(1000L, 4000L, 16000L, 64000L)

  /** q145: Zipf coverage curve — for each vocabulary budget V in
    * [[ZipfBudgets]], the exact fraction of corpus token OCCURRENCES
    * covered by the V most frequent types (ties broken by taking the
    * partial tie band at the cut frequency), i.e. 1 − OOV rate under
    * a V-type vocabulary. The tokenizer-budget planning complement
    * of q142: Heaps says how vocabulary grows with corpus, this says
    * what a budget buys (Zipf 1949; the coverage-vs-budget table in
    * every tokenizer paper's appendix).
    *
    * Exact tie handling without a global rank sort: group types BY
    * FREQUENCY — per distinct frequency f, m(f) types and f·m(f)
    * occurrences — then two [[OrderStats.prefixCounts]] scans keyed
    * on −f (descending frequency) give cum_types(f) and cum_occ(f);
    * the budget cut lands at the smallest prefix with
    * cum_types ≥ V, and the partial band is subtracted exactly:
    * covered = cum_occ − (cum_types − V)·f. The frequency table is
    * FREQUENCY-DISTINCT scale (≪ vocabulary ≪ corpus); the budget
    * probe is a 4-row broadcast nonequi join resolved by min().
    *
    * 100 TB posture: one token-keyed corpus-scale exchange; the
    * scans and probes run at frequency-histogram scale. */
  def q145ZipfCoverage(s: SparkSession, dir: String): DataFrame = {
    val freqs = Tables.spread(Tables.load(s, dir, "documents"))
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val byf = freqs.groupBy(col("f"))
      .agg(count(lit(1)).as("m"),
        (col("f") * count(lit(1))).as("occ"))
      .withColumn("negf", -col("f"))
      .localCheckpoint(false) // two scans + totals read it
    val types = OrderStats.prefixCounts(byf, "negf", "m")
      .select(col("negf"), col("cum").as("cum_types"))
    val occ = OrderStats.prefixCounts(byf, "negf", "occ")
      .select(col("negf"), col("cum").as("cum_occ"))
    val scan = byf.join(types, "negf").join(occ, "negf")
    val totals = byf.agg(sum(col("m")).as("vocab_total"),
      sum(col("occ")).as("total_occ"))
    val budgets = s.createDataFrame(
        ZipfBudgets.map(Tuple1.apply)).toDF("v_budget")
    // smallest descending-frequency prefix reaching the budget;
    // a budget beyond the vocabulary covers everything (cut = null)
    val cuts = broadcast(budgets)
      .join(scan, col("cum_types") >= col("v_budget"), "left")
      .groupBy(col("v_budget"))
      .agg(min(col("negf")).as("cut_negf"))
    cuts.join(scan, col("cut_negf") === col("negf"), "left")
      .crossJoin(broadcast(totals))
      .select(col("v_budget"),
        col("vocab_total"),
        col("total_occ"),
        coalesce(
          col("cum_occ") - (col("cum_types") - col("v_budget")) *
            (-col("negf")),
          col("total_occ")).as("covered_occ"))
      .withColumn("coverage_ppm", expr(
        """CAST(CAST(covered_occ AS DECIMAL(38,0)) * 1000000
           div total_occ AS BIGINT)"""))
      .orderBy(col("v_budget"))
  }

  val q145ZipfCoverageOracle: String = {
    val budgets = ZipfBudgets.mkString(", ")
    s"""WITH tok AS (
       |  SELECT unnest($tokensSql) AS tok FROM documents),
       |freqs AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS f
       |  FROM tok GROUP BY tok),
       |byf AS (
       |  SELECT f, CAST(count(*) AS BIGINT) AS m,
       |    CAST(f * count(*) AS BIGINT) AS occ
       |  FROM freqs GROUP BY f),
       |sc AS (
       |  SELECT f,
       |    CAST(sum(m) OVER (ORDER BY f DESC) AS BIGINT) AS cum_types,
       |    CAST(sum(occ) OVER (ORDER BY f DESC) AS BIGINT) AS cum_occ
       |  FROM byf),
       |tot AS (
       |  SELECT CAST(sum(m) AS BIGINT) AS vocab_total,
       |    CAST(sum(occ) AS BIGINT) AS total_occ FROM byf),
       |bud AS (SELECT unnest([$budgets]) AS v_budget),
       |cut AS (
       |  SELECT b.v_budget, max(sc.f) AS cut_f
       |  FROM bud b LEFT JOIN sc ON sc.cum_types >= b.v_budget
       |  GROUP BY b.v_budget)
       |SELECT CAST(c.v_budget AS BIGINT) AS v_budget,
       |  t.vocab_total, t.total_occ,
       |  CAST(coalesce(
       |    sc.cum_occ - (sc.cum_types - c.v_budget) * sc.f,
       |    t.total_occ) AS BIGINT) AS covered_occ,
       |  CAST(CAST(coalesce(
       |      sc.cum_occ - (sc.cum_types - c.v_budget) * sc.f,
       |      t.total_occ) AS HUGEINT) * 1000000 // t.total_occ
       |    AS BIGINT) AS coverage_ppm
       |FROM cut c LEFT JOIN sc ON sc.f = c.cut_f, tot t
       |ORDER BY v_budget""".stripMargin
  }

  /** q157: held-out n-gram (3-word) coverage — the context-coverage
    * audit an n-gram LM or decontamination pipeline runs before
    * trusting a train/eval split: the TRAIN split's distinct trigram
    * inventory (doc_id % 10 != 0) is evaluated on the HELD-OUT split
    * (doc_id % 10 == 0), per language: trigram occurrences, unseen
    * occurrences and types, unseen_rate_e6. The unigram vocabulary
    * of this corpus is closed (every held-out WORD appears in train
    * at every scale — measured before building, the q154 vacuity
    * lesson), so the value-bearing level is the trigram space, which
    * is sparse at every scale (the q107/q129 shingle-space regime);
    * this is also exactly the backoff rate q98's Kneser–Ney
    * smoothing exists to absorb.
    *
    * 100 TB posture: one trigram-keyed distinct exchange builds the
    * train inventory; the held-out side (1/10 of occurrences) joins
    * it on the trigram key and folds to #languages rows in one
    * map-side-combined aggregate. No all-pairs, no windows. */
  def q157NgramCoverage(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis.tokens
    val t = tokens(col("text"))
    val tri = when(size(t) >= 3,
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1),
          element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    val grams = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), explode(tri).as("g"))
    val seen = grams.filter(col("doc_id") % 10 =!= 0)
      .select(col("g")).distinct()
      .withColumn("in_train", lit(1L))
    grams.filter(col("doc_id") % 10 === 0)
      .join(seen, Seq("g"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("in_train").isNull, 1L).otherwise(0L))
          .as("n_unseen"),
        countDistinct(when(col("in_train").isNull, col("g")))
          .as("n_unseen_types"))
      .withColumn("unseen_rate_e6",
        expr("n_unseen * 1000000 div n_ngrams"))
      .select(col("lang"), col("n_ngrams"), col("n_unseen"),
        col("n_unseen_types"), col("unseen_rate_e6"))
      .orderBy(col("lang"))
  }

  val q157NgramCoverageOracle: String = {
    val tri = s"""list_transform(range(1, len(t) - 1),
       | i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])"""
      .stripMargin.replace("\n", "")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, $tokensSql AS t FROM documents),
       |grams AS (
       |  SELECT doc_id, lang, unnest($tri) AS g FROM toks
       |  WHERE len(t) >= 3),
       |seen AS (
       |  SELECT DISTINCT g FROM grams WHERE doc_id % 10 <> 0),
       |held AS (
       |  SELECT gr.lang, gr.g, seen.g IS NOT NULL AS in_train
       |  FROM grams gr LEFT JOIN seen ON seen.g = gr.g
       |  WHERE gr.doc_id % 10 = 0)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_ngrams,
       |  CAST(sum(CASE WHEN in_train THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_unseen,
       |  CAST(count(DISTINCT CASE WHEN in_train THEN NULL ELSE g END)
       |    AS BIGINT) AS n_unseen_types,
       |  CAST(sum(CASE WHEN in_train THEN 0 ELSE 1 END) * 1000000
       |    // count(*) AS BIGINT) AS unseen_rate_e6
       |FROM held GROUP BY lang ORDER BY lang""".stripMargin
  }
}
