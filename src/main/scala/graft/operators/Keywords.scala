package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokensSql

/** Corpus keyword extraction — RAKE (Rapid Automatic Keyword
  * Extraction, Rose et al. 2010): candidate phrases are the maximal
  * stopword-free token runs, words are scored degree/frequency over
  * the phrase co-occurrence graph, and a phrase scores the sum of its
  * word scores. The unsupervised keyword pass a data-curation
  * pipeline runs to label crawl slices before any model exists.
  */
object Keywords {

  /** The ta_stats stopword inventory — RAKE's phrase delimiters. */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "in", "is", "to")
  /** Candidate phrases longer than this are discarded outright (RAKE
    * convention: overlong runs are boilerplate, not keyphrases). */
  val RakeMaxLen = 4
  /** Keyphrases reported. */
  val RakeTopK = 25

  /** q105: RAKE keyphrases over `documents` — returns (phrase,
    * n_words, n_occur, score_e3), the [[RakeTopK]] highest-scoring
    * candidate phrases.
    *
    * Word score = deg(w)·1000 div freq(w), where freq counts the
    * word's occurrences inside candidate phrases and deg sums the
    * lengths of the phrases it occurs in (degree in RAKE's word
    * co-occurrence graph, self-loops included); phrase score = Σ
    * member word scores (with multiplicity). All integer arithmetic.
    *
    * Plan shape: ONE corpus pass to position-indexed tokens; island
    * detection (grp = pos − rank among non-stop positions) and
    * phrase assembly ride a single doc_id-keyed shuffle — per-task
    * state is one document's token run, so document count scales
    * out; word stats and phrase scores are phrase-TYPE/vocab-scale
    * aggregates (sublinear in corpus); the final cut is
    * TakeOrderedAndProject. 100 TB: one corpus-scale shuffle
    * (doc-keyed), everything downstream on type tables. */
  def q105RakeKeywords(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(!col("tok").isInCollection(StopWords))
    // islands of consecutive non-stop positions: pos − rank is
    // constant exactly within a run
    val phr = toks
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(sort_array(collect_list(struct(col("pos"), col("tok"))))
        .as("ms"))
      .select(col("doc_id"), col("grp"),
        transform(col("ms"), m => m.getField("tok")).as("ws"))
      .filter(size(col("ws")) <= RakeMaxLen)
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("phrase", array_join(col("ws"), " "))
      // three consumers (word stats, member join, occurrence count):
      // one materialization of the phrase table
      .localCheckpoint(false)
    val members = phr.select(col("doc_id"), col("grp"), col("phrase"),
      col("n_words"), explode(col("ws")).as("w"))
    val wstats = members.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
      .withColumn("wscore_e3", expr("deg * 1000 div freq"))
    members.join(wstats.select(col("w"), col("wscore_e3")), "w")
      .groupBy(col("doc_id"), col("grp"), col("phrase"), col("n_words"))
      .agg(sum(col("wscore_e3")).as("s"))
      .groupBy(col("phrase"))
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occur"), max(col("s")).as("score_e3"))
      .orderBy(col("score_e3").desc, col("phrase").asc)
      .limit(RakeTopK)
  }

  val q105RakeKeywordsOracle: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("(", ",", ")")
    s"""WITH tl AS (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |toks AS (
       |  SELECT doc_id, pt.pos AS pos, pt.tok AS tok FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      range(1, len(t) + 1),
       |      i -> {'pos': i, 'tok': t[i]})) AS pt
       |    FROM tl)
       |  WHERE pt.tok NOT IN $stopList),
       |isl AS (
       |  SELECT doc_id, pos, tok,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |      AS grp
       |  FROM toks),
       |phr AS (
       |  SELECT doc_id, grp,
       |    string_agg(tok, ' ' ORDER BY pos) AS phrase,
       |    CAST(count(*) AS BIGINT) AS n_words
       |  FROM isl GROUP BY doc_id, grp
       |  HAVING count(*) <= $RakeMaxLen),
       |members AS (
       |  SELECT i.doc_id, i.grp, p.phrase, p.n_words, i.tok AS w
       |  FROM isl i JOIN phr p
       |    ON i.doc_id = p.doc_id AND i.grp = p.grp),
       |wstats AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
       |    CAST(sum(n_words) AS BIGINT) AS deg
       |  FROM members GROUP BY w),
       |pocc AS (
       |  SELECT m.doc_id, m.grp, m.phrase, m.n_words,
       |    CAST(sum(deg * 1000 // freq) AS BIGINT) AS s
       |  FROM members m JOIN wstats ws ON m.w = ws.w
       |  GROUP BY m.doc_id, m.grp, m.phrase, m.n_words)
       |SELECT phrase, max(n_words) AS n_words,
       |  count(*) AS n_occur, max(s) AS score_e3
       |FROM pocc GROUP BY phrase
       |ORDER BY score_e3 DESC, phrase ASC
       |LIMIT $RakeTopK""".stripMargin
  }
  // ---- q136: collocation lift over windowed token pairs ---------------

  /** Pair-count floor and report size for q136. */
  val CollocMinPairs = 5L
  val CollocTopK = 40

  /** q136: collocation extraction by association lift over windowed
    * token co-occurrence (the PMI family — Church & Hanks 1990 —
    * kept in exact fixed point by reporting the RATIO
    * c_ab·N/(c_a·c_b) ×10⁶ instead of its log: log is libm and not
    * correctly rounded, the ratio is pure integer arithmetic, and
    * log is monotone so the ranking is THE PMI ranking). Pairs are
    * unordered token pairs within a forward window of 2 positions,
    * canonicalized lexicographically; pairs seen fewer than
    * [[CollocMinPairs]] times are dropped (PMI's rare-pair
    * pathology), and the report is the top [[CollocTopK]] by
    * (lift desc, pair asc).
    *
    * Scale shape: pair generation is IN-ROW (array transform over
    * the token array — map-only, ~2 pairs per token); counting is
    * two map-side-combined groupBys (pair-type and token-type
    * scale); marginals attach by two token-keyed equi-joins on the
    * already-collapsed pair-count table; the total is a 1-row
    * broadcast; selection is TakeOrderedAndProject. Nothing
    * occurrence-scale ever rides a shuffle. The ×10⁶ lift numerator
    * is DECIMAL(38,0)/HUGEINT-widened: exact through ~3·10¹⁵ tokens
    * (N²·10⁶ < 10³⁸), far past a 100 TB text corpus. */
  def q136Collocations(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.load(s, dir, "documents"))
      .select(TextAnalysis.tokens(col("text")).as("t"))
      // the token arrays feed pair, unigram, and total arms — one
      // scan + one kernel pass, reused
      .localCheckpoint(true)
    val pairs = docs.select(explode(expr(
      "CASE WHEN size(t) >= 2 THEN" +
        " flatten(transform(sequence(1, size(t) - 1), i ->" +
        "   transform(sequence(i + 1, least(i + 2, size(t))), j ->" +
        "     concat(least(element_at(t, i), element_at(t, j)), ' '," +
        "       greatest(element_at(t, i), element_at(t, j))))))" +
        " ELSE CAST(array() AS ARRAY<STRING>) END")).as("pair"))
    val cp = pairs.groupBy(col("pair")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CollocMinPairs)
    val uni = docs.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val tot = docs.agg(
      expr("CAST(sum(size(t)) AS BIGINT)").as("n_tok"))
    cp.withColumn("w1", expr("split_part(pair, ' ', 1)"))
      .withColumn("w2", expr("split_part(pair, ' ', 2)"))
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"),
        col("c_b"),
        expr("CAST(CAST(c_ab AS DECIMAL(38,0)) * n_tok * 1000000" +
          " div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)")
          .as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("w1"), col("w2"))
      .limit(CollocTopK)
  }

  val q136CollocationsOracle: String =
    s"""WITH tok AS (SELECT $tokensSql AS t FROM documents),
       |pairs AS (
       |  SELECT unnest(flatten(list_transform(range(1, len(t)), i ->
       |    list_transform(range(i + 1, least(i + 2, len(t)) + 1), j ->
       |      least(t[i], t[j]) || ' ' || greatest(t[i], t[j])))))
       |    AS pair
       |  FROM tok WHERE len(t) >= 2),
       |cp AS (
       |  SELECT pair, CAST(count(*) AS BIGINT) AS c_ab
       |  FROM pairs GROUP BY pair HAVING count(*) >= $CollocMinPairs),
       |uc AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c_w
       |  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
       |tot AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tok FROM tok)
       |SELECT split_part(pair, ' ', 1) AS w1,
       |  split_part(pair, ' ', 2) AS w2,
       |  c_ab, a.c_w AS c_a, b.c_w AS c_b,
       |  CAST(CAST(c_ab AS HUGEINT) * n_tok * 1000000
       |    // (CAST(a.c_w AS HUGEINT) * b.c_w) AS BIGINT) AS lift_e6
       |FROM cp
       |JOIN uc a ON a.w = split_part(pair, ' ', 1)
       |JOIN uc b ON b.w = split_part(pair, ' ', 2)
       |CROSS JOIN tot
       |ORDER BY lift_e6 DESC, w1, w2 LIMIT $CollocTopK""".stripMargin

  /** Pinned TextRank power-iteration rounds (oracle unrolls them). */
  val TrRounds = 3
  /** Rank scale (uniform init = one unit). */
  val TrScale = 1000000L

  /** q164: TextRank word ranking (Mihalcea & Tarau 2004) — weighted
    * PageRank over the word co-occurrence graph (adjacent-token
    * pairs, self-loops dropped, symmetrized with corpus bigram counts
    * as weights): the graph-centrality complement to RAKE's
    * degree/frequency scores and q136's pairwise lift (a word ranks
    * high when it co-occurs with other high-ranking words, not merely
    * often).
    *
    * Engine-exact iteration, the q65/q158 discipline: ranks are
    * ×10⁶ integers seeded uniform; each of the [[TrRounds]] pinned
    * rounds applies
    *   r'(v) = 150000 + 850·(Σ_{u∼v} w_uv·r(u) div S_u) div 1000
    * (d = 0.85; S_u = Σ_w w_uw the node strength) with PER-EDGE
    * truncating division — declared part of the spec and unrolled
    * identically in the oracle, so both engines compute the same
    * not-yet-converged iterate bit-for-bit. Every node of the
    * symmetric graph has an in-edge, so each round re-ranks the full
    * vocabulary.
    *
    * 100 TB posture: ONE corpus-scale exchange (the bigram count,
    * map-side combined) collapses to the vocabulary-scale edge list;
    * the rounds join edge/strength/rank tables that are all
    * vocab-bounded, each behind a per-round barrier (the q158
    * plan-geometry lesson). Output: (token, rank_e6, strength),
    * rank-descending. */
  def q164Textrank(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.load(s, dir, "documents"))
    val bi = docs
      .select(explode(graft.functions.TextStatFunctions
        .tokenNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("w"))
      .select(split(col("bigram"), " ").getItem(0).as("u"),
        split(col("bigram"), " ").getItem(1).as("v"), col("w"))
      .filter(col("u") =!= col("v"))
    val edges = bi.unionByName(bi.select(col("v").as("u"),
        col("u").as("v"), col("w")))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
      .localCheckpoint(false) // every round + the strength read it
    val strength = edges.groupBy(col("u")).agg(sum(col("w")).as("su"))
      .localCheckpoint(false) // every round + the report read it
    var r = strength.select(col("u").as("tok"), lit(TrScale).as("r"))
    for (_ <- 1 to TrRounds) {
      r = edges
        .join(r, col("u") === col("tok"))
        .join(strength, Seq("u"))
        .select(col("v"),
          expr("CAST(w AS DECIMAL(38,0)) * r div su").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("sc"))
        .select(col("v").as("tok"),
          expr("CAST(150000 + 850 * sc div 1000 AS BIGINT)").as("r"))
        .localCheckpoint(false)
    }
    r.join(strength, col("tok") === col("u"))
      .select(col("tok").as("token"), col("r").as("rank_e6"),
        col("su").as("strength"))
      .orderBy(col("rank_e6").desc, col("token"))
  }

  val q164TextrankOracle: String = {
    def round(n: Int, prev: String): String =
      s"""c$n AS MATERIALIZED (
         |  SELECT e.v,
         |    sum(CAST(e.w AS HUGEINT) * r.r // st.su) AS sc
         |  FROM e JOIN $prev r ON r.tok = e.u
         |    JOIN st ON st.u = e.u
         |  GROUP BY e.v),
         |r$n AS MATERIALIZED (
         |  SELECT v AS tok,
         |    CAST(150000 + 850 * sc // 1000 AS BIGINT) AS r
         |  FROM c$n)""".stripMargin
    val rounds = (1 to TrRounds)
      .map(n => round(n, s"r${n - 1}")).mkString(",\n")
    s"""WITH toks AS (SELECT $tokensSql AS t FROM documents),
       |bi0 AS (
       |  SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT string_split(bigram, ' ')[1] AS u,
       |      string_split(bigram, ' ')[2] AS v
       |    FROM (SELECT unnest(list_transform(
       |        range(1, greatest(len(t) - 1, 0) + 1),
       |        i -> t[i] || ' ' || t[i + 1])) AS bigram FROM toks))
       |  WHERE u <> v GROUP BY 1, 2),
       |e AS MATERIALIZED (
       |  SELECT u, v, CAST(sum(w) AS BIGINT) AS w FROM (
       |    SELECT u, v, w FROM bi0
       |    UNION ALL SELECT v, u, w FROM bi0)
       |  GROUP BY 1, 2),
       |st AS MATERIALIZED (
       |  SELECT u, CAST(sum(w) AS BIGINT) AS su FROM e GROUP BY 1),
       |r0 AS MATERIALIZED (
       |  SELECT u AS tok, CAST($TrScale AS BIGINT) AS r FROM st),
       |$rounds
       |SELECT r$TrRounds.tok AS token, r$TrRounds.r AS rank_e6,
       |  st.su AS strength
       |FROM r$TrRounds JOIN st ON st.u = r$TrRounds.tok
       |ORDER BY rank_e6 DESC, token""".stripMargin
  }
}
