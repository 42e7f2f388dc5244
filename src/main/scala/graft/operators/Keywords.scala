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
}
