package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokensSql

/** Language-model estimation beyond q75's maximum-likelihood scorer:
  * q98 trains interpolated Kneser–Ney smoothed bigram probabilities
  * (the KenLM/SRILM standard a CCNet-style quality filter actually
  * deploys), and q99 measures corpus n-gram novelty over ingestion
  * order (the diminishing-returns curve data-curation planning reads
  * before buying more of the same crawl). All arithmetic is exact
  * integer/decimal so the DuckDB oracle agrees bit for bit.
  */
object Lm {

  /** DuckDB n-gram builder over a token-list column `t` (the q75
    * bigram chain generalized to n). */
  private[operators] def ngramsSql(n: Int): String =
    s"unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1), " +
      "i -> t[i]" +
      (1 until n).map(k => s" || ' ' || t[i + $k]").mkString + "))"

  /** Bigrams reported by q98. */
  val KnTopK = 40

  /** q98: interpolated Kneser–Ney bigram probabilities for the
    * [[KnTopK]] most frequent bigrams, next to their ML estimate:
    * (bigram, c12, c1, n1a, n1b, p_kn_e9, ml_e9).
    *
    * With discount D = 3/4 (Kneser & Ney 1995; Chen & Goodman 1998):
    *
    *   P_KN(w2|w1) = max(c12 − D, 0)/c1
    *               + (D·N1+(w1,·)/c1) · (N1+(·,w2)/Nb)
    *
    * where c1 = Σ_w c(w1,w) (prefix mass), N1+(w1,·) = distinct
    * continuations of w1 (n1a), N1+(·,w2) = distinct predecessors of
    * w2 — the CONTINUATION count that makes KN the right smoother
    * (a word seen in many contexts gets backoff mass, a frequent but
    * context-bound word does not) — and Nb = distinct bigram types.
    * Over the common denominator 4·c1·Nb the whole thing is one
    * integer ratio: p_kn_e9 = (max(4·c12−3, 0)·Nb + 3·n1a·n1b)·10⁹
    * div (4·c1·Nb), computed in DECIMAL(38,0)/HUGEINT (the q55
    * lift) so no corpus size overflows it.
    *
    * Plan shape: ONE corpus pass to bigram counts (map-side combined
    * groupBy); everything after runs on the bigram-TYPE table —
    * prefix/continuation aggregates are vocab-sized, Nb is a 1-row
    * broadcast (the q55 totals shape, allow-listed), top-k is
    * TakeOrderedAndProject. 100 TB: the only data-scale shuffle is
    * the bigram count; type-level joins shuffle O(vocab). */
  def q98KnBigram(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextStatFunctions.tokenNgrams
    // the one corpus-scale pass; localCheckpoint: four consumers
    // (prefix agg, continuation agg, Nb, top-k) would each re-run
    // the shingle kernel otherwise
    val bi = Tables.spread(Tables.load(s, dir, "documents"))
      .select(explode(tokenNgrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .localCheckpoint(false)
    val pre = bi.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1a"))
    val post = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val nbt = bi.agg(count(lit(1)).as("nb"))
    bi.orderBy(col("c12").desc, col("bigram")).limit(KnTopK)
      .join(pre, "w1").join(post, "w2")
      .crossJoin(broadcast(nbt))
      .withColumn("p_kn_e9", expr(
        "(greatest(4 * c12 - 3, 0) * CAST(nb AS DECIMAL(38,0))" +
          " + 3 * n1a * n1b) * 1000000000" +
          " div (4 * CAST(c1 AS DECIMAL(38,0)) * nb)"))
      .withColumn("ml_e9",
        expr("CAST(c12 AS DECIMAL(38,0)) * 1000000000 div c1"))
      .select(col("bigram"), col("c12"), col("c1"), col("n1a"),
        col("n1b"), col("p_kn_e9"), col("ml_e9"))
      .orderBy(col("c12").desc, col("bigram"))
  }

  val q98KnBigramOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |bi AS (
       |  SELECT bigram, CAST(count(*) AS BIGINT) AS c12,
       |    string_split(bigram, ' ')[1] AS w1,
       |    string_split(bigram, ' ')[2] AS w2
       |  FROM (SELECT ${ngramsSql(2)} AS bigram FROM toks)
       |  GROUP BY bigram),
       |pre AS (
       |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
       |    CAST(count(*) AS BIGINT) AS n1a
       |  FROM bi GROUP BY w1),
       |post AS (
       |  SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM bi GROUP BY w2),
       |nbt AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bi),
       |topk AS (
       |  SELECT bigram, c12, w1, w2 FROM bi
       |  ORDER BY c12 DESC, bigram LIMIT $KnTopK)
       |SELECT t.bigram, t.c12, pre.c1, pre.n1a, post.n1b,
       |  CAST((CAST(greatest(4 * t.c12 - 3, 0) AS HUGEINT) * nb
       |      + 3 * n1a * n1b) * 1000000000
       |    // (4 * CAST(c1 AS HUGEINT) * nb) AS BIGINT) AS p_kn_e9,
       |  CAST(CAST(t.c12 AS HUGEINT) * 1000000000 // c1 AS BIGINT)
       |    AS ml_e9
       |FROM topk t JOIN pre USING (w1) JOIN post USING (w2)
       |CROSS JOIN nbt
       |ORDER BY c12 DESC, bigram""".stripMargin

  /** Docs per novelty bucket (ingestion-order cohorts). */
  val NovBucket = 50L

  /** q99: n-gram novelty over ingestion order — bucket documents by
    * doc_id into [[NovBucket]]-doc cohorts and report, per cohort,
    * how many distinct 3-grams the corpus saw THERE FIRST next to
    * the cohort's total gram volume: (bucket, n_new_grams,
    * n_gram_occurrences, novelty_e4).
    *
    * The decaying n_new_grams/occurrences ratio is the
    * diminishing-returns curve of continued crawling — the
    * data-scaling-law input (how much NEW text a marginal cohort
    * buys) and the same first-seen statistic deduplication research
    * reports as "fraction of novel text" (Lee et al. 2022 read it
    * per-duplicate-cluster; here it is read per ingestion cohort).
    *
    * Plan shape: one corpus pass → groupBy (gram, bucket) with
    * map-side combine (never materializing the occurrence stream);
    * first-seen = min(bucket) per gram (bucket is monotone in
    * doc_id, so min-bucket ≡ bucket of min doc_id); both report
    * arms are gram-TYPE-scale aggregates. 100 TB: two shuffles, both
    * keyed on the gram digest space — the q69 distribution shape. */
  def q99NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextStatFunctions.tokenNgrams
    val gb = Tables.spread(Tables.load(s, dir, "documents"))
      .select(expr(s"doc_id div $NovBucket").as("bucket"),
        explode(tokenNgrams(col("text"), 3)).as("g"))
      .groupBy(col("g"), col("bucket")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val newg = gb.groupBy(col("g")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_new_grams"))
    val occ = gb.groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_gram_occurrences"))
    occ.join(newg, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_new_grams"), lit(0L)).as("n_new_grams"),
        col("n_gram_occurrences"),
        expr("coalesce(n_new_grams, 0) * 10000 div n_gram_occurrences")
          .as("novelty_e4"))
      .orderBy(col("bucket"))
  }

  val q99NgramNoveltyOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $tokensSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id // $NovBucket AS bucket,
       |    ${ngramsSql(3)} AS g
       |  FROM toks),
       |gb AS (
       |  SELECT g, bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM g GROUP BY g, bucket),
       |fb AS (SELECT g, min(bucket) AS bucket FROM gb GROUP BY g),
       |newg AS (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_grams
       |  FROM fb GROUP BY bucket),
       |occ AS (
       |  SELECT bucket, CAST(sum(n) AS BIGINT) AS n_gram_occurrences
       |  FROM gb GROUP BY bucket)
       |SELECT o.bucket, coalesce(n_new_grams, 0) AS n_new_grams,
       |  n_gram_occurrences,
       |  CAST(coalesce(n_new_grams, 0) * 10000 // n_gram_occurrences
       |    AS BIGINT) AS novelty_e4
       |FROM occ o LEFT JOIN newg USING (bucket)
       |ORDER BY bucket""".stripMargin
}
