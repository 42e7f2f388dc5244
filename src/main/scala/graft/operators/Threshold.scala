package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-driven quality-cutoff selection: Otsu's method (Otsu 1979,
  * "A Threshold Selection Method from Gray-Level Histograms") applied
  * to the corpus's integer type-token-ratio score — the auto-tuned
  * version of q37's hand-picked `ttr_pct >= 30` gate. A curation
  * pipeline re-runs this per snapshot so the quality bar tracks the
  * corpus instead of a constant someone chose once.
  *
  * Returns the full diagnostic curve, one row per candidate
  * threshold: class masses (w0, w1), the between-class variance in
  * 1e-6 units (`betw_e6`), and `sel` = 1 on the Otsu argmax row.
  *
  * Exactness: the score histogram and all class masses/sums are
  * exact integers; the only doubles are the final variance ratio,
  * written as the IDENTICAL expression tree in Spark and DuckDB —
  * `floor((x·x) / ((w0·w1)·(w·w)) · 1e6)` over exact integer inputs
  * — so every IEEE-754 op matches bit-for-bit (the cos_e6 trick) and
  * the argmax (floored objective, ties to the smaller threshold) is
  * the same row in both engines. `x = s0·w1 − s1·w0` stays in BIGINT;
  * it is bounded by 100·n² so it holds to ~10⁸ docs per histogram —
  * past that, lift x to DECIMAL(38,0) exactly as q55 did (the
  * comparison/ratio structure is unchanged).
  *
  * 100 TB posture: ONE map pass over the corpus feeds a groupBy onto
  * ≤101 score buckets (map-side combine collapses the shuffle to
  * O(tasks × 101) rows); everything after — prefix masses, the
  * objective curve, the argmax — happens inside a single row via
  * array HOFs on the ≤101-bucket histogram. No window over the data,
  * no join, no second scan: the expensive part is exactly one pass no
  * matter the corpus size, and the histogram row is KBytes. This is
  * the shape auto-thresholding has to take at scale — reduce to a
  * bounded sufficient statistic, then do the O(T²) scan on it for
  * free. */
object Threshold {

  private def lcnt(arr: Column): Column =
    aggregate(arr, lit(0L), (a, x) => a + x.getField("cnt"))
  private def lsum(arr: Column): Column =
    aggregate(arr, lit(0L),
      (a, x) => a + x.getField("score") * x.getField("cnt"))

  /** q86: Otsu threshold curve over the ttr_pct score histogram. */
  def q86OtsuThreshold(s: SparkSession, dir: String): DataFrame = {
    val scores = Tables.spread(Tables.load(s, dir, "documents"))
      .select(graft.functions.TextStatFunctions
        .tokenStats(col("text"), Nil).as("st"))
      .select(col("st").getItem(1).as("n_tokens"),
        (col("st").getItem(2) * 100).as("dx"))
      .filter(col("n_tokens") > 0)
      .select(expr("dx div n_tokens").as("score"))

    val hist = scores.groupBy(col("score")).agg(count(lit(1)).as("cnt"))

    // the bounded sufficient statistic: ONE row holding the sorted
    // histogram and its totals
    val one = hist
      .agg(sort_array(collect_list(struct(col("score"), col("cnt"))))
        .as("h"))
      .withColumn("w", lcnt(col("h")))
      .withColumn("s", lsum(col("h")))

    // candidate split after bucket t (1-based): threshold = h[t].score,
    // class0 = buckets 1..t. The last split (w1 = 0) is excluded by
    // ranging t to len-1.
    // (sequence(1, n-1) would DESCEND for n=1 — filter, don't subtract)
    val splits = filter(
      sequence(lit(1), greatest(size(col("h")), lit(1))),
      t => t < size(col("h")))
    val curve = one.withColumn("curve",
      transform(splits, t => {
        val pre = slice(col("h"), lit(1), t)
        val w0 = lcnt(pre)
        val s0 = lsum(pre)
        val w1 = col("w") - w0
        val s1 = col("s") - s0
        val x = (s0 * w1 - s1 * w0).cast("double")
        val den = (w0.cast("double") * w1.cast("double")) *
          (col("w").cast("double") * col("w").cast("double"))
        struct(
          element_at(col("h"), t).getField("score").as("thr"),
          w0.as("w0"), w1.as("w1"),
          floor((x * x) / den * lit(1e6)).cast("long").as("betw_e6"))
      }))

    // argmax inside the row: highest floored objective, ties to the
    // smaller threshold — no window, no join
    val best = element_at(
      sort_array(transform(col("curve"),
        c => struct((-c.getField("betw_e6")).as("nb"),
          c.getField("thr").as("thr")))), 1).getField("thr")

    curve.withColumn("best", best)
      .select(explode(col("curve")).as("c"), col("best"))
      .select(col("c.thr").as("thr"), col("c.w0").as("w0"),
        col("c.w1").as("w1"), col("c.betw_e6").as("betw_e6"),
        (col("c.thr") === col("best")).cast("int").as("sel"))
      .orderBy(col("thr"))
  }

  val q86OtsuThresholdOracle: String = {
    val toks = TextAnalysis.tokensSql
    s"""WITH scores AS (
       |  SELECT CAST(len(list_distinct(toks)) * 100 // len(toks)
       |    AS BIGINT) AS score
       |  FROM (SELECT $toks AS toks FROM documents)
       |  WHERE len(toks) > 0),
       |hist AS (SELECT score, count(*) AS cnt FROM scores
       |         GROUP BY score),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS w,
       |               CAST(sum(score*cnt) AS BIGINT) AS s FROM hist),
       |pre AS (
       |  SELECT score AS thr,
       |    CAST(sum(cnt) OVER (ORDER BY score) AS BIGINT) AS w0,
       |    CAST(sum(score*cnt) OVER (ORDER BY score) AS BIGINT) AS s0
       |  FROM hist),
       |curve AS (
       |  SELECT thr, w0, t.w - w0 AS w1,
       |    CAST(floor(
       |      (CAST(s0*(t.w - w0) - (t.s - s0)*w0 AS DOUBLE) *
       |       CAST(s0*(t.w - w0) - (t.s - s0)*w0 AS DOUBLE)) /
       |      ((CAST(w0 AS DOUBLE) * CAST(t.w - w0 AS DOUBLE)) *
       |       (CAST(t.w AS DOUBLE) * CAST(t.w AS DOUBLE))) * 1e6)
       |      AS BIGINT) AS betw_e6
       |  FROM pre, tot t WHERE w0 < t.w),
       |best AS (
       |  SELECT thr FROM curve ORDER BY betw_e6 DESC, thr ASC LIMIT 1)
       |SELECT c.thr, c.w0, c.w1, c.betw_e6,
       |  CAST(CASE WHEN c.thr = b.thr THEN 1 ELSE 0 END AS INTEGER)
       |    AS sel
       |FROM curve c, best b
       |ORDER BY c.thr""".stripMargin
  }
}
