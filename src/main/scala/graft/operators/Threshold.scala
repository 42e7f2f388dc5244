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

  // ---- q100: mergeable log₂-histogram quantile sketch --------------

  /** Percentiles q100 reports (as integer percents). */
  val QuantQs = Seq(50, 90, 99)

  /** q100: quantile estimation from a MERGEABLE power-of-two
    * histogram, calibrated against the exact percentile — per order
    * priority and per q ∈ {50, 90, 99}: (priority, q_pct, n,
    * exact_cents, b, lo_cents, hi_cents).
    *
    * The sketch is the DDSketch idea (Masson et al. 2019) at γ = 2:
    * bucket = bit-length of the value, so any stream collapses
    * map-side to ≤64 counters that merge by addition — the quantile
    * summary that survives 100 TB, where the exact arm (a full sort
    * or an all-values percentile buffer per group) does not. The
    * estimated quantile is the bucket [2^(b−1), 2^b−1] whose
    * cumulative count first reaches ⌈q·n/100⌉ — a guaranteed
    * relative-error-≤2 enclosure reported as (lo, hi) NEXT TO the
    * exact value, which is the calibration a deployment reads before
    * dropping the exact arm.
    *
    * Exactness: buckets/cumulative counts/rank thresholds are pure
    * integers; the exact arm is Spark `percentile` vs DuckDB
    * `quantile_cont` — the same (n−1)·q linear interpolation over
    * identical BIGINT cents, floored to a BIGINT, so both engines
    * produce the identical double and the identical floor.
    *
    * 100 TB posture: one orders scan → groupBy onto ≤ (priorities ×
    * 64) buckets with map-side combine; the cumulative scan is a
    * window PARTITIONED by priority over ≤64 rows per partition; the
    * rank lookup joins the 15-row exact frame to the bucket table.
    * The exact arm is the only non-mergeable piece and exists to BE
    * the ground truth here. */
  def q100QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qsSql = QuantQs.map(q => q / 100.0).mkString(", ")
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        Relational.cents(col("o_totalprice")).as("cents"))
    val exact = o.groupBy(col("priority"))
      .agg(count(lit(1)).as("n"),
        expr(s"percentile(cents, array($qsSql))").as("exv"))
      .select(col("priority"), col("n"),
        posexplode(col("exv")).as(Seq("qi", "ex")))
      .select(col("priority"), col("n"),
        element_at(lit(QuantQs.map(_.toLong).toArray), col("qi") + 1)
          .as("q_pct"),
        floor(col("ex")).cast("long").as("exact_cents"))
    val hist = o
      .groupBy(col("priority"), length(bin(col("cents"))).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("priority"))
        .orderBy(col("b"))))
    exact.join(cum, "priority")
      .filter(col("cum") >= expr("(n * q_pct + 99) div 100"))
      .groupBy(col("priority"), col("q_pct"), col("n"),
        col("exact_cents"))
      .agg(min(col("b")).cast("long").as("b"))
      .withColumn("lo_cents",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT) - 1)"))
      .withColumn("hi_cents",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) - 1"))
      .select(col("priority"), col("q_pct"), col("n"),
        col("exact_cents"), col("b"), col("lo_cents"), col("hi_cents"))
      .orderBy(col("priority"), col("q_pct"))
  }

  val q100QuantileSketchOracle: String = {
    val qList = QuantQs.map(q => q / 100.0).mkString(", ")
    val idx = QuantQs.zipWithIndex
      .map { case (q, i) => s"(${i + 1}, $q)" }.mkString(", ")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS priority,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |  FROM orders),
       |ex AS (
       |  SELECT priority, count(*) AS n,
       |    quantile_cont(cents, [$qList]) AS exv
       |  FROM o GROUP BY priority),
       |exq AS (
       |  SELECT priority, n, CAST(t.q_pct AS BIGINT) AS q_pct,
       |    CAST(floor(exv[t.i]) AS BIGINT) AS exact_cents
       |  FROM ex, (VALUES $idx) t(i, q_pct)),
       |hb AS (
       |  SELECT priority, length(bin(cents)) AS b, count(*) AS cnt
       |  FROM o GROUP BY priority, length(bin(cents))),
       |cumt AS (
       |  SELECT priority, b,
       |    sum(cnt) OVER (PARTITION BY priority ORDER BY b) AS cum
       |  FROM hb),
       |est AS (
       |  SELECT e.priority, e.q_pct, e.n, e.exact_cents,
       |    CAST(min(c.b) AS BIGINT) AS b
       |  FROM exq e JOIN cumt c ON c.priority = e.priority
       |    AND c.cum >= (e.n * e.q_pct + 99) // 100
       |  GROUP BY e.priority, e.q_pct, e.n, e.exact_cents)
       |SELECT priority, q_pct, n, exact_cents, b,
       |  CAST(CAST(1 AS BIGINT) << (CAST(b AS INT) - 1) AS BIGINT)
       |    AS lo_cents,
       |  CAST((CAST(1 AS BIGINT) << CAST(b AS INT)) - 1 AS BIGINT)
       |    AS hi_cents
       |FROM est ORDER BY priority, q_pct""".stripMargin
  }
}
