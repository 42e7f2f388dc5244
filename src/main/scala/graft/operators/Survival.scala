package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Discrete-time survival analysis (Kaplan–Meier 1958) of
  * time-to-repurchase: per customer, the gap between consecutive
  * orders is an OBSERVED duration; the gap from the last order to the
  * corpus horizon is RIGHT-CENSORED (the customer may still return).
  * The life table reports, per [[PeriodDays]]-day period k:
  * n_at_risk (durations ≥ k), n_repurchased (observed exits at k),
  * n_censored (censored exits at k), the discrete hazard d·10⁶ div r,
  * and the KM survival estimate Π (r_j − d_j)/r_j as a ×10⁶ integer
  * with TRUNCATING division applied at every step — the recurrence
  * S(k) = S(k−1)·(r−d) div r is the spec on both engines (the oracle
  * unrolls it as a recursive CTE), so the gate is bit-exact with no
  * float product anywhere.
  *
  * Exits at the same period follow the standard KM convention:
  * events precede censorings, i.e. both count in the period's risk
  * set and only d reduces survival.
  *
  * 100 TB posture: ONE customer-keyed exchange (the LEAD window over
  * order dates) produces the duration stream; exits collapse to a
  * |periods|-row table via one map-side-combined aggregate, the
  * running risk set comes from the bucket-offset prefix scan (no
  * unpartitioned Window), and the sequential truncating product runs
  * driver-side over that table — bounded by the corpus TIME SPAN
  * (horizon days div [[PeriodDays]]), which grows with calendar time,
  * not data volume. */
object Survival {

  /** Life-table period width (the 4-week retail period). */
  val PeriodDays = 28L

  /** q161: the repurchase life table. Columns: (period_k, n_at_risk,
    * n_repurchased, n_censored, hazard_ppm, survival_e6), one row per
    * period 0..max observed, ordered. */
  def q161RepurchaseSurvival(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val od = Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        // NTZ parquet dates under the UTC session timezone: the cast
        // is epoch-exact against the oracle's epoch(o_orderdate)
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("d"))
    // LEAD over (custkey, day, orderkey): same-day ties are ordered by
    // orderkey, but the gap MULTISET is tie-order-invariant (sorted
    // consecutive differences), so exits counts are deterministic.
    val gaps = od.withColumn("nd",
      lead(col("d"), 1).over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("d"), col("o_orderkey"))))
    val horizon = od.agg(max(col("d")).as("md"))
    val lives = gaps.crossJoin(broadcast(horizon))
      .select(
        expr(s"IF(nd IS NULL, (md - d) div $PeriodDays," +
          s" (nd - d) div $PeriodDays)").as("k"),
        col("nd").isNull.as("censored"))
    val exits = lives.groupBy(col("k")).agg(
        sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("c"))
      .localCheckpoint(false) // grid bound + left join + totals read it
    val grid = exits.agg(max(col("k")).as("maxk"))
      .select(explode(expr("sequence(0, maxk)")).as("k"))
    val wk = grid.join(exits, Seq("k"), "left")
      .select(col("k"), coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("exits", col("d") + col("c"))
    val cum = OrderStats.prefixCounts(wk, "k", "exits")
      .select(col("k"), col("cum"))
    // Driver-side sequential product over the |periods|-row life
    // table (bounded by time span, documented above): truncating
    // integer recurrence, Long-safe (s ≤ 10⁶, r−d ≤ 10¹² before the
    // div — exact to 10¹² durations/period).
    val rows = wk.join(cum, Seq("k"))
      .orderBy(col("k"))
      .select(col("k"), col("d"), col("c"), col("cum"))
      .collect()
    val n = rows.lastOption.map(_.getLong(3)).getOrElse(0L)
    var surv = 1000000L
    val table = rows.map { r =>
      val (k, d, c, cum) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      val atRisk = n - cum + d + c
      val hazard = if (atRisk == 0) 0L else d * 1000000L / atRisk
      if (atRisk != 0) surv = surv * (atRisk - d) / atRisk
      (k, atRisk, d, c, hazard, surv)
    }.toSeq
    table.toDF("period_k", "n_at_risk", "n_repurchased", "n_censored",
        "hazard_ppm", "survival_e6")
      .orderBy(col("period_k"))
  }

  val q161RepurchaseSurvivalOracle: String =
    s"""WITH RECURSIVE od AS (
       |  SELECT o_custkey, o_orderkey,
       |    CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d
       |  FROM orders),
       |gaps AS MATERIALIZED (
       |  SELECT d, lead(d) OVER (PARTITION BY o_custkey
       |    ORDER BY d, o_orderkey) AS nd
       |  FROM od),
       |m AS (SELECT max(d) AS md FROM od),
       |lives AS MATERIALIZED (
       |  SELECT CASE WHEN nd IS NULL THEN (md - d) // $PeriodDays
       |    ELSE (nd - d) // $PeriodDays END AS k,
       |    (nd IS NULL) AS censored
       |  FROM gaps, m),
       |exits AS MATERIALIZED (
       |  SELECT k,
       |    CAST(count(*) FILTER (WHERE NOT censored) AS BIGINT) AS d,
       |    CAST(count(*) FILTER (WHERE censored) AS BIGINT) AS c
       |  FROM lives GROUP BY k),
       |grid AS (
       |  SELECT unnest(generate_series(0,
       |    (SELECT max(k) FROM exits))) AS k),
       |wk AS MATERIALIZED (
       |  SELECT g.k, coalesce(e.d, 0) AS d, coalesce(e.c, 0) AS c,
       |    (SELECT count(*) FROM lives) - coalesce(
       |      sum(coalesce(e.d, 0) + coalesce(e.c, 0)) OVER (
       |        ORDER BY g.k
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS at_risk
       |  FROM grid g LEFT JOIN exits e ON e.k = g.k),
       |surv AS (
       |  SELECT k, at_risk, d, c,
       |    CASE WHEN at_risk = 0 THEN 0
       |      ELSE d * 1000000 // at_risk END AS hazard_ppm,
       |    CASE WHEN at_risk = 0 THEN 1000000
       |      ELSE (1000000 * (at_risk - d)) // at_risk END AS s
       |  FROM wk WHERE k = 0
       |  UNION ALL
       |  SELECT w.k, w.at_risk, w.d, w.c,
       |    CASE WHEN w.at_risk = 0 THEN 0
       |      ELSE w.d * 1000000 // w.at_risk END,
       |    CASE WHEN w.at_risk = 0 THEN surv.s
       |      ELSE (surv.s * (w.at_risk - w.d)) // w.at_risk END
       |  FROM surv JOIN wk w ON w.k = surv.k + 1)
       |SELECT k AS period_k, CAST(at_risk AS BIGINT) AS n_at_risk,
       |  d AS n_repurchased, c AS n_censored,
       |  CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
       |  CAST(s AS BIGINT) AS survival_e6
       |FROM surv ORDER BY period_k""".stripMargin
}
