package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream shape statistics — the temporal-profile measurements
  * an ingestion/monitoring team derives from the events table:
  * inter-arrival burstiness (q146), hour-of-day seasonality (q147),
  * and A/B sample-size planning from observed variance (q148).
  *
  * House rules: ts is epoch-nanos BIGINT (the `Tables.load`
  * normalization); every statistic is exact integer/DECIMAL
  * arithmetic (no float variance — both engines compute the same
  * rationals); windows are always PARTITIONED (per user/type), never
  * global.
  */
object EventStats {

  /** q146: inter-arrival burstiness per event type — the squared
    * coefficient of variation CV² = Var(g)/mean(g)² of per-user
    * inter-arrival gaps, in ppm (CV² = 1 ⟺ Poisson arrivals; > 1 ⟺
    * bursty, the bot/incident signature; < 1 ⟺ regular, the
    * cron/heartbeat signature — the standard dispersion taxonomy,
    * e.g. Goh & Barabási 2008). One row per event_type:
    * (event_type, n_gaps, mean_gap_ms, cv2_ppm).
    *
    * Gaps are PER-USER (a global inter-arrival mixes users and
    * measures only traffic volume): LAG over the (user_id,
    * event_type)-partitioned time order, so the heavy work is one
    * keyed exchange + partitioned windows. The per-type CV² is then
    * algebra over (n, Σg, Σg²): Var/mean² =
    * n·(n·Σg² − (Σg)²) / ((n−1)·(Σg)²), widened to DECIMAL(38,0)
    * (exact up to ~10⁹ gaps/type at second-scale gaps — beyond that
    * rescale the gap unit; the q114 widening rule).
    *
    * 100 TB posture: one user-keyed exchange (the window), one
    * type-keyed aggregate over 3-integer partials with map-side
    * combine. Types with < 2 gaps are reported with cv2_ppm = 0
    * rather than dropped (n−1 guard). */
  def q146Burstiness(s: SparkSession, dir: String): DataFrame = {
    val byUserType = Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t").asc, col("event_id").asc)
    val gaps = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000000000").as("t"))
      .withColumn("prev", lag(col("t"), 1).over(byUserType))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), (col("t") - col("prev")).as("g"))
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g")).as("sg"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * g")).as("sg2"))
      .select(col("event_type"), col("n_gaps"),
        expr("CAST(CAST(sg AS DECIMAL(38,0)) * 1000 div n_gaps" +
          " AS BIGINT)").as("mean_gap_ms"),
        expr("""CASE WHEN n_gaps < 2 OR sg = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(CAST(n_gaps AS DECIMAL(38,0)) *
                  (n_gaps * sg2 - CAST(sg AS DECIMAL(38,0)) * sg)
                  * 1000000
                  div ((n_gaps - 1) *
                    (CAST(sg AS DECIMAL(38,0)) * sg))
                  AS BIGINT) END""").as("cv2_ppm"))
      .orderBy(col("event_type"))
  }

  val q146BurstinessOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS t
      |  FROM events),
      |gaps AS (
      |  SELECT event_type,
      |    t - lag(t) OVER (PARTITION BY user_id, event_type
      |                     ORDER BY t, event_id) AS g
      |  FROM ev),
      |agg AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(g) AS BIGINT) AS sg,
      |    sum(CAST(g AS HUGEINT) * g) AS sg2
      |  FROM gaps WHERE g IS NOT NULL GROUP BY event_type)
      |SELECT event_type, n_gaps,
      |  CAST(CAST(sg AS HUGEINT) * 1000 // n_gaps AS BIGINT)
      |    AS mean_gap_ms,
      |  CASE WHEN n_gaps < 2 OR sg = 0 THEN CAST(0 AS BIGINT)
      |  ELSE CAST(CAST(n_gaps AS HUGEINT) *
      |    (n_gaps * sg2 - CAST(sg AS HUGEINT) * sg) * 1000000
      |    // ((n_gaps - 1) * (CAST(sg AS HUGEINT) * sg))
      |    AS BIGINT) END AS cv2_ppm
      |FROM agg ORDER BY event_type""".stripMargin

  /** q147: hour-of-day seasonality per event type — the 24-slot
    * UTC-hour profile reduced to its operational summary: peak hour,
    * peak share, and lift over a uniform profile, exact ppm. One row
    * per event_type: (event_type, n_events, peak_hod, peak_count,
    * peak_share_ppm, uniform_lift_ppm) — lift = share·24 (10⁶ =
    * perfectly flat; a pure-batch job shows ~24·10⁶).
    *
    * hod = (epoch-seconds div 3600) mod 24 — pure integer on both
    * engines, no timezone/calendar function in the hot path. Peak
    * selection is a 24-row-per-type partitioned window (ties → the
    * earliest hour).
    *
    * 100 TB posture: one map-side-combined (type, hod) aggregate —
    * at most 24·|types| rows ever shuffle; everything after is
    * type-keyed at constant width. */
  def q147Seasonality(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("cnt").desc, col("hod").asc)
    Tables.load(s, dir, "events")
      .select(col("event_type"),
        expr("(ts div 3600000000000) % 24").as("hod"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_events",
        sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
      .withColumn("rk", row_number().over(byType))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_events"),
        col("hod").as("peak_hod"), col("cnt").as("peak_count"),
        expr("""CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000
                div n_events AS BIGINT)""").as("peak_share_ppm"),
        expr("""CAST(CAST(cnt AS DECIMAL(38,0)) * 24000000
                div n_events AS BIGINT)""").as("uniform_lift_ppm"))
      .orderBy(col("event_type"))
  }

  val q147SeasonalityOracle: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hod
      |  FROM events),
      |hist AS (
      |  SELECT event_type, hod, CAST(count(*) AS BIGINT) AS cnt
      |  FROM ev GROUP BY event_type, hod),
      |tot AS (
      |  SELECT event_type, hod, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
      |      AS n_events,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY cnt DESC, hod ASC) AS rk
      |  FROM hist)
      |SELECT event_type, n_events, hod AS peak_hod,
      |  cnt AS peak_count,
      |  CAST(CAST(cnt AS HUGEINT) * 1000000 // n_events AS BIGINT)
      |    AS peak_share_ppm,
      |  CAST(CAST(cnt AS HUGEINT) * 24000000 // n_events AS BIGINT)
      |    AS uniform_lift_ppm
      |FROM tot WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** q148 design constants: two-sided α = 5%, power = 80% (the
    * (z_{α/2} + z_β)² ≈ 7.85 → the classic ×16 rule with the
    * variance ratio), minimum detectable effect = 5% of the mean. */
  val PowerRuleNum = 16L
  val MdeDenom = 20L // δ = mean / 20 = 5%

  /** q148: A/B sample-size planning from observed variance — for
    * each event type, the per-arm n required to detect a 5% lift of
    * the mean event value at α = 5%, power 80%:
    * n = 16·σ²/δ² (the "rule of 16", the δ = σ/√(n/16) inversion of
    * the two-sample z-test — van Belle's rule; the design
    * counterpart of q106's CUPED variance reduction: run q148 on the
    * CUPED-adjusted variance to see the budget CUPED buys). One row
    * per event_type: (event_type, n_obs, mean_cents, var_c2,
    * mde_cents, n_per_arm).
    *
    * Exact integer protocol (both engines bit-identical): values in
    * cents; var_c2 = (n·Σx² − (Σx)²) div (n·(n−1)) (floored sample
    * variance); mde = mean div 20 (floored); n_per_arm =
    * ceil(16·var/mde²) as (16·var + mde² − 1) div mde². Types with
    * n < 2 or mde = 0 report n_per_arm = 0 (no basis for a design).
    *
    * 100 TB posture: ONE map-side-combined aggregate over
    * 3-integer partials per type; output is |types| rows. */
  def q148PowerAnalysis(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "events")
      .select(col("event_type"),
        Relational.cents(col("value")).as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("cents")).as("sx"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sx2"))
      .select(col("event_type"), col("n_obs"),
        expr("CAST(sx div n_obs AS BIGINT)").as("mean_cents"),
        expr("""CASE WHEN n_obs < 2 THEN CAST(0 AS BIGINT)
                ELSE CAST((n_obs * sx2 -
                    CAST(sx AS DECIMAL(38,0)) * sx)
                  div (CAST(n_obs AS DECIMAL(38,0)) * (n_obs - 1))
                  AS BIGINT) END""").as("var_c2"),
        expr(s"CAST(sx div n_obs div $MdeDenom AS BIGINT)")
          .as("mde_cents"))
      .withColumn("n_per_arm", expr(
        s"""CASE WHEN mde_cents <= 0 OR var_c2 <= 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(($PowerRuleNum * CAST(var_c2 AS DECIMAL(38,0))
              + CAST(mde_cents AS DECIMAL(38,0)) * mde_cents - 1)
              div (CAST(mde_cents AS DECIMAL(38,0)) * mde_cents)
              AS BIGINT) END"""))
      .orderBy(col("event_type"))
  }

  val q148PowerAnalysisOracle: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |agg AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs,
       |    CAST(sum(cents) AS BIGINT) AS sx,
       |    sum(CAST(cents AS HUGEINT) * cents) AS sx2
       |  FROM ev GROUP BY event_type),
       |stats AS (
       |  SELECT event_type, n_obs,
       |    CAST(sx // n_obs AS BIGINT) AS mean_cents,
       |    CASE WHEN n_obs < 2 THEN CAST(0 AS BIGINT)
       |    ELSE CAST((n_obs * sx2 - CAST(sx AS HUGEINT) * sx)
       |      // (CAST(n_obs AS HUGEINT) * (n_obs - 1)) AS BIGINT)
       |    END AS var_c2,
       |    CAST(sx // n_obs // $MdeDenom AS BIGINT) AS mde_cents
       |  FROM agg)
       |SELECT event_type, n_obs, mean_cents, var_c2, mde_cents,
       |  CASE WHEN mde_cents <= 0 OR var_c2 <= 0
       |  THEN CAST(0 AS BIGINT)
       |  ELSE CAST(($PowerRuleNum * CAST(var_c2 AS HUGEINT)
       |    + CAST(mde_cents AS HUGEINT) * mde_cents - 1)
       |    // (CAST(mde_cents AS HUGEINT) * mde_cents) AS BIGINT)
       |  END AS n_per_arm
       |FROM stats ORDER BY event_type""".stripMargin

  /** q149: CUSUM changepoint detection on the daily event-count
    * series — the retrospective mean-shift locator (Page 1954;
    * the offline max-|CUSUM| form every pipeline-health dashboard
    * runs when a drop must be DATED, not just flagged like q79's
    * rate anomaly): with S_k = Σ_{i≤k} x_i, the statistic is
    * max_k |D·S_k − k·T| (the centered partial sum scaled by D to
    * stay integer — D days, T total events), and the changepoint is
    * its argmax day. One row: (n_days, n_events, cp_day,
    * cusum_peak, mean_before_e3, mean_after_e3).
    *
    * Exactness without a global sort: the day series comes from ONE
    * map-side-combined (day)-aggregate; rank k and running sum S_k
    * are two [[OrderStats.prefixCounts]] bucket scans over the
    * DAY-COUNT-scale table (hundreds of rows — never an
    * unpartitioned Window, the q142 discipline); the argmax is
    * TakeOrderedAndProject(1) with ties to the earliest day.
    * DECIMAL(38,0) on D·S − k·T (the q114 widening rule: BIGINT²
    * products at warehouse scale).
    *
    * 100 TB posture: one corpus-scale exchange (the day aggregate);
    * everything after runs on |days| rows. */
  def q149CusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .select(col("day"), lit(1L).as("one"), col("n"))
      .localCheckpoint(false) // two scans + the totals read it
    val rank = OrderStats.prefixCounts(daily, "day", "one")
      .select(col("day"), col("cum").as("k"))
    val cums = OrderStats.prefixCounts(daily, "day", "n")
      .select(col("day"), col("cum").as("s"))
    val totals = daily.agg(count(lit(1)).as("n_days"),
      sum(col("n")).as("n_events"))
    rank.join(cums, "day")
      .crossJoin(broadcast(totals))
      .filter(col("k") < col("n_days")) // a shift needs a non-empty tail
      .select(col("day"), col("k"), col("s"), col("n_days"),
        col("n_events"),
        expr("""abs(CAST(n_days AS DECIMAL(38,0)) * s
                - CAST(k AS DECIMAL(38,0)) * n_events)""")
          .as("stat"))
      .orderBy(col("stat").desc, col("day").asc)
      .limit(1)
      .select(col("n_days"), col("n_events"), col("day").as("cp_day"),
        expr("CAST(stat AS BIGINT)").as("cusum_peak"),
        expr("CAST(CAST(s AS DECIMAL(38,0)) * 1000 div k AS BIGINT)")
          .as("mean_before_e3"),
        expr("""CAST(CAST(n_events - s AS DECIMAL(38,0)) * 1000
                div (n_days - k) AS BIGINT)""").as("mean_after_e3"))
  }

  val q149CusumChangepointOracle: String =
    """WITH daily AS (
      |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |sc AS (
      |  SELECT day,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS k,
      |    CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS s
      |  FROM daily),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(n) AS BIGINT) AS n_events FROM daily),
      |best AS (
      |  SELECT day, k, s, n_days, n_events,
      |    abs(CAST(n_days AS HUGEINT) * s
      |      - CAST(k AS HUGEINT) * n_events) AS stat
      |  FROM sc, tot WHERE k < n_days
      |  ORDER BY stat DESC, day ASC LIMIT 1)
      |SELECT n_days, n_events, day AS cp_day,
      |  CAST(stat AS BIGINT) AS cusum_peak,
      |  CAST(CAST(s AS HUGEINT) * 1000 // k AS BIGINT)
      |    AS mean_before_e3,
      |  CAST(CAST(n_events - s AS HUGEINT) * 1000 // (n_days - k)
      |    AS BIGINT) AS mean_after_e3
      |FROM best""".stripMargin

  /** χ²(1) critical value at α = 5%, in ppm — 3.841459. */
  val SrmChi2CritPpm = 3841459L

  /** q151: sample-ratio-mismatch audit — the #1 A/B validity check
    * (Kohavi et al., "Trustworthy Online Controlled Experiments":
    * a 50/50 split whose realized unit counts fail a χ² test means
    * the assignment or logging is broken and EVERY downstream
    * metric is suspect — run before q106/q148 read anything). Per
    * event type over q106's deterministic md5 arm hash:
    * (event_type, n_a, n_b, chi2_ppm, srm_flag) with
    * χ² = (n_a − n_b)²/(n_a + n_b) for the equal-split design,
    * flagged against [[SrmChi2CritPpm]] — pure integer ppm, no
    * float χ² CDF needed because the critical value is a constant.
    *
    * Unit = distinct exposed user (assignment counts units, not
    * events). 100 TB posture: one (type, user)-distinct exchange —
    * the q113 exact-NDV scale argument — then |types|-row algebra. */
  def q151SrmAudit(s: SparkSession, dir: String): DataFrame = {
    val units = Tables.load(s, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("arm",
        conv(substring(md5(concat(lit("exp:"),
          col("user_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 2)
    units.groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("""CAST((CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b))
                * 1000000 div (n_a + n_b) AS BIGINT)""")
          .as("chi2_ppm"))
      .withColumn("srm_flag",
        when(col("chi2_ppm") >= SrmChi2CritPpm, 1L).otherwise(0L))
      .orderBy(col("event_type"))
  }

  val q151SrmAuditOracle: String =
    s"""WITH units AS (
       |  SELECT DISTINCT event_type, user_id FROM events),
       |hx AS (
       |  SELECT event_type,
       |    substring(md5('exp:' || CAST(user_id AS VARCHAR)), 1, 6)
       |      AS hx
       |  FROM units),
       |armed AS (
       |  SELECT event_type,
       |    CAST((${graft.operators.Sketch.hexSql("hx", 6)})
       |      AS BIGINT) % 2 AS arm
       |  FROM hx),
       |cnt AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_a,
       |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_b
       |  FROM armed GROUP BY event_type)
       |SELECT event_type, n_a, n_b,
       |  CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
       |    // (n_a + n_b) AS BIGINT) AS chi2_ppm,
       |  CASE WHEN CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b)
       |      * 1000000 // (n_a + n_b) AS BIGINT) >= $SrmChi2CritPpm
       |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
       |    AS srm_flag
       |FROM cnt ORDER BY event_type""".stripMargin

  /** Maximum lag for q168 — two weeks of daily lags covers the
    * weekly cycle (lag 7) and its harmonic (lag 14). */
  val AcfMaxLag = 14

  /** q168: autocorrelation function of the daily event-count series —
    * exact integer ACF at lags 1..[[AcfMaxLag]]: (lag, n_terms,
    * acf_ppm). The dependence-structure companion to q147 (which
    * finds the intra-day peak) and q149 (which dates a level shift):
    * a lag-7 spike is the weekly cycle, slow geometric decay is
    * trend/level persistence, all-near-zero is white arrivals — the
    * Box–Jenkins identification read, as a corpus query.
    *
    * Exact without floats: with S = Σx and n days, the centered value
    * scaled by n is c_t = n·x_t − S (an integer), and
    * ACF(L) = Σ_t c_t·c_{t+L} / Σ_t c_t² — the n² factors cancel, so
    * the ppm result is one sign-outside truncating division of two
    * integer sums (products widen to DECIMAL(38,0)/HUGEINT: c_t is
    * ~n·x, so c² passes 2⁶³ beyond ~10⁵ daily events on a ~10³-day
    * span). The series is DENSIFIED over [min_day, max_day] (missing
    * days are true zeros — lag alignment needs the calendar grid, not
    * the observed-row order; q149's CUSUM is rank-based and does not).
    *
    * Plan shape: one map-side-combined day aggregate (the q149
    * grain), a sequence-explode densify bounded by the day span, then
    * ONE day-keyed self-equi-join on (day + lag = day₂) — the probe
    * side is the day table replicated ×[[AcfMaxLag]], still
    * day-grain. Nothing downstream exceeds |lags| rows. At 100 TB
    * the corpus-scale work is exactly the daily aggregate; the ACF
    * itself runs on thousands of rows regardless of corpus size.
    *
    * Output shape: a lag with ZERO overlapping day pairs (day span ≤
    * lag) is ABSENT from the output, not an acf_ppm = 0 row — an
    * n_terms = 0 ACF is 0/0, undefined, and the q169 discipline
    * applies: an absent row reads as "not measured". Consumers must
    * not anchor on a fixed [[AcfMaxLag]]-row result; both engines
    * drop such lags identically (inner join on the term count). */
  def q168Acf(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val series = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
    val tot = series.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val c = series.crossJoin(broadcast(tot))
      .select(col("day"),
        expr("CAST(n AS DECIMAL(38,0)) * x - sx").as("c"))
      .localCheckpoint(false) // the den aggregate + both join sides
    val den = c.agg(sum(expr("c * c")).as("den"))
    val probe = c.select(
        explode(sequence(lit(1L), lit(AcfMaxLag.toLong))).as("lag"),
        col("day"), col("c"))
      .withColumn("k", col("day") + col("lag"))
    probe.join(c.select(col("day").as("k"), col("c").as("c2")), "k")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_terms"), sum(expr("c * c2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_terms"),
        expr("""CAST(CASE WHEN den IS NULL OR den = 0 THEN 0
                ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                  * (abs(num) * 1000000 div den) END AS BIGINT)""")
          .as("acf_ppm"))
      .orderBy(col("lag"))
  }

  val q168AcfOracle: String =
    s"""WITH daily AS (
       |  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
       |days AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
       |s AS (
       |  SELECT days.day, coalesce(x, 0) AS x
       |  FROM days LEFT JOIN daily ON daily.day = days.day),
       |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
       |        CAST(sum(x) AS HUGEINT) AS sx FROM s),
       |c AS (SELECT day, n * x - sx AS c FROM s, t),
       |den AS (SELECT sum(c * c) AS den FROM c),
       |lags AS (SELECT CAST(unnest(range(1, ${AcfMaxLag + 1}))
       |           AS BIGINT) AS lag),
       |num AS (
       |  SELECT lag, CAST(count(*) AS BIGINT) AS n_terms,
       |    sum(a.c * b2.c) AS num
       |  FROM lags CROSS JOIN c a
       |  JOIN c b2 ON b2.day = a.day + lag
       |  GROUP BY lag)
       |SELECT lag, n_terms,
       |  CAST(CASE WHEN den IS NULL OR den = 0 THEN 0
       |    ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
       |      * (abs(num) * 1000000 // den) END AS BIGINT) AS acf_ppm
       |FROM num CROSS JOIN den
       |ORDER BY lag""".stripMargin
}
