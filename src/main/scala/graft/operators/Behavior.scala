package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral analytics over the `events` table — the classic
  * warehouse trio: gap-based sessionization (batch twin of the
  * streaming `Sessionize`), cohort retention, and funnel conversion.
  *
  * All time arithmetic is integer epoch seconds derived from the raw
  * nanos column (`ts div 1e9`) so both engines bucket identically;
  * every window has a total order ((t, event_id) — event_id is
  * unique) so ties cannot reorder between engines.
  */
object Behavior {

  val SessionGapSec = 1800L

  /** q58: gap sessionization in batch — lag() marks a session start
    * when the gap exceeds [[SessionGapSec]], a running sum numbers
    * sessions per user, then one agg per session. Two window passes +
    * one agg, all partitioned by user_id: a single hash shuffle of the
    * events, per-task state = one user's timeline — the exact shape
    * that scales to any user count. */
  def q58SessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("t"))
      .withColumn("prev", lag(col("t"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("t") - col("prev") > SessionGapSec, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(byUser))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("t")).as("t_start"),
        max(col("t")).as("t_end"))
      .withColumn("duration_sec", col("t_end") - col("t_start"))
      .orderBy(col("user_id"), col("sid"))
  }

  val q58SessionizeBatchOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS t
       |  FROM events),
       |marked AS (
       |  SELECT user_id, event_id, t,
       |    CASE WHEN lag(t) OVER w IS NULL
       |           OR t - lag(t) OVER w > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |sess AS (
       |  SELECT user_id, t,
       |    CAST(sum(new_s) OVER (PARTITION BY user_id
       |      ORDER BY t, event_id) AS BIGINT) AS sid
       |  FROM marked)
       |SELECT user_id, sid, count(*) AS n_events,
       |  min(t) AS t_start, max(t) AS t_end,
       |  max(t) - min(t) AS duration_sec
       |FROM sess GROUP BY user_id, sid
       |ORDER BY user_id, sid""".stripMargin

  /** q59: cohort retention — users grouped by first-activity day, a
    * distinct-user count per (cohort, day-offset). Two shuffles: the
    * per-user min (user-keyed) and the cohort cell count; the cohort
    * matrix is O(days²) rows regardless of user count. */
  def q59Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val first = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  val q59RetentionOracle: String =
    """WITH ev AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |first AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT cohort_day, day - cohort_day AS offset_days,
      |  count(DISTINCT ev.user_id) AS n_users
      |FROM ev JOIN first USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q62: time-series gap-fill — densify the hourly per-type series
    * over the observed hour range (missing cells get n_events = 0) and
    * forward-fill the cents value from the last observed hour. The
    * grid is (types × hours) — generated from two TINY aggregates
    * (bounds + distinct types) and cross-joined broadcast-side, so the
    * only big-data pass is the initial hourly aggregation; the
    * forward-fill window runs over the dense grid, which is
    * time-cardinality-sized, never event-sized. The gap-fill +
    * LOCF (last-observation-carried-forward) pair is the standard
    * sensor/metrics densification at warehouse scale. */
  def q62Gapfill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.load(s, dir, "events")
      .groupBy(expr("ts div 3600000000000").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val hours = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("hour"))
    val types = Tables.load(s, dir, "events")
      .select(col("event_type")).distinct()
    val grid = broadcast(types).crossJoin(broadcast(hours))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("hour").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("cents"),
        col("n").isNull.cast("int").as("filled"))
      .withColumn("cents_locf",
        coalesce(last(col("cents"), ignoreNulls = true).over(byType),
          lit(0L)))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("cents_locf"), col("filled"))
      .orderBy(col("event_type"), col("hour"))
  }

  val q62GapfillOracle: String =
    """WITH h AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
      |    event_type, count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
      |grid AS (
      |  SELECT t.event_type, g.hour
      |  FROM (SELECT DISTINCT event_type FROM events) t
      |  CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS hour FROM bounds) g)
      |SELECT event_type, hour,
      |  coalesce(n, 0) AS n_events,
      |  coalesce(last_value(cents IGNORE NULLS) OVER (
      |    PARTITION BY event_type ORDER BY hour
      |    ROWS UNBOUNDED PRECEDING), 0) AS cents_locf,
      |  CAST(n IS NULL AS INT) AS filled
      |FROM grid LEFT JOIN h USING (event_type, hour)
      |ORDER BY event_type, hour""".stripMargin

  val FunnelWindowSec = 86400L

  /** q60: funnel conversion — per user: first click, first purchase
    * within [[FunnelWindowSec]] after it, rolled up to one summary
    * row per conversion state. Per-user min-aggregations (one user
    * shuffle), then a 3-row rollup: no windows over the full stream,
    * no self-join blowup — the conditional-min formulation is the
    * scalable funnel shape. */
  def q60Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("t"))
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click", col("t"))).as("c"))
    val pAfter = ev.filter(col("event_type") === "purchase")
      .join(perUser.select(col("user_id"), col("c")), "user_id")
      .filter(col("c").isNotNull && col("t") >= col("c"))
      .groupBy(col("user_id")).agg(min(col("t")).as("p"))
    perUser.join(pAfter, Seq("user_id"), "left")
      .select(
        when(col("c").isNull, lit("no_click"))
          .when(col("p").isNotNull &&
            col("p") - col("c") <= FunnelWindowSec, lit("converted"))
          .otherwise(lit("clicked_only")).as("state"))
      .groupBy(col("state")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("state"))
  }

  val q60FunnelOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS t
       |  FROM events),
       |per_user AS (
       |  SELECT user_id,
       |    min(CASE WHEN event_type = 'click' THEN t END) AS c
       |  FROM ev GROUP BY user_id),
       |p_after AS (
       |  SELECT ev.user_id, min(t) AS p
       |  FROM ev JOIN per_user USING (user_id)
       |  WHERE event_type = 'purchase' AND c IS NOT NULL AND t >= c
       |  GROUP BY ev.user_id)
       |SELECT CASE WHEN c IS NULL THEN 'no_click'
       |            WHEN p IS NOT NULL AND p - c <= $FunnelWindowSec
       |              THEN 'converted'
       |            ELSE 'clicked_only' END AS state,
       |  count(*) AS n_users
       |FROM per_user LEFT JOIN p_after USING (user_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val AnomalyTopK = 20

  /** q79: event-rate anomaly report — the ops-monitoring sweep an
    * ingestion pipeline runs over its own telemetry: for every
    * (event_type, hour) bucket, the per-mille deviation of that
    * hour's event count from the type's mean hourly count, top-k
    * most-deviant buckets. Deviation is relative (per-mille of the
    * type mean) so a high-volume type doesn't drown a quiet type's
    * outage; only OBSERVED hours enter the mean (an all-zero hour is
    * invisible here — the gap-filling variant of that question is
    * q62's grid). Integer throughout: mean = sum div hours, deviation
    * = |cnt−mean|·1000 div mean, mean ≥ 1 always.
    *
    * Plan shape: one shuffle of the events to (type, hour) counts
    * with map-side partial aggregation; the per-type means re-shuffle
    * only the TINY hourly table, then broadcast back (types-count
    * rows); top-k is TakeOrderedAndProject. */
  def q79EventAnomaly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        (expr("ts div 3600000000000") * 3600L).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val means = hourly.groupBy(col("event_type"))
      .agg(expr("sum(n_events) div count(1)").as("mean_events"))
    hourly.join(broadcast(means), "event_type")
      .select(col("event_type"), col("hour"), col("n_events"),
        col("mean_events"),
        expr("(abs(n_events - mean_events) * 1000) div mean_events")
          .as("dev_pm"))
      .orderBy(col("dev_pm").desc, col("event_type").asc, col("hour").asc)
      .limit(AnomalyTopK)
  }

  val q79EventAnomalyOracle: String =
    s"""WITH hourly AS (
       |  SELECT event_type,
       |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
       |    CAST(count(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1, 2),
       |means AS (
       |  SELECT event_type,
       |    CAST(sum(n_events) AS BIGINT) // count(*) AS mean_events
       |  FROM hourly GROUP BY 1)
       |SELECT h.event_type, h.hour, h.n_events, m.mean_events,
       |  (abs(h.n_events - m.mean_events) * 1000) // m.mean_events
       |    AS dev_pm
       |FROM hourly h JOIN means m USING (event_type)
       |ORDER BY dev_pm DESC, h.event_type ASC, h.hour ASC
       |LIMIT $AnomalyTopK""".stripMargin

  /** Open-interval sentinel for the current SCD2 version: avoids a
    * nullable valid_to (NULL would round-trip as NaN through the
    * driver's pandas compare) and makes the point-in-time BETWEEN
    * test branch-free. */
  val Scd2OpenEnd: Long = Long.MaxValue

  /** q104: slowly-changing-dimension (Type 2) build from a change
    * stream + point-in-time verification — the gaps-and-islands
    * treatment of `events`: each user's event_type sequence is
    * collapsed into maximal runs of the same state (islands), each
    * island becomes one dimension VERSION row [valid_from, valid_to)
    * with valid_to = the next version's valid_from ([[Scd2OpenEnd]]
    * for the current one), and the raw events are then joined back
    * point-in-time as the fact side — pit_n per version, which must
    * equal the island's own n_events (the audit a warehouse runs
    * before trusting an SCD2 dimension for as-of enrichment).
    * Returns (user_id, version, state, valid_from, valid_to,
    * n_events, pit_n).
    *
    * Island detection is the two-row_number difference (grp = rn −
    * rn_per_state, constant exactly within a run); both engines
    * order by (ts, event_id) — a total order, so runs are identical.
    *
    * 100 TB posture: both window passes and the version agg ride ONE
    * hash shuffle on user_id (per-task state = one user's timeline,
    * any user count scales out); the PIT join is user-keyed equi +
    * interval filter, and per-user fan-out is bounded by that user's
    * own timeline (versions × events of ONE user — corpus growth
    * adds users, not timeline length; a year-long hot user is
    * bounded by the q58 sessionizer's same argument). No data-scale
    * non-keyed shuffle anywhere. */
  def q104Scd2Islands(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val byUserState = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      // one user-keyed exchange feeds islands, versions AND the PIT
      // fact side (three consumers of the same event scan)
      .repartition(col("user_id"))
      .localCheckpoint(false)
    val versions = ev
      .withColumn("grp",
        row_number().over(byUser) - row_number().over(byUserState))
      .groupBy(col("user_id"), col("event_type").as("state"), col("grp"))
      .agg(min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("version", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
      .withColumn("valid_to", coalesce(
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("valid_from"))),
        lit(Scd2OpenEnd)))
    val pit = ev.select(col("user_id"), col("ts").as("fts"))
      .join(versions.select(col("user_id"), col("version"),
        col("valid_from"), col("valid_to")), Seq("user_id"))
      .filter(col("fts") >= col("valid_from") && col("fts") < col("valid_to"))
      .groupBy(col("user_id"), col("version"))
      .agg(count(lit(1)).as("pit_n"))
    versions.join(pit, Seq("user_id", "version"))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"), col("pit_n"))
      .orderBy(col("user_id"), col("version"))
  }

  val q104Scd2IslandsOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type,
       |    CAST(epoch_ns(ts) AS BIGINT) AS ts
       |  FROM events),
       |isl AS (
       |  SELECT user_id, event_type, ts,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id)
       |    - row_number() OVER (PARTITION BY user_id, event_type
       |      ORDER BY ts, event_id) AS grp
       |  FROM ev),
       |ver AS (
       |  SELECT user_id, event_type AS state, grp,
       |    min(ts) AS valid_from, count(*) AS n_events
       |  FROM isl GROUP BY user_id, event_type, grp),
       |dim AS (
       |  SELECT user_id, state, valid_from, n_events,
       |    CAST(row_number() OVER w AS INT) AS version,
       |    coalesce(lead(valid_from) OVER w, ${Scd2OpenEnd}) AS valid_to
       |  FROM ver WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)),
       |pit AS (
       |  SELECT d.user_id, d.version, count(*) AS pit_n
       |  FROM ev f JOIN dim d ON f.user_id = d.user_id
       |    AND f.ts >= d.valid_from AND f.ts < d.valid_to
       |  GROUP BY d.user_id, d.version)
       |SELECT d.user_id, d.version, d.state, d.valid_from, d.valid_to,
       |  CAST(d.n_events AS BIGINT) AS n_events,
       |  CAST(p.pit_n AS BIGINT) AS pit_n
       |FROM dim d JOIN pit p
       |  ON d.user_id = p.user_id AND d.version = p.version
       |ORDER BY d.user_id, d.version""".stripMargin

  /** q106: A/B experiment readout with CUPED variance reduction
    * (Deng et al. 2013) — deterministic hash assignment, a pre/post
    * cutover split, and the covariate-adjusted lift, all in exact
    * integer arithmetic. Returns ONE row: (n_c, n_t, mean_y_c_e4,
    * mean_y_t_e4, raw_lift_e4, theta_e6, cuped_lift_e4).
    *
    * Assignment: variant = md5('exp:'‖user_id) mod 2 — the
    * deterministic bucketing every experimentation platform uses (a
    * user hashes identically on every engine and every rerun).
    * Cutover = midpoint of the observed ts range (computed in-query,
    * one 1-row broadcast); x = a user's pre-cutover spend (cents),
    * y = post-cutover spend. CUPED: θ = cov(x,y)/var(x) pooled over
    * all users — as the integer ratio θ_e6 = (n·Σxy − Σx·Σy)·10⁶
    * div (n·Σx² − (Σx)²) in DECIMAL(38,0)/HUGEINT (the q55/q98
    * overflow treatment; n·Σxy ≈ 2·10²³ at ×100 scale) — and
    * cuped_lift = raw_lift − θ·(mean_x_t − mean_x_c), the adjusted
    * estimator whose variance drops by the x–y correlation². Zero
    * denominators (a variance-free covariate or an empty arm) yield
    * 0 by explicit CASE on BOTH engines, not an engine-dependent
    * null/error.
    *
    * 100 TB posture: one user-keyed shuffle to per-user (x, y) rows;
    * everything above is a 5-number algebraic aggregate (map-side
    * combined to ONE row) — the same mergeable-moments contract as
    * q94's sketch arm, so the readout never materializes anything
    * wider than a partial-moment row per partition. */
  def q106AbCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val bounds = ev.agg(min(col("ts")).as("tmin"), max(col("ts")).as("tmax"))
    val per = ev.crossJoin(broadcast(bounds))
      .withColumn("cut", expr("(tmin + tmax) div 2"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < col("cut"), col("cents")).otherwise(0L))
        .as("x"),
        sum(when(col("ts") >= col("cut"), col("cents")).otherwise(0L))
          .as("y"))
      .withColumn("variant",
        conv(substring(md5(concat(lit("exp:"),
          col("user_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 2)
    per.agg(
        sum(lit(1L)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("variant") === 0L, col("x")).otherwise(0L)).as("sx_c"),
        sum(when(col("variant") === 1L, col("x")).otherwise(0L)).as("sx_t"),
        sum(when(col("variant") === 0L, col("y")).otherwise(0L)).as("sy_c"),
        sum(when(col("variant") === 1L, col("y")).otherwise(0L)).as("sy_t"))
      .withColumn("theta_e6", expr(
        """CASE WHEN n * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000
          |  div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT) END""".stripMargin))
      .withColumn("mean_y_c_e4", expr(
        "CASE WHEN n_c = 0 THEN CAST(0 AS BIGINT) ELSE sy_c * 10000 div n_c END"))
      .withColumn("mean_y_t_e4", expr(
        "CASE WHEN n_t = 0 THEN CAST(0 AS BIGINT) ELSE sy_t * 10000 div n_t END"))
      .withColumn("raw_lift_e4", expr("mean_y_t_e4 - mean_y_c_e4"))
      .withColumn("mean_x_c_e4", expr(
        "CASE WHEN n_c = 0 THEN CAST(0 AS BIGINT) ELSE sx_c * 10000 div n_c END"))
      .withColumn("mean_x_t_e4", expr(
        "CASE WHEN n_t = 0 THEN CAST(0 AS BIGINT) ELSE sx_t * 10000 div n_t END"))
      .withColumn("cuped_lift_e4", expr(
        "raw_lift_e4 - theta_e6 * (mean_x_t_e4 - mean_x_c_e4) div 1000000"))
      .select(col("n_c"), col("n_t"), col("mean_y_c_e4"),
        col("mean_y_t_e4"), col("raw_lift_e4"), col("theta_e6"),
        col("cuped_lift_e4"))
  }

  val q106AbCupedOracle: String = {
    val hex6 =
      """(strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 1048576
        |    + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 65536
        |    + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 4096
        |    + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef', substring(hx, 5, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substring(hx, 6, 1)) - 1)""".stripMargin
    s"""WITH ev AS (
       |  SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS ts,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |bounds AS (
       |  SELECT (min(ts) + max(ts)) // 2 AS cut FROM ev),
       |per AS (
       |  SELECT user_id,
       |    CAST(sum(CASE WHEN ts < cut THEN cents ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN ts >= cut THEN cents ELSE 0 END) AS BIGINT) AS y
       |  FROM ev CROSS JOIN bounds GROUP BY user_id),
       |pv AS (
       |  SELECT x, y, ($hex6) % 2 AS variant FROM (
       |    SELECT x, y,
       |      substring(md5('exp:' || CAST(user_id AS VARCHAR)), 1, 6) AS hx
       |    FROM per)),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS HUGEINT) AS sxy,
       |    CAST(sum(x * x) AS HUGEINT) AS sxx,
       |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
       |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
       |    CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_c,
       |    CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
       |    CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_c,
       |    CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t
       |  FROM pv),
       |calc AS (
       |  SELECT n_c, n_t,
       |    CASE WHEN n * sxx - CAST(sx AS HUGEINT) * sx = 0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
       |        // (n * sxx - CAST(sx AS HUGEINT) * sx) AS BIGINT) END AS theta_e6,
       |    CASE WHEN n_c = 0 THEN 0 ELSE sy_c * 10000 // n_c END AS mean_y_c_e4,
       |    CASE WHEN n_t = 0 THEN 0 ELSE sy_t * 10000 // n_t END AS mean_y_t_e4,
       |    CASE WHEN n_c = 0 THEN 0 ELSE sx_c * 10000 // n_c END AS mean_x_c_e4,
       |    CASE WHEN n_t = 0 THEN 0 ELSE sx_t * 10000 // n_t END AS mean_x_t_e4
       |  FROM m)
       |SELECT n_c, n_t,
       |  CAST(mean_y_c_e4 AS BIGINT) AS mean_y_c_e4,
       |  CAST(mean_y_t_e4 AS BIGINT) AS mean_y_t_e4,
       |  CAST(mean_y_t_e4 - mean_y_c_e4 AS BIGINT) AS raw_lift_e4,
       |  theta_e6,
       |  CAST(mean_y_t_e4 - mean_y_c_e4
       |    - theta_e6 * (mean_x_t_e4 - mean_x_c_e4) // 1000000 AS BIGINT)
       |    AS cuped_lift_e4
       |FROM calc""".stripMargin
  }

  /** The conversion event type for q110. */
  val ConvType = "purchase"

  /** q110: multi-touch attribution — per touch channel (event_type),
    * credit under the three standard models: (channel, n_touches,
    * n_first, n_last, linear_e6).
    *
    * A JOURNEY is one user's touch events (non-purchase) between
    * consecutive purchases, attributed to the NEXT purchase: touch
    * event → journey j = (purchases seen so far) + 1, valid while
    * j ≤ that user's purchase count (touches after the last purchase
    * have no conversion and are dropped — the standard open-journey
    * rule; conversions with zero touches earn no channel credit).
    * First/last-touch award the whole conversion to the journey's
    * first/last channel by (ts, event_id); linear splits it evenly —
    * each touch earns 10⁶ div n_touches(journey), truncating
    * integer arithmetic both engines reproduce.
    *
    * 100 TB posture: one user-keyed shuffle carries the running
    * purchase count AND the journey window ranks (three window
    * functions over the same exchange); everything after is a
    * journey-then-channel aggregate chain, ≤ |event types| output
    * rows with map-side combine. */
  def q110Attribution(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("is_conv",
        (col("event_type") === ConvType).cast("long"))
      .withColumn("pc", sum(col("is_conv")).over(byUser))
      .localCheckpoint(false) // touches + per-user conversion totals
    val convTotals = ev.groupBy(col("user_id"))
      .agg(sum(col("is_conv")).as("n_conv"))
    val byJourney = Window.partitionBy(col("user_id"), col("j"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val touches = ev.filter(col("is_conv") === 0L)
      .withColumn("j", col("pc") + 1L)
      .join(convTotals, "user_id")
      .filter(col("j") <= col("n_conv"))
      .withColumn("rk", row_number().over(byJourney))
      .withColumn("rrk", row_number().over(
        Window.partitionBy(col("user_id"), col("j"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("jn", count(lit(1)).over(
        Window.partitionBy(col("user_id"), col("j"))))
    touches.groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("rrk") === 1, 1L).otherwise(0L)).as("n_last"),
        sum(expr("1000000 div jn")).as("linear_e6"))
      .orderBy(col("channel"))
  }

  val q110AttributionOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type,
       |    CAST(epoch_ns(ts) AS BIGINT) AS ts,
       |    CASE WHEN event_type = '$ConvType' THEN 1 ELSE 0 END
       |      AS is_conv
       |  FROM events),
       |pcd AS (
       |  SELECT *, CAST(sum(is_conv) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id) AS BIGINT) AS pc
       |  FROM ev),
       |ct AS (
       |  SELECT user_id, CAST(sum(is_conv) AS BIGINT) AS n_conv
       |  FROM ev GROUP BY user_id),
       |touches AS (
       |  SELECT p.user_id, p.event_id, p.ts, p.event_type,
       |    p.pc + 1 AS j
       |  FROM pcd p JOIN ct ON p.user_id = ct.user_id
       |  WHERE p.is_conv = 0 AND p.pc + 1 <= ct.n_conv),
       |ranked AS (
       |  SELECT event_type,
       |    row_number() OVER w AS rk,
       |    row_number() OVER (PARTITION BY user_id, j
       |      ORDER BY ts DESC, event_id DESC) AS rrk,
       |    count(*) OVER (PARTITION BY user_id, j) AS jn
       |  FROM touches
       |  WINDOW w AS (PARTITION BY user_id, j ORDER BY ts, event_id))
       |SELECT event_type AS channel,
       |  CAST(count(*) AS BIGINT) AS n_touches,
       |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_first,
       |  CAST(sum(CASE WHEN rrk = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_last,
       |  CAST(sum(1000000 // jn) AS BIGINT) AS linear_e6
       |FROM ranked GROUP BY event_type ORDER BY channel""".stripMargin

  /** q121: cohort lifetime-value matrix — the subscription-economics
    * triangle: customers grouped by FIRST-order month (the cohort),
    * revenue tracked by months-since-first (the age), cumulative
    * within each cohort. Per (cohort, age) cell: (cohort_ym, age,
    * n_cohort, n_active, rev_cents, cum_rev_cents,
    * cum_rev_per_cust_cents).
    *
    * 100 TB posture: one customer-keyed aggregation for cohort
    * assignment, one orders-side join back on the same key (both
    * sides already hash-partitioned by custkey — AQE reuses the
    * exchange), one (cohort × age) aggregation — months × months
    * cells, constant-size — and the cumulative Window partitions BY
    * COHORT (bounded rows per task). Cohort sizes re-join as a
    * months-row broadcast. Integer cents everywhere. */
  def q121CohortLtv(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val cohort = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cm"))
      .localCheckpoint(false) // cells join + cohort sizes read it
    val cell = o.join(cohort, "o_custkey")
      .groupBy(col("cm"), (col("m") - col("cm")).as("age"))
      .agg(sum(col("cents")).as("rev_cents"),
        countDistinct(col("o_custkey")).as("n_active"))
    val csize = cohort.groupBy(col("cm"))
      .agg(count(lit(1)).as("n_cohort"))
    val w = Window.partitionBy(col("cm")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.join(broadcast(csize), "cm")
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .withColumn("cum_rev_per_cust_cents",
        expr("cum_rev_cents div n_cohort"))
      .select(
        expr("CAST((cm div 12) * 100 + (cm % 12) + 1 AS BIGINT)")
          .as("cohort_ym"),
        col("age").cast("long").as("age"), col("n_cohort"),
        col("n_active"), col("rev_cents"), col("cum_rev_cents"),
        col("cum_rev_per_cust_cents"))
      .orderBy(col("cohort_ym"), col("age"))
  }

  val q121CohortLtvOracle: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |cohort AS (
      |  SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
      |cell AS (
      |  SELECT cm, o.m - cm AS age,
      |    CAST(sum(cents) AS BIGINT) AS rev_cents,
      |    CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active
      |  FROM o JOIN cohort ON o.o_custkey = cohort.o_custkey
      |  GROUP BY 1, 2),
      |csize AS (
      |  SELECT cm, CAST(count(*) AS BIGINT) AS n_cohort
      |  FROM cohort GROUP BY 1)
      |SELECT CAST((cm // 12) * 100 + (cm % 12) + 1 AS BIGINT)
      |    AS cohort_ym,
      |  CAST(age AS BIGINT) AS age, n_cohort, n_active, rev_cents,
      |  CAST(sum(rev_cents) OVER (PARTITION BY cm ORDER BY age)
      |    AS BIGINT) AS cum_rev_cents,
      |  CAST(sum(rev_cents) OVER (PARTITION BY cm ORDER BY age)
      |    AS BIGINT) // n_cohort AS cum_rev_per_cust_cents
      |FROM cell JOIN csize USING (cm)
      |ORDER BY cohort_ym, age""".stripMargin

  /** q122: robust daily-rate anomaly report — q79's mean-based
    * deviation breaks when the anomaly itself inflates the mean (the
    * masking problem); this is the median/MAD version (Hampel's
    * robust z): per event type over its daily counts — days
    * observed, 2×median, 4×MAD, the max robust z (millis), days
    * with z ≥ 3 MAD, and the (earliest) peak day. (event_type,
    * n_days, med2, mad4, max_z_e3, n_anomalies, peak_day).
    *
    * Exactness: medians of integer counts land on halves — carried
    * as med2 = 2·median and mad4 = 2·median(2|x−med|), both exactly
    * integer, so z_e3 = 4|x−med|·1000 div 4·MAD is pure integer
    * division. Both engines interpolate the even-count median
    * identically (linear midpoint).
    *
    * 100 TB posture: one corpus shuffle to (type, day) counts with
    * map-side combine; everything after runs on the daily table
    * (types × days rows). The exact in-group median is a
    * sort-based aggregate over ONE TYPE's days per task — bounded by
    * the calendar, not the corpus; at a 1000-type deployment the
    * same plan fans out 1000 tasks. */
  def q122MadAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("event_type"),
        (expr("ts div 86400000000000") * 86400L).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // median pass + deviation pass read it
    val med = daily.groupBy(col("event_type"))
      .agg(expr("CAST(round(percentile(n, 0.5) * 2) AS BIGINT)")
        .as("med2"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev2", expr("abs(2 * n - med2)"))
      .localCheckpoint(false) // MAD pass + z pass read it
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("CAST(round(percentile(dev2, 0.5) * 2) AS BIGINT)")
        .as("mad4"))
    val z = dev.join(broadcast(mad), "event_type")
      .withColumn("z_e3",
        expr("(dev2 * 2 * 1000) div greatest(mad4, 1)"))
      .localCheckpoint(false) // stats + argmax read it
    val stats = z.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max(col("med2")).as("med2"),
        max(col("mad4")).as("mad4"), max(col("z_e3")).as("max_z_e3"),
        sum(when(col("z_e3") >= 3000L, 1L).otherwise(0L))
          .as("n_anomalies"))
      .localCheckpoint(false) // argmax probe + report read it
    val peak = z
      .join(broadcast(stats.select(col("event_type"),
        col("max_z_e3"))), "event_type")
      .filter(col("z_e3") === col("max_z_e3"))
      .groupBy(col("event_type")).agg(min(col("day")).as("peak_day"))
    stats.join(broadcast(peak), "event_type")
      .select(col("event_type"), col("n_days"), col("med2"),
        col("mad4"), col("max_z_e3"), col("n_anomalies"),
        col("peak_day"))
      .orderBy(col("event_type"))
  }

  val q122MadAnomalyOracle: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |med AS (
      |  SELECT event_type,
      |    CAST(round(quantile_cont(n, 0.5) * 2) AS BIGINT) AS med2
      |  FROM daily GROUP BY 1),
      |dev AS (
      |  SELECT daily.event_type, day, n, med2,
      |    abs(2 * n - med2) AS dev2
      |  FROM daily JOIN med ON daily.event_type = med.event_type),
      |mad AS (
      |  SELECT event_type,
      |    CAST(round(quantile_cont(dev2, 0.5) * 2) AS BIGINT) AS mad4
      |  FROM dev GROUP BY 1),
      |z AS (
      |  SELECT dev.event_type, day, med2, mad4,
      |    (dev2 * 2 * 1000) // greatest(mad4, 1) AS z_e3
      |  FROM dev JOIN mad ON dev.event_type = mad.event_type),
      |stats AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    max(med2) AS med2, max(mad4) AS mad4,
      |    max(z_e3) AS max_z_e3,
      |    CAST(sum(CASE WHEN z_e3 >= 3000 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_anomalies
      |  FROM z GROUP BY 1),
      |peak AS (
      |  SELECT z.event_type, min(day) AS peak_day
      |  FROM z JOIN stats ON z.event_type = stats.event_type
      |  WHERE z_e3 = max_z_e3 GROUP BY 1)
      |SELECT stats.event_type, n_days, med2, mad4, max_z_e3,
      |  n_anomalies, peak_day
      |FROM stats JOIN peak ON stats.event_type = peak.event_type
      |ORDER BY stats.event_type""".stripMargin

  /** q124: top session paths — sequence mining over gap-sessionized
    * event streams (the q58 sessions, gap = [[SessionGapSec]]): each
    * session becomes its ordered event-type path ("view>click>
    * purchase"), the report is the [[PathTopK]] most frequent paths —
    * (path, n_events, n_sessions), frequency-descending. The
    * flow-analysis primitive behind funnel discovery and UX
    * navigation audits.
    *
    * 100 TB posture: the q58 shape — ONE user-keyed shuffle feeds
    * both window passes and the per-session path assembly
    * (sort_array over one SESSION's events: per-task state bounded
    * by session length, not user count); path counting collapses
    * map-side to the distinct-path table and the report is
    * TakeOrderedAndProject([[PathTopK]]), never a full sort. */
  def q124SessionPaths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("t"))
      .withColumn("prev", lag(col("t"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("t") - col("prev") > SessionGapSec, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(byUser))
      .groupBy(col("user_id"), col("sid"))
      .agg(expr("array_join(transform(sort_array(collect_list(" +
        "struct(t, event_id, event_type))), x -> x.event_type), '>')")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .select(col("path"),
        size(split(col("path"), ">")).cast("long").as("n_events"),
        col("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(PathTopK)
  }

  val PathTopK = 25

  val q124SessionPathsOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS t
       |  FROM events),
       |marked AS (
       |  SELECT user_id, event_id, event_type, t,
       |    CASE WHEN lag(t) OVER w IS NULL
       |           OR t - lag(t) OVER w > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, t,
       |    sum(new_s) OVER (PARTITION BY user_id
       |      ORDER BY t, event_id) AS sid
       |  FROM marked),
       |paths AS (
       |  SELECT user_id, sid,
       |    array_to_string(list(event_type ORDER BY t, event_id), '>')
       |      AS path
       |  FROM sess GROUP BY user_id, sid),
       |cnt AS (
       |  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
       |  FROM paths GROUP BY path)
       |SELECT path,
       |  CAST(len(string_split(path, '>')) AS BIGINT) AS n_events,
       |  n_sessions
       |FROM cnt ORDER BY n_sessions DESC, path LIMIT $PathTopK"""
      .stripMargin

  /** q125: view→purchase conversion-lag histogram — for every
    * purchase, the time since the user's most recent PRIOR view,
    * bucketed into fixed human latency bands (plus a no-prior-view
    * band): (bucket, n_conversions). The funnel-latency report
    * behind attribution windows and session-timeout tuning.
    *
    * 100 TB posture: ONE user-keyed window shuffle (running
    * conditional max over the strict past — per-task state is one
    * long per user timeline), then a ≤6-group map-side collapse.
    * Lag is computed in epoch NANOS on both engines (diffing
    * per-event floored seconds would disagree with the floored
    * nano-diff at sub-second offsets). */
  def q125ConversionLag(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("pv",
        max(when(col("event_type") === "view", col("ts"))).over(byUser))
      .filter(col("event_type") === "purchase")
      .withColumn("sec", expr("(ts - pv) div 1000000000"))
      .withColumn("bucket", expr(
        """CASE WHEN pv IS NULL THEN 'no_prior_view'
          |WHEN sec < 60 THEN 'a_lt_1m'
          |WHEN sec < 600 THEN 'b_lt_10m'
          |WHEN sec < 3600 THEN 'c_lt_1h'
          |WHEN sec < 86400 THEN 'd_lt_1d'
          |ELSE 'e_ge_1d' END""".stripMargin.replace('\n', ' ')))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy(col("bucket"))
  }

  val q125ConversionLagOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(epoch_ns(ts) AS BIGINT) AS tns
      |  FROM events),
      |pvd AS (
      |  SELECT user_id, event_id, event_type, tns,
      |    max(CASE WHEN event_type = 'view' THEN tns END) OVER (
      |      PARTITION BY user_id ORDER BY tns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv
      |  FROM ev),
      |lagged AS (
      |  SELECT (tns - pv) // 1000000000 AS sec, pv
      |  FROM pvd WHERE event_type = 'purchase')
      |SELECT CASE WHEN pv IS NULL THEN 'no_prior_view'
      |    WHEN sec < 60 THEN 'a_lt_1m'
      |    WHEN sec < 600 THEN 'b_lt_10m'
      |    WHEN sec < 3600 THEN 'c_lt_1h'
      |    WHEN sec < 86400 THEN 'd_lt_1d'
      |    ELSE 'e_ge_1d' END AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_conversions
      |FROM lagged GROUP BY 1 ORDER BY 1""".stripMargin
}
