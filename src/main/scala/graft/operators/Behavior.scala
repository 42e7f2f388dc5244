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
}
