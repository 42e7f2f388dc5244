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
}
