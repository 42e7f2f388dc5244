package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Contract pins for the behavioral trio (exact values are
  * oracle-gated; these pin the invariants). */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("q79: hand-computed hourly means and per-mille deviations") {
    import spark.implicits._
    // type a: hours 0h×3, 1h×1 → mean (3+1) div 2 = 2, both hours
    // deviate |cnt−2|·1000 div 2 = 500; type b: one hour at its own
    // mean → dev 0. ts is raw nanos (the engine's reading of the
    // TIMESTAMP(NANOS) column).
    val h = 3600L * 1000000000L
    val tmp = java.nio.file.Files.createTempDirectory("q79")
    val rows = Seq(
      (1L, 0L, 1L, "a", 0.0, "{}"), (2L, 1L, 1L, "a", 0.0, "{}"),
      (3L, 2L, 1L, "a", 0.0, "{}"), (4L, h, 1L, "a", 0.0, "{}")) ++
      (10L to 19L).map(i => (i, 5L, 2L, "b", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(tmp.resolve("events.parquet").toString)
    val out = Behavior.q79EventAnomaly(spark, tmp.toString).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(("a", 0L, 3L, 2L, 500L), ("a", 3600L, 1L, 2L, 500L),
      ("b", 0L, 10L, 10L, 0L)))
  }

  test("q58: sessions partition the event stream and never run backwards") {
    val sess = Behavior.q58SessionizeBatch(spark, dir)
    val totalEvents = Tables.load(spark, dir, "events").count()
    assert(sess.agg(sum("n_events")).head.getLong(0) == totalEvents)
    assert(sess.filter(col("t_end") < col("t_start")).count() == 0)
    assert(sess.filter(col("duration_sec") < 0).count() == 0)
    // sids are dense 1..n per user
    val badSid = sess.groupBy("user_id")
      .agg(min("sid").as("lo"), max("sid").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(badSid == 0)
  }

  test("q59: the offset-0 cell holds the whole cohort; cells never exceed it") {
    val r = Behavior.q59Retention(spark, dir)
    val day0 = r.filter(col("offset_days") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    val over = r.join(day0, "cohort_day")
      .filter(col("n_users") > col("cohort_size")).count()
    assert(over == 0)
    val cohortTotal = day0.agg(sum("cohort_size")).head.getLong(0)
    val userTotal = Tables.load(spark, dir, "events")
      .select(countDistinct("user_id")).head.getLong(0)
    assert(cohortTotal == userTotal, "every user belongs to exactly one cohort")
  }

  test("q62: the filled series is dense, gap rows are flagged, LOCF holds") {
    val g = Behavior.q62Gapfill(spark, dir)
    // dense grid: every (type, hour) combination exactly once
    val types = g.select("event_type").distinct().count()
    val hours = g.select("hour").distinct().count()
    assert(g.count() == types * hours)
    assert(g.filter(col("filled") === 1 && col("n_events") =!= 0).count() == 0)
    // LOCF means cents never goes null and a filled row repeats some
    // earlier observed value (or 0 before the first observation)
    assert(g.filter(col("cents_locf").isNull).count() == 0)
  }

  test("q60: funnel states partition the user population") {
    val f = Behavior.q60Funnel(spark, dir).collect()
    val userTotal = Tables.load(spark, dir, "events")
      .select(countDistinct("user_id")).head.getLong(0)
    assert(f.map(_.getAs[Long]("n_users")).sum == userTotal)
    val states = f.map(_.getAs[String]("state")).toSet
    assert(states.subsetOf(Set("no_click", "clicked_only", "converted")))
  }
}
