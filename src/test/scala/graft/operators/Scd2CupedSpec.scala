package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q104 SCD2 island/version semantics and q106 CUPED guards on
  * planted event streams (corpus output is oracle-gated). */
class Scd2CupedSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def eventsDir(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scd2-events")
    rows.map { case (eid, ts, uid, et, v) => (eid, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  test("q104: runs collapse to versions, intervals chain, PIT " +
      "counts equal island counts") {
    // user 1: A A B A → versions A[1,3) B[3,4) A[4,∞)
    val dir = eventsDir(Seq(
      (1L, 1L, 1L, "A", 0.0), (2L, 2L, 1L, "A", 0.0),
      (3L, 3L, 1L, "B", 0.0), (4L, 4L, 1L, "A", 0.0)))
    val rows = Behavior.q104Scd2Islands(s, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows === Seq(
      (1L, 1, "A", 1L, 3L, 2L, 2L),
      (1L, 2, "B", 3L, 4L, 1L, 1L),
      (1L, 3, "A", 4L, Behavior.Scd2OpenEnd, 1L, 1L)))
  }

  test("q104: versions partition each user's events (corpus-level " +
      "invariant)") {
    val dir = "/root/testdata/sf0.001"
    val out = Behavior.q104Scd2Islands(s, dir)
    import org.apache.spark.sql.functions._
    // every version's PIT count equals its island count — the SCD2
    // audit the operator exists to run
    assert(out.filter(col("pit_n") =!= col("n_events")).count() === 0L)
    val total = out.agg(sum("n_events")).head.getLong(0)
    assert(total === graft.Tables.load(s, dir, "events").count())
  }

  test("q106: a variance-free covariate hits the guard — theta 0, " +
      "CUPED collapses to the raw lift") {
    // every user: one pre event (value 0) and one post event; x = 0
    // for everyone → var(x) = 0 → theta = 0, cuped == raw
    val dir = eventsDir((1L to 8L).flatMap { u =>
      Seq((u * 2 - 1, 0L, u, "e", 0.0),
        (u * 2, 100L, u, "e", u * 10.0))
    })
    val r = Behavior.q106AbCuped(s, dir).collect().head
    val (nC, nT) = (r.getLong(0), r.getLong(1))
    assert(nC + nT === 8L)
    assert(r.getLong(5) === 0L) // theta_e6
    assert(r.getLong(4) === r.getLong(6)) // raw_lift == cuped_lift
  }

  test("q110: journeys split at purchases, open tails drop, credit " +
      "models agree on a hand case") {
    // user 1: view(t1) click(t2) PURCHASE(t3) error(t4) — journey 1
    // = {view, click} (first=view, last=click, linear 500000 each);
    // the error after the last purchase is an open tail → dropped.
    // user 2: a purchase with no touches → no channel credit.
    val dir = eventsDir(Seq(
      (1L, 1L, 1L, "view", 0.0), (2L, 2L, 1L, "click", 0.0),
      (3L, 3L, 1L, "purchase", 0.0), (4L, 4L, 1L, "error", 0.0),
      (5L, 1L, 2L, "purchase", 0.0)))
    val rows = Behavior.q110Attribution(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows === Seq(
      ("click", 1L, 0L, 1L, 500000L),
      ("view", 1L, 1L, 0L, 500000L)))
  }

  test("q110: multi-journey user — second journey's touches credit " +
      "the second conversion") {
    // journeys: {view} → P1, {click, click} → P2
    val dir = eventsDir(Seq(
      (1L, 1L, 7L, "view", 0.0), (2L, 2L, 7L, "purchase", 0.0),
      (3L, 3L, 7L, "click", 0.0), (4L, 4L, 7L, "click", 0.0),
      (5L, 5L, 7L, "purchase", 0.0)))
    val rows = Behavior.q110Attribution(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows === Seq(
      ("click", 2L, 1L, 1L, 1000000L),
      ("view", 1L, 1L, 1L, 1000000L)))
  }

  test("q106: corpus readout is total and balanced-ish") {
    val dir = "/root/testdata/sf0.001"
    val r = Behavior.q106AbCuped(s, dir).collect().head
    val users = graft.Tables.load(s, dir, "events")
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) === users)
    assert(r.getLong(0) > 0L && r.getLong(1) > 0L)
  }
}
