package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q146/q147/q148 event-shape statistics on hand-computable
  * fixtures: per-user gap attribution (q146 must not mix users), the
  * exact CV² algebra, peak/tie selection (q147), and the rule-of-16
  * integer protocol (q148). */
class EventStatsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def eventsDir(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eventstats")
    rows.map { case (id, tSec, user, typ, v) =>
      (id, new Timestamp(tSec * 1000L), user, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  test("q146: gaps are per-user (never across users) and CV2 is the " +
      "exact integer algebra") {
    // user 1 "click" at t=0,10,30 → gaps 10,20; user 2 "click" at
    // t=1000 → no gap (would be a 970s cross-user artifact if mixed)
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "click", 1.0), (2L, 10L, 1L, "click", 1.0),
      (3L, 30L, 1L, "click", 1.0), (4L, 1000L, 2L, "click", 1.0)))
    val r = EventStats.q146Burstiness(s, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "click")
    assert(row.getLong(1) == 2L, "cross-user gap leaked in")
    assert(row.getLong(2) == 15000L) // mean(10,20)=15s → 15000ms
    // n=2, sg=30, sg2=500: cv2 = 2·(2·500−900)·1e6/(1·900) = 222222
    assert(row.getLong(3) == 222222L, s"cv2 ${row.getLong(3)}")
  }

  test("q146: a perfectly regular series reports CV2 = 0") {
    val dir = eventsDir((0L until 5L).map(i =>
      (i, i * 60L, 1L, "cron", 0.0)))
    val r = EventStats.q146Burstiness(s, dir).collect().head
    assert(r.getLong(1) == 4L && r.getLong(3) == 0L)
  }

  test("q147: peak hour, share and uniform lift; ties take the " +
      "earliest hour") {
    // type "a": 3 events in hour 2, 1 in hour 5 → peak (2, 3),
    // share 750000 ppm, lift 18e6; type "b": 1 event each in hours
    // 3 and 7 → tie broken to hour 3, share 500000, lift 12e6
    val dir = eventsDir(Seq(
      (1L, 2 * 3600L, 1L, "a", 0.0), (2L, 2 * 3600 + 5L, 2L, "a", 0.0),
      (3L, 2 * 3600 + 9L, 3L, "a", 0.0), (4L, 5 * 3600L, 1L, "a", 0.0),
      (5L, 7 * 3600L, 1L, "b", 0.0), (6L, 3 * 3600L, 1L, "b", 0.0)))
    val got = EventStats.q147Seasonality(s, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("a") == ((4L, 2L, 3L, 750000L, 18000000L)), got("a"))
    assert(got("b") == ((2L, 3L, 1L, 500000L, 12000000L)), got("b"))
  }

  test("q148: the rule-of-16 integer protocol on a hand case") {
    // type "buy": cents 100, 200, 300, 400 → n=4, mean=250,
    // var = (4·300000 − 1000²)/(4·3) = 16666 (floored),
    // mde = 250/20 = 12, n_per_arm = ceil(16·16666/144) = 1852
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "buy", 1.0), (2L, 10L, 1L, "buy", 2.0),
      (3L, 20L, 1L, "buy", 3.0), (4L, 30L, 1L, "buy", 4.0)))
    val r = EventStats.q148PowerAnalysis(s, dir).collect().head
    assert(r.getString(0) == "buy")
    assert(r.getLong(1) == 4L && r.getLong(2) == 250L)
    assert(r.getLong(3) == 16666L, s"var ${r.getLong(3)}")
    assert(r.getLong(4) == 12L)
    assert(r.getLong(5) == (16L * 16666L + 143L) / 144L,
      s"n_per_arm ${r.getLong(5)}")
  }

  test("q148: degenerate designs (n<2 or zero mean) report 0, not " +
      "a division error") {
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "solo", 5.0), // n = 1
      (2L, 0L, 1L, "free", 0.0), (3L, 10L, 1L, "free", 0.0))) // mean 0
    val got = EventStats.q148PowerAnalysis(s, dir).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(got == Map("solo" -> 0L, "free" -> 0L))
  }

  test("q168: exact ACF on an alternating series (negative lag-1, " +
      "positive lag-2)") {
    // daily counts over days 0..3: x = [2,4,2,4] (ts in day units of
    // 86400s). S=12, n=4, c = 4x−12 = [−4,4,−4,4], den = 64.
    // lag1: Σ c_t·c_{t+1} = −48 → −750000; lag2: 32 → 500000.
    val rows = for {
      (day, cnt) <- Seq((0L, 2), (1L, 4), (2L, 2), (3L, 4))
      k <- 0 until cnt
    } yield ((day * 10 + k).toLong, day * 86400L, 1L, "e", 0.0)
    val dir = eventsDir(rows)
    val got = EventStats.q168Acf(s, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (3L, -750000L), s"lag1 ${got(1L)}")
    assert(got(2L) == (2L, 500000L), s"lag2 ${got(2L)}")
    assert(got(3L) == (1L, -250000L), s"lag3 ${got(3L)}")
    assert(!got.contains(4L), "no lag-4 terms exist on a 4-day span")
  }

  test("q168: missing days are densified as true zeros") {
    // events on days 0 and 2 only → series [1,0,1]: S=2, n=3,
    // c = 3x−2 = [1,−2,1], den=6; lag1: −4 → −666666; lag2: 1 → 166666
    val dir = eventsDir(Seq(
      (1L, 0L, 1L, "e", 0.0), (2L, 2 * 86400L, 1L, "e", 0.0)))
    val got = EventStats.q168Acf(s, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (2L, -666666L), s"lag1 ${got(1L)}")
    assert(got(2L) == (1L, 166666L), s"lag2 ${got(2L)}")
  }
}
