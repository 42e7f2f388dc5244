package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q123 RFM segmentation, q124 session paths, q125 conversion lag on
  * hand-computed fixtures. */
class RfmPathsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  test("q123: quintiles from the exact CDF, ties share a quintile") {
    import s.implicits._
    val dir = tmp("q123")
    // 5 customers, one order each on consecutive days, $1..$5:
    // r spreads 4..0 → quintiles 4..0; f all 1 → everyone f_q = 4
    // (one tied value, cum = 5); m spreads → quintiles 0..4.
    val d = (1 to 5).map(i => Timestamp.valueOf(f"2024-01-0$i%d 00:00:00"))
    Seq((1L, d(0), 1.00), (2L, d(1), 2.00), (3L, d(2), 3.00),
      (4L, d(3), 4.00), (5L, d(4), 5.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(dir.resolve("orders.parquet").toString)
    val rows = OrderStats.q123RfmSegments(s, dir.toString).collect()
      .toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows === Seq(
      (0L, 4L, 4L, 1L, 500L),
      (1L, 4L, 3L, 1L, 400L),
      (2L, 4L, 2L, 1L, 300L),
      (3L, 4L, 1L, 1L, 200L),
      (4L, 4L, 0L, 1L, 100L)))
  }

  test("q124: sessions split at the gap, paths counted and ranked") {
    import s.implicits._
    val dir = tmp("q124")
    val sec = 1000000000L
    // user 1: A(0) B(10s) | gap > 1800s | C(4000s); user 2: A(0) B(5s)
    Seq(
      (1L, 0L * sec, 1L, "A"), (2L, 10L * sec, 1L, "B"),
      (3L, 4000L * sec, 1L, "C"),
      (4L, 0L * sec, 2L, "A"), (5L, 5L * sec, 2L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(dir.resolve("events.parquet").toString)
    val rows = Behavior.q124SessionPaths(s, dir.toString).collect()
      .toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows === Seq(("A>B", 2L, 2L), ("C", 1L, 1L)))
  }

  test("q125: purchase lag buckets against the latest prior view") {
    import s.implicits._
    val dir = tmp("q125")
    val sec = 1000000000L
    // user 1: view(0) purchase(30s) → lt_1m; view(40s)
    // purchase(740s) → lag 700s → lt_1h; user 2: purchase with no
    // prior view.
    Seq(
      (1L, 0L * sec, 1L, "view"), (2L, 30L * sec, 1L, "purchase"),
      (3L, 40L * sec, 1L, "view"), (4L, 740L * sec, 1L, "purchase"),
      (5L, 5L * sec, 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(dir.resolve("events.parquet").toString)
    val rows = Behavior.q125ConversionLag(s, dir.toString).collect()
      .toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(rows === Seq(("a_lt_1m", 1L), ("c_lt_1h", 1L),
      ("no_prior_view", 1L)))
  }
}
