package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q121 cohort LTV and q122 MAD anomaly on hand-computed fixtures. */
class CohortMadSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(prefix)

  private def ym(y: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"$y%04d-$m%02d-15 00:00:00")

  test("q121: cohort cells, actives, cumulative and per-customer LTV") {
    import s.implicits._
    val dir = tmp("q121")
    // cust 1: Jan $1, Feb $2; cust 2: Jan $3, Mar $1; cust 3: Feb $5
    Seq((1L, ym(2024, 1), 1.00), (1L, ym(2024, 2), 2.00),
      (2L, ym(2024, 1), 3.00), (2L, ym(2024, 3), 1.00),
      (3L, ym(2024, 2), 5.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(dir.resolve("orders.parquet").toString)
    val rows = Behavior.q121CohortLtv(s, dir.toString).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows === Seq(
      (202401L, 0L, 2L, 2L, 400L, 400L, 200L),
      (202401L, 1L, 2L, 1L, 200L, 600L, 300L),
      (202401L, 2L, 2L, 1L, 100L, 700L, 350L),
      (202402L, 0L, 1L, 1L, 500L, 500L, 500L)))
  }

  test("q122: robust z flags the spike day the mean-based q79 would " +
      "let inflate the baseline") {
    import s.implicits._
    val dir = tmp("q122")
    // daily counts for type A over 5 days: 1,2,2,3,10
    // med2 = 4, dev2 = [2,0,0,2,16], mad4 = 4,
    // z_e3 = [1000,0,0,1000,8000] → max 8000 at day 4, one anomaly.
    val day = 86400L * 1000000000L
    val rows0 = Seq.tabulate(5) {
      d => Seq.fill(Seq(1, 2, 2, 3, 10)(d))(d)
    }.flatten.zipWithIndex.map { case (d, i) =>
      (i.toLong, d * day + i, 1L, "A")
    }
    rows0.toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(dir.resolve("events.parquet").toString)
    val rows = Behavior.q122MadAnomaly(s, dir.toString).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows === Seq(("A", 5L, 4L, 4L, 8000L, 1L, 4L * 86400L)))
  }
}
