package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q161's Kaplan–Meier life table on a hand corpus small enough to
  * unroll on paper — both exit classes in both periods, the truncating
  * survival recurrence checked digit-exact. */
class SurvivalSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  /** (custkey, orderkey, epoch day). */
  private def fixtureDir(orders: Seq[(Long, Long, Long)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("surv-fix")
    orders.map { case (c, o, d) =>
      (c, o, new Timestamp(d * 86400000L))
    }.toDF("o_custkey", "o_orderkey", "o_orderdate")
      .write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("hand life table: gaps, censoring at the horizon, truncating " +
      "KM product") {
    // cust 1 orders at days 0, 30, 35; cust 2 at day 0; horizon = 35.
    // Durations (28-day periods): obs 30 (k=1), obs 5 (k=0),
    // censored 0 (k=0, cust 1's last order), censored 35 (k=1, cust 2).
    val dir = fixtureDir(Seq(
      (1L, 1L, 0L), (1L, 2L, 30L), (1L, 3L, 35L), (2L, 4L, 0L)))
    val rows = Survival.q161RepurchaseSurvival(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      // k=0: risk 4, one repurchase, one censor; S = 10⁶·3 div 4
      (0L, 4L, 1L, 1L, 250000L, 750000L),
      // k=1: risk 2, one repurchase, one censor; S = 750000·1 div 2
      (1L, 2L, 1L, 1L, 500000L, 375000L)), s"got ${rows.toSeq}")
  }

  test("gap periods with no exits keep the risk set and survival flat") {
    // one customer, orders 60 days apart: the observed duration lands
    // in period 2, the censored one in period 0 — period 1 is a grid
    // row with no exits.
    val dir = fixtureDir(Seq((1L, 1L, 0L), (1L, 2L, 60L)))
    val rows = Survival.q161RepurchaseSurvival(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 0L, 1L, 1000000L), // censored-only exit: S unchanged
      (1L, 1L, 0L, 0L, 1000000L), // empty grid period
      (2L, 1L, 1L, 0L, 0L)), // the lone survivor repurchases: S → 0
      s"got ${rows.toSeq}")
  }
}
