package graft.operators

import java.security.MessageDigest
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q149/q150/q151 — changepoint, concentration and SRM audits on
  * hand-computable fixtures (the planted level shift must be dated
  * exactly; Gini/decile-share must match the closed form; the SRM
  * arm counts must match an independent JVM md5 reimplementation). */
class ConcentrationSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q149: a planted level shift is dated exactly, with exact " +
      "CUSUM peak and segment means") {
    import s.implicits._
    // days 0-4: 2 events/day; days 5-9: 10/day → cp after day 4
    val dir = java.nio.file.Files.createTempDirectory("cusum")
    val rows = for {
      d <- 0 until 10
      i <- 0 until (if (d < 5) 2 else 10)
    } yield (d.toLong * 100 + i,
      new Timestamp((d.toLong * 86400 + i) * 1000L), 1L, "e", 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val r = EventStats.q149CusumChangepoint(s, dir.toString)
      .collect().head
    // D=10, T=60; S_5=10 → stat |10·10 − 5·60| = 200 at day 4
    assert(r.getLong(0) == 10L && r.getLong(1) == 60L)
    assert(r.getLong(2) == 4L, s"cp_day ${r.getLong(2)}")
    assert(r.getLong(3) == 200L, s"peak ${r.getLong(3)}")
    assert(r.getLong(4) == 2000L && r.getLong(5) == 10000L)
  }

  test("q150: Gini and top-decile share match the closed form") {
    import s.implicits._
    // revenues 100, 100, 300, 500 cents → G = (2·3200 − 5·1000) /
    // (4·1000) = 0.35; top decile = top-1 customer = 500/1000
    val dir = java.nio.file.Files.createTempDirectory("gini")
    Seq((1L, 1.00), (2L, 1.00), (3L, 3.00), (4L, 5.00))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    val r = OrderStats.q150RevenueGini(s, dir.toString).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 1000L)
    assert(r.getLong(2) == 350000L, s"gini ${r.getLong(2)}")
    assert(r.getLong(3) == 500000L, s"decile ${r.getLong(3)}")
  }

  test("q150: perfect equality scores 0; a monopolist approaches " +
      "the (N-1)/N ceiling") {
    import s.implicits._
    val dirEq = java.nio.file.Files.createTempDirectory("gini-eq")
    (1L to 5L).map(i => (i, 2.00)).toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite")
      .parquet(dirEq.resolve("orders.parquet").toString)
    assert(OrderStats.q150RevenueGini(s, dirEq.toString)
      .collect().head.getLong(2) == 0L)
    val dirMono = java.nio.file.Files.createTempDirectory("gini-mono")
    // 0-revenue customers exist in the orders table via 0.00 orders
    ((1L to 4L).map(i => (i, 0.00)) :+ ((5L, 100.00)))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite")
      .parquet(dirMono.resolve("orders.parquet").toString)
    // one customer holds everything: G = (N−1)/N = 0.8 exactly
    assert(OrderStats.q150RevenueGini(s, dirMono.toString)
      .collect().head.getLong(2) == 800000L)
  }

  private def jvmArm(userId: Long): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"exp:$userId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("q151: arm counts match the independent JVM md5 chain and " +
      "chi2 is the exact integer formula") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("srm")
    val users = (1L to 40L)
    // each user exposed twice (distinct-unit counting must dedup)
    val rows = users.flatMap(u => Seq(
      (u * 2, new Timestamp(u * 1000L), u, "exp", 0.0, "{}"),
      (u * 2 + 1, new Timestamp(u * 2000L), u, "exp", 0.0, "{}")))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val na = users.count(jvmArm(_) == 0L).toLong
    val nb = users.size - na
    val r = EventStats.q151SrmAudit(s, dir.toString).collect().head
    assert(r.getString(0) == "exp")
    assert(r.getLong(1) == na && r.getLong(2) == nb,
      s"(${r.getLong(1)}, ${r.getLong(2)}) != ($na, $nb)")
    val chi2 = (na - nb) * (na - nb) * 1000000L / (na + nb)
    assert(r.getLong(3) == chi2)
    assert(r.getLong(4) ==
      (if (chi2 >= EventStats.SrmChi2CritPpm) 1L else 0L))
  }
}
