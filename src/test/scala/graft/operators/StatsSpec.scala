package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q111 join-cardinality estimation and q112 decayed ranking on
  * hand-computed fixtures. */
class StatsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(
      orders: Seq[(Long, Timestamp)],
      lineitem: Seq[(Long, Long, Double)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stats-fix")
    orders.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    lineitem.toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("q111: exact counts, independence and histogram estimates on " +
      "a hand case") {
    // orders keys {1,2,3,4}; lineitem orderkeys [1,1,2,3], partkeys
    // [10,10,10,20]. PK/FK join: exact 4, both estimates 4, err 0.
    // partkey self-join: cnts {10:3, 20:1} → exact 9+1=10,
    // indep 16 div 2 = 8 (err −2000), histogram covers all → 10.
    val dir = fixtureDir(
      Seq((1L, ts(1)), (2L, ts(1)), (3L, ts(1)), (4L, ts(1))),
      Seq((1L, 10L, 1.0), (1L, 10L, 1.0), (2L, 10L, 1.0),
        (3L, 20L, 1.0)))
    val rows = Stats.q111JoinCard(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9)))
    assert(rows === Seq(
      ("lineitem_partkey_selfjoin", 4L, 4L, 2L, 2L, 10L, 8L, 10L,
        -2000L, 0L),
      ("orders_lineitem_orderkey", 4L, 4L, 4L, 3L, 4L, 4L, 4L,
        0L, 0L)))
  }

  test("q112: a recent seller outranks a bigger stale one; weights " +
      "halve per 13-week step") {
    // anchor = newest order (day 28). part 100: qty 10 at age 0 →
    // w=1024 → 10240. part 200: qty 30 at age 26 weeks (2 steps) →
    // w=256 → 7680: less DECAYED score despite 3× the volume.
    val old = Timestamp.valueOf("2023-07-29 00:00:00") // 182 days = 26w
    val dir = fixtureDir(
      Seq((1L, ts(28)), (2L, old)),
      Seq((1L, 100L, 10.0), (2L, 200L, 30.0)))
    val rows = Stats.q112DecayedPopularity(s, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows === Seq(
      (100L, 10240L, 10L, 1L),
      (200L, 7680L, 30L, 1L)))
  }

  test("q127: the MV refresh equals q112's full recompute, with a " +
      "populated delta slice") {
    // orderkey 9 lands in the delta slice (9 % 10 == 9) and SHARES
    // part 100 with a base-slice line, so the columnwise merge of
    // the two stored partials is actually exercised; order 2 is the
    // stale base-only seller
    val old = Timestamp.valueOf("2023-07-29 00:00:00")
    val dir = fixtureDir(
      Seq((1L, ts(28)), (2L, old), (9L, ts(28))),
      Seq((1L, 100L, 10.0), (2L, 200L, 30.0), (9L, 100L, 5.0)))
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = shape(Stats.q112DecayedPopularity(s, dir))
    val mv = shape(Stats.q127DecayedMv(s, dir))
    assert(mv === full, "refresh must be bit-identical to recompute")
    assert(mv.exists { case (p, _, qty, n) =>
      p == 100L && qty == 15L && n == 2L
    }, "base and delta lines of part 100 must have merged")
  }
}
