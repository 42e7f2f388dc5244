package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q165's key-skew profile on hand tables where every statistic and
  * both ends of the salt ladder are computable on paper. */
class SkewProfileSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(li: Seq[(Long, Long, Long)],
      orders: Seq[Long], users: Seq[Long]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skew-fix")
    li.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    orders.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey").write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    users.zipWithIndex.map { case (u, i) => (i.toLong, u, i.toLong) }
      .toDF("event_id", "user_id", "ts").write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  test("counts, ndv, hottest-key share and the salt ladder's top end") {
    // lineitem: orderkey 7×4 + 8×1 (top1 4/5), partkey all distinct,
    // suppkey constant (degenerate hot key). orders: custkey 1,1,2,3.
    val dir = fixtureDir(
      Seq((7L, 1L, 9L), (7L, 2L, 9L), (7L, 3L, 9L), (7L, 4L, 9L),
        (8L, 5L, 9L)),
      Seq(1L, 1L, 2L, 3L),
      Seq(5L, 5L, 6L)) // events.user_id: top1 2/3
    val rows = SkewProfile.q165SkewProfile(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // x = ceil(top1·200/n): 4·200/5 = 160, 200/5 = 40, 5·200/5 = 200,
    // 2·200/4 = 100 — every tiny-n fixture overflows the ladder → 64
    assert(rows(("lineitem", "l_orderkey")) ==
      (5L, 2L, 4L, 800000L, 64L))
    assert(rows(("lineitem", "l_partkey")) ==
      (5L, 5L, 1L, 200000L, 64L))
    assert(rows(("lineitem", "l_suppkey")) ==
      (5L, 1L, 5L, 1000000L, 64L))
    assert(rows(("orders", "o_custkey")) ==
      (4L, 3L, 2L, 500000L, 64L))
    // events: n 3, ndv 2, top1 2 → share 666666 ppm, x = 134 → 64
    assert(rows(("events", "user_id")) ==
      (3L, 2L, 2L, 666666L, 64L))
  }

  test("a genuinely uniform key at partition-scale n recommends a " +
      "small salt") {
    // 100 orderkeys × 2 rows: top1 = 2, n = 200 → x = ceil(400/200)
    // = 2 → salt 2; partkey unique → x = 1 → salt 1.
    val li = (1L to 100L).flatMap(k =>
      Seq((k, 2 * k, 1L), (k, 2 * k + 1, 1L)))
    // 200 uniform users → top1·P/n = 1 → the ladder floor
    val dir = fixtureDir(li, Seq(1L), (1L to 200L))
    val rows = SkewProfile.q165SkewProfile(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    assert(rows(("lineitem", "l_orderkey")) == 2L)
    assert(rows(("lineitem", "l_partkey")) == 1L)
    assert(rows(("lineitem", "l_suppkey")) == 64L) // constant: fully hot
    assert(rows(("events", "user_id")) == 1L)
  }

  test("the in-plan 1-row recommendation q44/q49 broadcast matches " +
      "the ladder on the same keys, and is replication-invariant") {
    import s.implicits._
    // 80%-hot key (the q49 plant shape): 8×1 + 2 singles, n=10 →
    // x = ceil(8·200/10) = 160 → 64
    val hot = (Seq.fill(8)(1L) ++ Seq(2L, 3L)).toDF("k")
    val got = SkewProfile.recommendedSaltOf(hot).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(64L))
    // uniform at partition scale: 200 keys ×1 → x = 1 → ladder floor
    val uni = (1L to 200L).toDF("k")
    assert(SkewProfile.recommendedSaltOf(uni)
      .collect().head.getLong(0) === 1L)
    // replication invariance: ×50 replicas recommend the same factor
    val rep = (Seq.fill(8)(1L) ++ Seq(2L, 3L))
      .flatMap(k => Seq.fill(50)(k)).toDF("k")
    assert(SkewProfile.recommendedSaltOf(rep)
      .collect().head.getLong(0) === 64L)
  }

  test("the derived join-build cap floors to exact ladder rungs and " +
      "binds only when the build outgrows the memory budget") {
    import s.implicits._
    // the integer floor dual of the ladder: exact rung comparisons
    // (a float log2 at an exact power of two can floor one rung low)
    val floors = Seq(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L,
      7L -> 4L, 15L -> 8L, 16L -> 16L, 17L -> 16L, 63L -> 32L,
      64L -> 64L, 100000L -> 64L)
    floors.foreach { case (x, want) =>
      val got = s.sql(s"SELECT ${SkewProfile.saltFloorSql(x.toString)}")
        .collect().head.getLong(0)
      assert(got === want, s"saltFloor($x)")
    }
    // a tiny build side cannot bind: the budget dwarfs n·rowBytes,
    // so the cap saturates at MaxSalt and least(ladder, cap) = ladder
    val tiny = (1L to 100L).map(i => (i, s"seg$i"))
      .toDF("c_custkey", "c_mktsegment")
    assert(SkewProfile.joinBuildSaltCapOf(s, tiny)
      .collect().head.getLong(0) === SkewProfile.MaxSalt)
    // the formula's shape: quadrupling rowBytes·rows quarters the
    // pre-floor budget ratio — verify via the exposed pieces by
    // computing the cap on an empty frame (n clamps to 1, cap = 64)
    val empty = Seq.empty[(Long, String)]
      .toDF("c_custkey", "c_mktsegment")
    assert(SkewProfile.joinBuildSaltCapOf(s, empty)
      .collect().head.getLong(0) === SkewProfile.MaxSalt)
  }
}
