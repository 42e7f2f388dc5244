package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q165's key-skew profile on hand tables where every statistic and
  * both ends of the salt ladder are computable on paper. */
class SkewProfileSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(li: Seq[(Long, Long, Long)],
      orders: Seq[Long]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skew-fix")
    li.toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    orders.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey").write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    dir.toString
  }

  test("counts, ndv, hottest-key share and the salt ladder's top end") {
    // lineitem: orderkey 7×4 + 8×1 (top1 4/5), partkey all distinct,
    // suppkey constant (degenerate hot key). orders: custkey 1,1,2,3.
    val dir = fixtureDir(
      Seq((7L, 1L, 9L), (7L, 2L, 9L), (7L, 3L, 9L), (7L, 4L, 9L),
        (8L, 5L, 9L)),
      Seq(1L, 1L, 2L, 3L))
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
  }

  test("a genuinely uniform key at partition-scale n recommends a " +
      "small salt") {
    // 100 orderkeys × 2 rows: top1 = 2, n = 200 → x = ceil(400/200)
    // = 2 → salt 2; partkey unique → x = 1 → salt 1.
    val li = (1L to 100L).flatMap(k =>
      Seq((k, 2 * k, 1L), (k, 2 * k + 1, 1L)))
    val dir = fixtureDir(li, Seq(1L))
    val rows = SkewProfile.q165SkewProfile(s, dir).collect()
      .map(r => r.getString(1) -> r.getLong(6)).toMap
    assert(rows("l_orderkey") == 2L)
    assert(rows("l_partkey") == 1L)
    assert(rows("l_suppkey") == 64L) // constant key: fully hot
  }
}
