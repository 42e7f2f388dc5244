package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q167 mixing-matrix algebra on hand-computable baskets: exact
  * multiplicity counting (within-mfgr pairs are c·(c−1), cross are
  * c_g·c_h), the independence baseline, matrix symmetry, and the
  * zero-variance guard on the categorical assortativity. */
class MixingSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def dirWith(parts: Seq[(Long, String)],
      lines: Seq[(Long, Long)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixing")
    parts.toDF("p_partkey", "p_brand").write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    lines.toDF("l_orderkey", "l_partkey").write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("q167: endpoint multiplicities, shares, independence lift and " +
      "r are the exact hand algebra") {
    // order 1 carries mfgrs [M1, M1, M2]; order 2 carries [M2].
    // E = {(M1,M1): 2, (M1,M2): 2, (M2,M1): 2}; T = 6; A_M1 = 4,
    // A_M2 = 2; trace = 2; Σa² = 20 → r = (12−20)/(36−20) = −1/2.
    val dir = dirWith(
      parts = Seq((1L, "M1"), (2L, "M1"), (3L, "M2")),
      lines = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 3L)))
    val got = Quality.q167CopurchaseMixing(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(got.keySet == Set(("M1", "M1"), ("M1", "M2"), ("M2", "M1")),
      s"cells ${got.keySet}")
    assert(got(("M1", "M1")) == (2L, 333333L, 444444L, 750000L, 6L, -500000L))
    assert(got(("M1", "M2")) == (2L, 333333L, 222222L, 1500000L, 6L, -500000L))
    assert(got(("M2", "M1")) == got(("M1", "M2")), "matrix must be symmetric")
  }

  test("q167: a single-manufacturer corpus reports r = 0 (zero " +
      "variance), not a division error") {
    val dir = dirWith(
      parts = Seq((1L, "M1"), (2L, "M1")),
      lines = Seq((10L, 1L), (10L, 2L)))
    val rows = Quality.q167CopurchaseMixing(s, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "M1" && r.getString(1) == "M1")
    assert(r.getLong(2) == 2L && r.getLong(3) == 1000000L)
    assert(r.getLong(7) == 0L, s"r_ppm ${r.getLong(7)}")
  }
}
