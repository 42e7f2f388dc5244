package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q158's Bradley–Terry MM iteration on a hand duel graph where the
  * strength ORDER is computable on paper: a dominance chain must come
  * out strictly ordered, and a brand that never plays never appears. */
class PreferenceSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  /** One order per duel: winner line gets the higher quantity. */
  private def fixtureDir(duels: Seq[(String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bt-fixture")
    val brands = duels.flatMap(d => Seq(d._1, d._2)).distinct.sorted
    val pk = brands.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    pk.toDF("p_partkey", "p_brand").write.mode("overwrite")
      .parquet(dir.resolve("part.parquet").toString)
    val key = pk.toMap.map(_.swap)
    duels.zipWithIndex.flatMap { case ((w, l), o) =>
      Seq((o.toLong, 1, 10.0, key(w)), (o.toLong, 2, 1.0, key(l)))
    }.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_partkey")
      .write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("a dominance chain rates strictly in chain order") {
    // A beats B 3x, B beats C 2x, C beats A once (so no brand is
    // comparison-free and the matrix is irreducible)
    val duels = Seq(("A", "B"), ("A", "B"), ("A", "B"),
      ("B", "C"), ("B", "C"), ("C", "A"))
    val rows = Preference.q158BtRating(s, fixtureDir(duels))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("A", "B", "C"))
    val (ra, rb, rc) = (rows("A")._1, rows("B")._1, rows("C")._1)
    assert(ra > rb && rb > rc, s"expected A>B>C, got $rows")
    // win/comparison bookkeeping is exact
    assert(rows("A")._2 == 3 && rows("A")._3 == 4)
    assert(rows("B")._2 == 2 && rows("B")._3 == 5)
    assert(rows("C")._2 == 1 && rows("C")._3 == 3)
    // normalization keeps total mass ~ |items|·scale (integer slack)
    val tot = ra + rb + rc
    assert(math.abs(tot - 3L * Preference.BtScale) <= 3)
  }

  test("tied-quantity and same-brand lines contribute nothing") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bt-fixture2")
    Seq((0L, "X"), (1L, "Y")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // order 0: tie between X and Y; order 1: X vs X
    Seq((0L, 1, 5.0, 0L), (0L, 2, 5.0, 1L),
        (1L, 1, 9.0, 0L), (1L, 2, 2.0, 0L))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(Preference.q158BtRating(s, dir.toString).count() == 0L)
  }
}
