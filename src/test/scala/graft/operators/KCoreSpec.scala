package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q139's peel loop on hand graphs where the 2-core is computable on
  * paper: tails peel away round by round, cycles survive, and a pure
  * tree peels to nothing. */
class KCoreSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def bidir(edges: Seq[(Long, Long)]) = {
    import s.implicits._
    (edges ++ edges.map(_.swap)).toDF("u", "v")
  }

  test("triangle with a pendant chain peels to exactly the triangle") {
    // 1-2-3 triangle, chain 3-4-5: 5 peels (deg 1), then 4, leaving
    // the triangle where every node keeps degree 2
    val core = EntityRes.kcoreEdges(
      bidir(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(core == Set((1L, 2L), (2L, 3L), (1L, 3L),
      (2L, 1L), (3L, 2L), (3L, 1L)))
  }

  test("a tree has an empty 2-core") {
    val core = EntityRes.kcoreEdges(
      bidir(Seq((1L, 2L), (1L, 3L), (3L, 4L), (3L, 5L))))
    assert(core.count() == 0L)
  }

  test("a graph needing exactly KCoreRounds productive peels converges") {
    // a path of 2·KCoreRounds+1 nodes loses both degree-1 ends each
    // pass, so it takes exactly KCoreRounds productive peels to empty
    // — plus one zero-removal confirmation pass, which must NOT count
    // against the cap (the oracle's unroll covers KCoreRounds peels;
    // charging the confirmation pass threw here while the oracle
    // silently succeeded — round-11 advisor off-by-one)
    val n = 2 * EntityRes.KCoreRounds + 1
    val path = (1 until n).map(i => (i.toLong, (i + 1).toLong))
    val core = EntityRes.kcoreEdges(bidir(path))
    assert(core.count() == 0L)
  }

  test("a graph needing KCoreRounds+1 productive peels throws (q45 discipline)") {
    val n = 2 * (EntityRes.KCoreRounds + 1) + 1
    val path = (1 until n).map(i => (i.toLong, (i + 1).toLong))
    val ex = intercept[IllegalArgumentException] {
      EntityRes.kcoreEdges(bidir(path)).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("two disjoint cycles both survive whole") {
    val core = EntityRes.kcoreEdges(
      bidir(Seq((1L, 2L), (2L, 3L), (3L, 1L),
        (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))))
    assert(core.count() == 14L) // 3 + 4 undirected edges, bidirected
  }
}
