package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q162's HITS iteration on a hand bipartite graph where the
  * mutual-reinforcement order is computable on paper: the supplier
  * bought by both customers must out-score the single-buyer one, and
  * the customer with the wider basket must out-score the narrow one. */
class LinkAnalysisSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(edges: Seq[(Long, Long)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hits-fix")
    edges.zipWithIndex.map { case ((c, _), i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey").write.mode("overwrite")
      .parquet(dir.resolve("orders.parquet").toString)
    edges.zipWithIndex.map { case ((_, sk), i) => (i.toLong, sk) }
      .toDF("l_orderkey", "l_suppkey").write.mode("overwrite")
      .parquet(dir.resolve("lineitem.parquet").toString)
    dir.toString
  }

  test("authority follows in-link mass, hub follows basket quality") {
    // c1 → {s10, s20}, c2 → {s10}: s10 is bought by both (higher
    // authority), c1 buys more/better (higher hub).
    val dir = fixtureDir(Seq((1L, 10L), (1L, 20L), (2L, 10L)))
    val rows = LinkAnalysis.q162HitsBipartite(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keySet == Set("customer" -> 1L, "customer" -> 2L,
      "supplier" -> 10L, "supplier" -> 20L))
    assert(rows("supplier" -> 10L) > rows("supplier" -> 20L),
      s"s10 must out-rank s20: $rows")
    assert(rows("customer" -> 1L) > rows("customer" -> 2L),
      s"c1 must out-rank c2: $rows")
    // each side renormalizes to |side|·10⁶ (truncation slack ≤ |side|)
    val sSum = rows("supplier" -> 10L) + rows("supplier" -> 20L)
    val cSum = rows("customer" -> 1L) + rows("customer" -> 2L)
    assert(math.abs(sSum - 2L * LinkAnalysis.HitsScale) <= 2)
    assert(math.abs(cSum - 2L * LinkAnalysis.HitsScale) <= 2)
  }

  test("duplicate order lines collapse: scores are set-of-edges, not " +
      "line-count, functions") {
    val once = fixtureDir(Seq((1L, 10L), (1L, 20L), (2L, 10L)))
    // same edge set, c2→s10 restated across 3 more order lines
    val dup = fixtureDir(Seq((1L, 10L), (1L, 20L), (2L, 10L),
      (2L, 10L), (2L, 10L), (2L, 10L)))
    val a = LinkAnalysis.q162HitsBipartite(s, once).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = LinkAnalysis.q162HitsBipartite(s, dup).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
