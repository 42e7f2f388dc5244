package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q173 — the KMV containment estimator on hand corpora: the
  * identical-truncated-sketch regression (the |u| ≤ k branch bug),
  * exactness when both sketches are complete, and the in-query
  * chimera probes that make the calibration band non-vacuous. */
class ContainmentSketchSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("csk-fix")
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private def uniq(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("identical large docs estimate near 100%, not k/n (the " +
      "complete-branch regression: |u| <= k must not mean complete)") {
    // 100 tokens -> 98 shingles, well past k=32; identical sets merge
    // to exactly k sketch entries — the old |u| <= k branch collapsed
    // the estimate to k/n = 32
    val text = uniq("b", 100)
    val dir = docsDir(Seq((201L, text), (202L, text)))
    val row = Dedup.q173ContainmentSketch(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(6), r.getLong(7))).head
    assert(row._1 === 201L && row._2 === 202L)
    assert(row._3 === 100L, "exact arm")
    assert(row._4 >= 70L, s"estimate ${row._4} collapsed — branch bug")
  }

  test("complete sketches (both docs <= k shingles) estimate exactly") {
    // E1: 20 tokens -> 18 shingles; E2 shares its first 15 tokens ->
    // 13 common shingles; both sketches complete -> err_pp == 0
    val e1 = (0 until 20).map(i => s"e$i")
    val e2 = e1.take(15) ++ (0 until 5).map(i => s"f$i")
    val dir = docsDir(Seq((301L, e1.mkString(" ")),
      (302L, e2.mkString(" "))))
    val row = Dedup.q173ContainmentSketch(s, dir).collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(8))).head
    assert(row._1 === 13L && row._2 === 13L && row._3 === 0L)
  }

  test("chimera probes populate the calibration band on a corpus " +
      "whose natural pairs are all-100%") {
    // two 60-token disjoint-vocab family docs (ids 0 and 97) spawn 5
    // chimeras; probe-vs-source pairs land across the 50-90 deciles,
    // on both sides of the 80% decision threshold
    val dir = docsDir(Seq((0L, uniq("a", 60)), (97L, uniq("z", 60))))
    val rows = Dedup.q173ContainmentSketch(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6)))
    val probeRows = rows.filter(t => t._1 < 0 || t._2 < 0)
    assert(probeRows.nonEmpty, "no probe pairs emitted")
    val deciles = probeRows.map(_._3 / 10 * 10).distinct.sorted
    assert(deciles.length >= 3, s"band too thin: $deciles")
    assert(probeRows.exists(_._3 < 80) && probeRows.exists(_._3 >= 80),
      s"no mass on both sides of the threshold: $probeRows")
  }
}
