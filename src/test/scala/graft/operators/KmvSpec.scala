package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q103 KMV sketch semantics on planted corpora (exact corpus output
  * is oracle-gated; these pin the small-set exact path and the
  * estimator's calibration envelope on a known overlap). */
class KmvSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmv-docs")
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q103: sketches below k ARE their sets — estimates exact") {
    // a = {x,y,z}, b = {y,z,w}: inter 2, union 4, both < KmvK
    val dir = docsDir(Seq(
      (1L, "a", "x y z"),
      (2L, "b", "y z w")))
    val rows = q103Rows(dir)
    assert(rows === Seq(("a", "b", 3L, 3L, 2L, 4L, 4L, 2L, 0L)))
  }

  test("q103: above k the estimator lands inside its error envelope") {
    // two sources of 300 distinct tokens sharing 150: union 450,
    // inter 150 — both sides far above KmvK = 128
    val ta = (0 until 300).map(i => s"t$i").mkString(" ")
    val tb = (150 until 450).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq((1L, "a", ta), (2L, "b", tb)))
    val Seq((_, _, na, nb, ei, eu, estU, estI, err)) = q103Rows(dir)
    assert((na, nb, ei, eu) === ((300L, 300L, 150L, 450L)))
    // KMV standard error at k=128 is ~9%; 25% is a 3σ bound — a
    // violation means the estimator (not the corpus) is wrong
    assert(math.abs(err) <= 2500L, s"est_union=$estU err_e4=$err")
    assert(estI > 0L && estI < estU,
      s"est_inter=$estI outside (0, $estU)")
    // intersection estimate within a loose factor-2 envelope
    assert(estI >= 75L && estI <= 300L, s"est_inter=$estI")
  }

  private def q103Rows(dir: String) =
    Sketch.q103KmvOverlap(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
}
