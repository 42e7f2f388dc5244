package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CMS invariants that hold regardless of hash collisions: the
  * estimate NEVER undershoots (min over rows of sums that each
  * include the token's own mass), and on a corpus whose total mass
  * fits one bucket's worth of collisions the overshoot equals the
  * colliding mass. Exact values are oracle-gated in CORRECTNESS. */
class SketchSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sketch-docs")
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q91: estimates never undershoot; top-k is exact-count ranked") {
    val df = Sketch.q91CmsCalibration(s, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    assert(rows.length === Sketch.TopK)
    assert(rows.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact })
    // ranked by exact count desc (ties by token asc)
    val counts = rows.map(_._2).toSeq
    assert(counts === counts.sorted(Ordering[Long].reverse))
  }

  test("q91: single-token corpus estimates exactly (no collisions)") {
    val dir = docsDir(Seq((1L, "word word word")))
    val rows = Sketch.q91CmsCalibration(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq === Seq(("word", 3L, 3L, 0L)))
  }

  test("q91 plans broadcast probes over the d-by-W sketch: no " +
      "cartesian, no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(
      Sketch.q91CmsCalibration(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
