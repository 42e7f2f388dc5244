package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q107 containment semantics: the asymmetric catch Jaccard misses,
  * inner/outer orientation, and the df posting cap. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contain-docs")
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q107: a document inside a 5x larger one is caught at " +
      "containment 100 where Jaccard sits under the dedup threshold") {
    // inner: 6 tokens → 4 shingles, all present in outer (20 tokens →
    // 18 shingles): containment 4/4 = 100%, Jaccard 4/18 ≈ 0.22 —
    // below the symmetric 0.5 dedup gate
    val innerText = "a b c d e f"
    val outerText = "a b c d e f " +
      (1 to 14).map(i => s"pad$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, innerText), (2L, outerText), (3L, "u v w x y z")))
    val rows = Dedup.q107Containment(s, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows === Seq((1L, 2L, 4L, 18L, 4L, 100L)))
    // the symmetric gate would reject it: 2·4 < 18+4−4
    assert(2 * 4 < 18)
  }

  test("q107: over-cap boilerplate counts neither as candidates nor " +
      "as overlap evidence") {
    // docs 3..60 are pure boilerplate ("footer foo bar", df 60 > cap).
    // doc 1 ⊂ doc 2 plus both carry the boilerplate shingle: the
    // gated measure sees n_inner = 4 (doc 1's sub-cap shingles),
    // n_outer = 6, n_inter = 4 → 100% — the boilerplate shingle is
    // excluded from sizes AND intersection on both engines.
    val boiler = (3L to 60L).map(i => (i, "footer foo bar"))
    val dir = docsDir(Seq(
      (1L, "a b c d footer foo bar"),
      (2L, "a b c d footer foo bar z1 z2")) ++ boiler)
    val rows = Dedup.q107Containment(s, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows === Seq((1L, 2L, 4L, 6L, 4L, 100L)))
  }

  test("q107: boilerplate shingles past the df cap generate no pairs") {
    // 60 identical 2-token docs share ONE shingle with df 60 > cap →
    // dropped; 3 identical docs → df 3 → all C(3,2) pairs at 100
    val over = (1L to 60L).map(i => (i, "p q"))
    assert(Dedup.q107Containment(s, docsDir(over)).count() === 0L)
    val under = (1L to 3L).map(i => (i, "p q"))
    val rows = Dedup.q107Containment(s, docsDir(under)).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(rows === Seq((1L, 2L, 100L), (1L, 3L, 100L), (2L, 3L, 100L)))
  }
}
