package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q129 contamination semantics on a planted corpus: a benchmark doc
  * that verbatim-duplicates a training doc must report 100% shingle
  * coverage, and a benchmark doc sharing nothing must still emit a
  * row (coverage 0) — silence would read as "not checked", not
  * "clean". Probe membership is doc_id ≡ 0 (mod [[Dedup.ContamMod]]). */
class ContaminationSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("contam-docs")
    rows.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q129: verbatim leak reports full coverage; clean bench doc reports zero") {
    // doc 0 and 97 are benchmark (≡ 0 mod 97); 1 and 2 are train.
    // doc 0 ≡ doc 1 verbatim (5 tokens → 3 shingles, all shared);
    // doc 97 shares no 3-word shingle with any train doc.
    val dir = docsDir(Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (97L, "one two three four five"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "something else entirely here now")))
    val rows = Dedup.q129Contamination(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0L, 3L, 3L, 1L, 100L),
      (97L, 3L, 0L, 0L, 0L)))
  }
}
