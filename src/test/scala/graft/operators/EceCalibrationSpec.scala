package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q133 reliability bins + ECE on a hand corpus with known marker
  * hits: confidences, accuracies, gaps and the doc-weighted ECE are
  * all computed on paper. */
class EceCalibrationSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q133 bins confidence, reports per-bin accuracy and exact ECE") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ece-docs")
    Seq(
      // s_en=5 (the,is,and,of,the) conf=5e6/6=833333 bin 8, correct
      (1L, "the cat is happy and proud of the dog", "en"),
      // s_de=4 (der,und,die,ist) conf=4e6/5=800000 bin 8, correct
      (2L, "der hund und die katze ist gut", "de"),
      // no markers: conf 0, bin 0, pred defaults en, labeled fr: wrong
      (3L, "bonjour monde", "fr"),
      // s_fr=3 (le,est,la) conf=3e6/4=750000 bin 7, correct
      (4L, "le chat est la", "fr"))
      .map { case (id, text, lang) => (id, text, lang, "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val rows = TextAnalysis.q133LangidCalibration(s, dir.toString)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 7L, 8L))
    val b8 = rows(8L)
    assert(b8.getLong(1) == 2L)
    assert(b8.getLong(2) == (833333L + 800000L) / 2)
    assert(b8.getLong(3) == 1000000L)
    assert(b8.getLong(4) == 1000000L - 816666L)
    val b0 = rows(0L)
    assert(b0.getLong(2) == 0L && b0.getLong(3) == 0L &&
      b0.getLong(4) == 0L)
    val b7 = rows(7L)
    assert(b7.getLong(4) == 250000L)
    // ECE = (2*183334 + 1*0 + 1*250000) / 4 docs
    assert(rows.values.forall(_.getLong(5) == 616668L / 4))
  }
}

