package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q105 RAKE semantics on hand-computed fixtures. */
class KeywordsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rake-docs")
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q105: degree/frequency arithmetic on a hand case") {
    // tokens: the quick fox and the quick fox → islands [quick fox]×2
    // freq(quick)=2 deg(quick)=4 → 2000; fox likewise; phrase = 4000
    val dir = docsDir(Seq((1L, "the quick fox and the quick fox")))
    val rows = Keywords.q105RakeKeywords(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows === Seq(("quick fox", 2L, 2L, 4000L)))
  }

  test("q105: single-word phrases score deg/freq = 1000 at any count") {
    val dir = docsDir(Seq((1L, "hello the hello"), (2L, "hello")))
    val rows = Keywords.q105RakeKeywords(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows === Seq(("hello", 1L, 3L, 1000L)))
  }

  test("q105: runs longer than RakeMaxLen are discarded, shorter " +
      "ones kept") {
    val dir = docsDir(Seq(
      (1L, "w1 w2 w3 w4 w5"),      // 5-token run → dropped
      (2L, "the alpha beta")))      // 2-token run → kept
    val rows = Keywords.q105RakeKeywords(s, dir).collect().toSeq
      .map(_.getString(0))
    assert(rows === Seq("alpha beta"))
  }
}
