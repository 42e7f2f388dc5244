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

  test("q164: star-graph TextRank unrolls on paper — the hub " +
      "out-ranks its leaves, digits exact") {
    // docs "a b" / "a c" / "a d": edges a–b, a–c, a–d (w = 1),
    // strengths a = 3, leaves = 1. Three rounds of
    // r' = 150000 + 850·(Σ w·r div S) div 1000 from r0 = 10⁶:
    //   hub  10⁶ → 2700000 → 1254999 → 2483250
    //   leaf 10⁶ →  433333 →  915000 →  505583
    val dir = docsDir(Seq((1L, "a b"), (2L, "a c"), (3L, "a d")))
    val rows = Keywords.q164Textrank(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows === Seq(("a", 2483250L, 3L), ("b", 505583L, 1L),
      ("c", 505583L, 1L), ("d", 505583L, 1L)), s"got $rows")
  }

  test("q164: self-loops are dropped — a doc of one repeated token " +
      "contributes no edge") {
    val dir = docsDir(Seq((1L, "x x x"), (2L, "p q")))
    val rows = Keywords.q164Textrank(s, dir).collect().toSeq
      .map(_.getString(0))
    assert(rows.toSet === Set("p", "q")) // x never enters the graph
  }
}
