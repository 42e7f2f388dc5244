package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q128 Gopher-rule semantics on planted documents — the corpus fixture
  * is clean prose (all 500 docs pass, by design of the generator), so
  * the rules' FIRING is pinned here on hand cases: a repetition-bombed
  * doc must fail the dup-2-gram rule, a degenerate single-char-token
  * doc must fail the word-length band, and the n-gram builders must
  * not blow up on a one-token document (Spark's sequence(1, 0) is
  * descending, not empty — the regression this spec guards). */
class GopherQualitySpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gopher-docs")
    rows.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q128: repetition fails dup2, degenerate tokens fail wlen, clean prose passes") {
    val dir = docsDir(Seq(
      (1L, "spam spam spam spam spam spam"), // 6 tokens, 5 bigrams 1 distinct
      (2L, "the quick brown fox jumps over lazy dogs"), // varied
      (3L, "a b c 1 2 3"), // mean wlen 1.00 — below the 3.00 floor
      (4L, "hello"))) // single token: no n-grams exist
    val rows = TextAnalysis.q128GopherQuality(s, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

    val spam = rows(1L)
    assert(spam.getLong(2) == 80L, "dup2 = 4*100 div 5") // dup2_pct
    assert(spam.getLong(3) == 75L, "dup3 = 3*100 div 4") // dup3_pct
    assert(spam.getLong(4) == 400L) // mean_wlen_e2
    assert(spam.getInt(6) == 0, "repetition must fail")

    val clean = rows(2L)
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L)
    assert(clean.getLong(4) == 412L, "33 chars * 100 div 8 tokens")
    assert(clean.getInt(6) == 1, "clean prose must pass")

    val degen = rows(3L)
    assert(degen.getLong(4) == 100L)
    assert(degen.getLong(5) == 50L, "3 of 6 tokens numeric")
    assert(degen.getInt(6) == 0, "sub-3.00 mean word length must fail")

    val single = rows(4L)
    assert(single.getLong(1) == 1L)
    assert(single.getLong(2) == 0L && single.getLong(3) == 0L,
      "no n-grams on a one-token doc — dup fractions are 0, not an error")
    assert(single.getInt(6) == 1)
  }
}
