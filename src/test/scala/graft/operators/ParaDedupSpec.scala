package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q177 paragraph dedup on a hand corpus where every drop decision
  * and rebuilt text is computable on paper: exact duplicate
  * paragraphs collapse keep-first across docs, a near-dup (one-token
  * edit) paragraph is caught by the minhash stage, and doc text is
  * respliced from the kept chunks in order. */
class ParaDedupSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private val P = Dedup.ParaTokens

  /** A unique 16-token paragraph. */
  private def para(tag: String): String =
    (0 until P).map(j => s"$tag$j").mkString(" ")

  // near-dup of para("b"): one middle token changed → shingle
  // J = 10/18 ≥ ½ (tokens i−2..i+2 around the edit change 3-gram
  // windows; 14 shingles per side, 4 differ each)
  private def paraBNear: String =
    (0 until P).map(j => if (j == 8) "ZZZ" else s"b$j").mkString(" ")

  private def fixtureDir(): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("para-fix")
    val docs = Seq(
      (0L, Seq(para("a"), para("b"), para("c")).mkString(" ")),
      (1L, Seq(para("d"), para("a"), para("e")).mkString(" ")),
      (2L, Seq(para("a"), para("b"), para("c")).mkString(" ")),
      (3L, Seq(paraBNear, para("g")).mkString(" ")))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("exact dups drop keep-first across docs, a one-token-edit " +
      "near-dup drops via minhash, and text resplices in order") {
    val rows = Dedup.q177ParaDedup(s, fixtureDir()).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 0 is first everywhere: keeps all 3 paragraphs
    assert(rows(0L) === ((3L, 0L,
      Seq(para("a"), para("b"), para("c")).mkString(" "))))
    // doc 1: its copy of paragraph a drops (doc 0 holds the first
    // occurrence), d and e survive and resplice around the gap
    assert(rows(1L) === ((3L, 1L,
      Seq(para("d"), para("e")).mkString(" "))))
    // doc 2 duplicates doc 0 exactly: every paragraph drops, the doc
    // row survives with empty text (doc-level keep is q84's call)
    assert(rows(2L) === ((3L, 3L, "")))
    // doc 3: the near-dup of b drops via the LSH+Jaccard stage, g stays
    assert(rows(3L) === ((2L, 1L, para("g"))))
  }
}
