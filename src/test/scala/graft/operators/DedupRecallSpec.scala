package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q153 MinHash-LSH recall calibration: the truth side must count
  * exactly the probe pairs at shingle-Jaccard ≥ 50% (cross-checked
  * against a plain-Scala brute force over the same shingling), and
  * identical documents — whose signatures band identically — must be
  * found with certainty, giving a pinned full-recall fixture. */
class DedupRecallSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  // doc_ids 0 and 97 are probes (≡ 0 mod SetSim.ProbeMod)
  private val corpus: Seq[(Long, String)] = Seq(
    (0L, "a b c d e f"), // shingles {abc,bcd,cde,def}
    (1L, "a b c d e f"), // exact dup of the probe → J = 1
    (2L, "a b c d x y"), // shares {abc,bcd}: J = 2/6 < 0.5 → excluded
    (3L, "q r s t u v"), // unrelated
    (97L, "m n o p q r"),
    (98L, "m n o p q r")) // exact dup of the second probe

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup-recall")
    rows.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private def shingleSet(t: String): Set[String] = {
    val toks = t.toLowerCase.trim.split("\\s+").toSeq
    if (toks.size < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  private def bruteTruth(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    val sets = rows.map { case (id, t) => id -> shingleSet(t) }
    (for {
      (p, sp) <- sets if p % SetSim.ProbeMod == 0
      (c, sc) <- sets if c != p
      inter = (sp & sc).size
      union = (sp | sc).size
      if union > 0 && inter * 2 >= union
    } yield (math.min(p, c), math.max(p, c))).toSet
  }

  test("q153: identical probe duplicates are found at full recall; " +
      "the sub-50% overlap pair stays out of the truth set") {
    val truth = bruteTruth(corpus)
    assert(truth === Set((0L, 1L), (97L, 98L))) // fixture sanity
    val r = Dedup.q153DedupRecall(s, docsDir(corpus)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 2L, 0L, 1000000L)))
  }

  test("q154: exact duplicates land in decile 10 with certainty — " +
      "measured and theoretical recall both 1e6") {
    // both fixture dups are J = 1 pairs: one bin-10 row, 2/2 found,
    // and the bin-midpoint constant for exact dups is certainty
    val rows = Dedup.q154MinhashScurve(s, docsDir(corpus)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq((10L, 2L, 2L, 1000000L, 1000000L)))
  }

  test("q153: a corpus whose probes have no near-dups reports " +
      "vacuous full recall, not a division by zero") {
    val lonely = Seq(
      (0L, "a b c d e f"), (1L, "q r s t u v"),
      (2L, "m n o p w z"), (3L, "m n o p w z")) // dup pair, no probe
    assert(bruteTruth(lonely).isEmpty)
    val r = Dedup.q153DedupRecall(s, docsDir(lonely)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((0L, 0L, 0L, 1000000L)))
  }
}
