package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q134 prefix-filtered similarity search — COMPLETENESS is the
  * property that matters (a pruning bug produces silently missing
  * partners, which an algebra-mirroring oracle cannot catch), so this
  * spec verifies the operator against a brute-force all-pairs ground
  * truth computed in plain Scala from the same tokenization. */
class SetSimSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  // doc_ids 0 and 97 are the probes (≡ 0 mod SetSim.ProbeMod)
  private val corpus: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog today"), // J=8/9
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
    (3L, "the quick brown fox jumps over the lazy cat"), // J=7/9 < 0.8
    (4L, "completely different content entirely unrelated words"),
    (97L, "alpha beta gamma delta epsilon zeta"),
    (98L, "alpha beta gamma delta epsilon eta"), // J=5/7 < 0.8
    (99L, "alpha beta gamma delta epsilon zeta extra")) // J=6/7

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("setsim-docs")
    rows.map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private def bruteForce(rows: Seq[(Long, String)]): Set[(Long, Long)] = {
    val sets = rows.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSet
    }
    (for {
      (p, sp) <- sets if p % SetSim.ProbeMod == 0
      (c, sc) <- sets if c != p
      inter = (sp & sc).size; union = (sp | sc).size
      if inter * 1000000L >= SetSim.JaccardThresholdE6 * union
    } yield (p, c)).toSet
  }

  test("q134 finds EXACTLY the brute-force J>=0.8 partners — no " +
      "false negatives from prefix pruning, no false positives from " +
      "verification") {
    val dir = docsDir(corpus)
    val got = SetSim.q134SetSimSearch(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(corpus)
    assert(want == Set((0L, 1L), (0L, 2L), (97L, 99L)),
      s"fixture self-check: $want")
    assert(got == want, s"operator pairs $got != ground truth $want")
  }

  test("q134 reports exact intersection/union/jaccard values") {
    val dir = docsDir(corpus)
    val rows = SetSim.q134SetSimSearch(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val dup = rows((0L, 2L)) // identical docs
    assert(dup.getLong(2) == 8L && dup.getLong(3) == 8L &&
      dup.getLong(4) == 1000000L)
    val near = rows((0L, 1L)) // one extra token
    assert(near.getLong(2) == 8L && near.getLong(3) == 9L &&
      near.getLong(4) == 8L * 1000000L / 9L)
    val ab = rows((97L, 99L))
    assert(ab.getLong(2) == 6L && ab.getLong(3) == 7L &&
      ab.getLong(4) == 6L * 1000000L / 7L)
  }
}
