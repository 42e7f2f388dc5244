package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q142/q143/q145 corpus statistics — each gated on a hand-computable
  * fixture where the closed-form answer is known exactly, plus the
  * structural properties (monotone curves, exact tie handling at the
  * Zipf budget cut) that the algebra-mirroring oracle alone cannot
  * distinguish from a shared bug. */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpusstats")
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q142: vocabulary curve counts each type at its FIRST doc " +
      "and the decile report is cumulative-exact") {
    // 10 docs; doc d introduces exactly one new type and repeats one
    // old one, so vocab(decile d) = d and tokens(d) = 2d − 1 is a
    // closed form (doc 0 has only "t0")
    val rows = (0L until 10L).map { d =>
      val text = if (d == 0) "t0" else s"t$d t${d - 1}"
      (d, text, "s")
    }
    val got = CorpusStats.q142HeapsLaw(s, docsDir(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10)
    got.foreach { case (dec, nDocs, nToks, vocab) =>
      assert(nDocs == dec, s"decile $dec boundary")
      assert(vocab == dec, s"decile $dec vocab")
      assert(nToks == 2 * dec - 1, s"decile $dec token count")
    }
  }

  test("q143: Simpson and dominance match the closed form") {
    // one source, tokens a a b: N=3, c=(2,1) → Σc(c−1)=2,
    // λ = 2/(3·2) = 1/3; dominance = 2/3
    val got = CorpusStats
      .q143SimpsonDiversity(s, docsDir(Seq((1L, "a a b", "s1"))))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "s1")
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 333333L, s"simpson ${r.getLong(3)}")
    assert(r.getLong(4) == 666666L, s"dominance ${r.getLong(4)}")
  }

  test("q143: sources are independent (no cross-source leakage)") {
    val got = CorpusStats.q143SimpsonDiversity(s,
      docsDir(Seq((1L, "a a b", "s1"), (2L, "x y z w", "s2"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("s1") == ((3L, 2L, 333333L)))
    // all-distinct source: λ = 0 exactly
    assert(got("s2") == ((4L, 4L, 0L)))
  }

  test("q145: budget cut takes the partial tie band exactly") {
    // 500 types at frequency 3 + 1000 types at frequency 1:
    // V=1000 cuts inside the f=1 band → covered = 2500 − 500·1 =
    // 2000 of 2500 (800000 ppm); budgets ≥ vocab cover everything
    val text3 = (0 until 500).map(i => s"h$i h$i h$i").mkString(" ")
    val text1 = (0 until 1000).map(i => s"t$i").mkString(" ")
    val got = CorpusStats.q145ZipfCoverage(s,
      docsDir(Seq((1L, text3, "s"), (2L, text1, "s"))))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1000L) == ((1500L, 2500L, 2000L, 800000L)), got(1000L))
    // V=4000 exceeds the 1500-type vocabulary: full coverage
    assert(got(4000L) == ((1500L, 2500L, 2500L, 1000000L)))
    assert(got(16000L)._4 == 1000000L && got(64000L)._4 == 1000000L)
    // coverage is monotone in budget
    val cov = CorpusStats.ZipfBudgets.map(got(_)._4)
    assert(cov == cov.sorted, cov.toString)
  }
}
