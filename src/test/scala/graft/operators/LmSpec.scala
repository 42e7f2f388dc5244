package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Kneser–Ney and novelty invariants; exact values oracle-gated in
  * CORRECTNESS. The q98 hand-corpus case pins the full KN arithmetic
  * (discount, continuation weights, common-denominator integer form)
  * to values computed by hand. */
class LmSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lm-docs")
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q98: hand-computed Kneser-Ney probabilities on 'a b a b a c'") {
    // bigrams: "a b"×2, "b a"×2, "a c"×1; c1(a)=3, c1(b)=2;
    // N1+(a,·)=2, N1+(b,·)=1; N1+(·,a)=1, N1+(·,b)=1, N1+(·,c)=1; Nb=3
    // P(b|a) = 1.25/3 + (0.75·2/3)(1/3) = 21/36  → 583333333
    // P(a|b) = 1.25/2 + (0.75·1/2)(1/3) = 18/24  → 750000000
    // P(c|a) = 0.25/3 + (0.75·2/3)(1/3) =  9/36  → 250000000
    val rows = Lm.q98KnBigram(s, docsDir(Seq((1L, "a b a b a c"))))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(5), r.getLong(6))).toSeq
    assert(rows === Seq(
      ("a b", 2L, 583333333L, 666666666L),
      ("b a", 2L, 750000000L, 1000000000L),
      ("a c", 1L, 250000000L, 333333333L)))
  }

  test("q98: top-k is count-ranked; probabilities are in (0, 1e9]; " +
      "marginals are consistent") {
    val rows = Lm.q98KnBigram(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length === Lm.KnTopK)
    val counts = rows.map(_._2).toSeq
    assert(counts === counts.sorted(Ordering[Long].reverse))
    rows.foreach { case (bg, c12, c1, n1a, n1b, p) =>
      assert(c1 >= c12, bg)
      assert(n1a >= 1 && n1b >= 1, bg)
      assert(p > 0 && p <= 1000000000L, s"$bg: p_kn_e9=$p")
    }
  }

  test("q99: every gram is new exactly once; bucket 0 is all-new") {
    val rows = Lm.q99NgramNovelty(s, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length > 1, "multiple ingestion cohorts")
    rows.foreach { case (b, newg, occ, nov) =>
      assert(newg <= occ, s"bucket $b")
      assert(nov === newg * 10000 / occ, s"bucket $b")
    }
    // Σ new grams over buckets = corpus distinct grams
    import org.apache.spark.sql.functions._
    val distinctGrams = graft.Tables
      .load(s, "/root/testdata/sf0.01", "documents")
      .select(explode(graft.functions.TextStatFunctions
        .tokenNgrams(col("text"), 3)).as("g"))
      .distinct().count()
    assert(rows.map(_._2).sum === distinctGrams)
    // the first cohort has no history: everything it holds is new
    val b0 = rows.find(_._1 == 0L).get
    assert(b0._4 > rows.last._4,
      "novelty decays from the first cohort to the last")
  }

  test("q98/q99 plan shapes: no cartesian, no global window; q99 " +
      "has no BNLJ (q98's 1-row Nb broadcast is intended)") {
    val a98 = graft.tools.PlanAudit.of(
      Lm.q98KnBigram(s, "/root/testdata/sf0.001"))
    assert(!a98.cartesian && !a98.globalWindow)
    val a99 = graft.tools.PlanAudit.of(
      Lm.q99NgramNovelty(s, "/root/testdata/sf0.001"))
    assert(!a99.cartesian && !a99.bnlj && !a99.globalWindow)
  }
}
