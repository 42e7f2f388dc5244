package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed corpus: source a = "one two three four" (shingles
  * {"one two three", "two three four"}), sources b and c = "one two
  * three" (one shingle each, identical). Exact Jaccards: (a,b) and
  * (a,c) = 1/2; (b,c) = 1/1. Identical shingle sets force identical
  * source signatures, so (b,c) must report mh_agree = 8 and
  * mh_est_e6 = 1000000 — the estimator is exact at J = 1. */
class OverlapSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("overlap-docs")
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q89: exact Jaccard, complete matrix, estimator exact at J=1") {
    val dir = docsDir(Seq(
      (1L, "a", "one two three four"),
      (2L, "b", "one two three"),
      (3L, "c", "one two three")))
    val rows = Overlap.q89SourceOverlap(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    assert(rows.length === 3) // all C(3,2) pairs present
    val byPair = rows.map(r => ((r._1, r._2), r)).toMap
    val ab = byPair(("a", "b"))
    assert((ab._3, ab._4, ab._5, ab._6, ab._7) ===
      ((2L, 1L, 1L, 2L, 500000L)))
    val bc = byPair(("b", "c"))
    assert((bc._3, bc._4, bc._5, bc._6, bc._7, bc._8, bc._9) ===
      ((1L, 1L, 1L, 1L, 1000000L, 8L, 1000000L)))
    // estimator agreement is a count of 8 component comparisons
    assert(rows.forall(r => r._8 >= 0L && r._8 <= 8L))
  }

  test("q89: zero-overlap pairs appear with jaccard 0, not dropped") {
    val dir = docsDir(Seq(
      (1L, "x", "alpha beta gamma"),
      (2L, "y", "delta epsilon zeta")))
    val rows = Overlap.q89SourceOverlap(s, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "x" && r.getString(1) === "y")
    assert(r.getLong(4) === 0L && r.getLong(5) === 2L &&
      r.getLong(6) === 0L)
  }

  test("q89 on the real corpus: complete matrix, consistent counts") {
    val df = Overlap.q89SourceOverlap(s, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)))
    val sources = rows.length // C(S,2)
    val sCount = ((1 + math.sqrt(1 + 8.0 * sources)) / 2).round
    assert(sCount * (sCount - 1) / 2 === sources.toLong)
    assert(rows.forall { case (na, nb, inter, uni, j) =>
      inter <= math.min(na, nb) && uni == na + nb - inter &&
        j == inter * 1000000L / uni })
  }

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("affinity-emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("q93: hand-computed centroids — orthogonal 0, parallel 1e6") {
    // label 0: two copies of (1,0) → centroid (1000,0); label 1:
    // (0,1) → (0,1000); label 2: (2,0) → (2000,0) — parallel to 0
    val dir = embDir(Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(2f, 0f), 2)))
    val rows = Overlap.q93LabelAffinity(s, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq === Seq(
      (0, 1, 2L, 1L, 0L),
      (0, 2, 2L, 1L, 1000000L),
      (1, 2, 1L, 1L, 0L)))
  }

  test("q93 on the real corpus: complete matrix, cosine in range") {
    val df = Overlap.q93LabelAffinity(s, "/root/testdata/sf0.001")
    val rows = df.collect()
    val labels = rows.flatMap(r => Seq(r.getInt(0), r.getInt(1))).distinct
    assert(rows.length === labels.length * (labels.length - 1) / 2)
    assert(rows.forall { r =>
      val c = r.getLong(4); c >= -1000000L && c <= 1000000L })
  }

  test("q93 plans one pass to L-by-dims groups: no join at data " +
      "scale, no cartesian, no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(
      Overlap.q93LabelAffinity(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }

  test("q89 plans no cartesian, no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(
      Overlap.q89SourceOverlap(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
