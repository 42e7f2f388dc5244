package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q108 split-leakage invariants: cluster-aware hashing never
  * straddles a dup pair across splits, clusters land whole, and the
  * report partitions the corpus. */
class SplitsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("splits-docs")
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q108: dup triplet moves as one cluster; zero aware leakage; " +
      "splits partition docs and clusters") {
    val dup = "one two three four five six seven eight nine ten"
    val dir = docsDir(
      Seq((1L, dup), (2L, dup), (3L, dup)) ++
        (4L to 10L).map(i =>
          (i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")))
    val rows = Splits.q108SplitLeakage(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // aware leakage is structurally zero
    assert(rows.forall(_._5 == 0L), s"got $rows")
    // 10 docs, 8 clusters ({1,2,3} + 7 singletons), each cluster in
    // EXACTLY one split (Σ n_clusters = 8 — a straddling cluster
    // would double-count)
    assert(rows.map(_._2).sum === 10L)
    assert(rows.map(_._3).sum === 8L)
    // the naive audit column is constant across rows (a corpus-level
    // number broadcast onto the 3-row report)
    assert(rows.map(_._6).distinct.size === 1)
  }

  test("q108: corpus run partitions documents into the three splits") {
    val dir = "/root/testdata/sf0.001"
    val rows = Splits.q108SplitLeakage(s, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    val nDocs = graft.Tables.load(s, dir, "documents").count()
    assert(rows.map(_._2).sum === nDocs)
    assert(rows.forall(_._3 == 0L))
  }
}
