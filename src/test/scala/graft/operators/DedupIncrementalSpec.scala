package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Planted-duplicate semantics for q71 incremental dedup: batch docs
  * (doc_id % 8 == 7) are checked against the index and earlier batch
  * docs only — verdicts, min-id election, and the no-index-self-pair
  * structure. */
class DedupIncrementalSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q71-docs")
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private val A = "the quick brown fox jumps over the lazy dog again"
  private val B = "completely different content about spark physical plans"
  private val C = "incremental ingestion pipelines check new batches only"

  test("q71: verdicts — index dup, genuinely new, intra-batch dup, min-id election") {
    // index: 0=A, 8=B; batch (id%8==7): 7=A (dup of index 0),
    // 15=C (new), 23=C (intra-batch dup of 15), 31=A (dup of BOTH
    // index 0 and batch 7 — dup_of must elect min id 0)
    val dir = docsDir(Seq(0L -> A, 8L -> B, 7L -> A, 15L -> C,
      23L -> C, 31L -> A))
    val out = Dedup.q71IncrementalDedup(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((7L, 0L, 1L), (15L, -1L, 0L), (23L, 15L, 1L),
      (31L, 0L, 2L)))
  }

  test("q71: output covers exactly the batch — index docs get no verdict") {
    val dir = docsDir(Seq(0L -> A, 1L -> A, 8L -> B, 7L -> C))
    // index ids 0 and 1 are exact duplicates of each other; the batch
    // doc shares nothing — index×index pairs must not surface anywhere
    val out = Dedup.q71IncrementalDedup(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((7L, -1L, 0L)))
  }

  test("q71: plan shape — no cartesian, no global window") {
    import graft.tools.PlanAudit
    val a = PlanAudit.of(Dedup.q71IncrementalDedup(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow,
      s"cartesian=${a.cartesian} bnlj=${a.bnlj} globalWindow=${a.globalWindow}")
  }
}
