package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q137 snapshot-diff classification, hand-checked on doc_ids 1..10:
  * id 5 exists only in the new snapshot (added), id 3 only in the old
  * (removed), id 7 is revised (changed), the rest untouched. */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q137 classifies added/removed/changed/unchanged and churn") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("diff-docs")
    (1 to 10).map(i => (i.toLong, s"document body number $i", "en", "t", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val r = Pipeline3.q137CorpusDiff(s, dir.toString).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "t")
    assert(row.getLong(1) == 1L, "added: id 5 (5 mod 13)")
    assert(row.getLong(2) == 1L, "removed: id 3 (3 mod 11)")
    assert(row.getLong(3) == 1L, "changed: id 7 (7 mod 7)")
    assert(row.getLong(4) == 7L, "unchanged: the other seven")
    assert(row.getLong(5) == 9L && row.getLong(6) == 9L)
    assert(row.getLong(7) == 3L * 1000000L / 9L, "churn 3/9 ppm")
  }
}

