package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q136 collocation lift on a hand corpus where every count and the
  * exact fixed-point lift are computable on paper. */
class CollocationSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q136 reports windowed pair counts and exact integer lift") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("colloc-docs")
    (1 to 5).map(i => (i.toLong, "visit new york today", "en", "t", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val rows = Keywords.q136Collocations(s, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // 4 tokens/doc, window 2 -> 5 pairs/doc, each unique in-doc:
    // every pair count 5, every unigram count 5, N = 20 tokens
    // lift = 5*20*1e6/(5*5) = 4_000_000 for all five pairs
    assert(rows.size == 5)
    val ny = rows(("new", "york"))
    assert(ny.getLong(2) == 5L && ny.getLong(3) == 5L &&
      ny.getLong(4) == 5L && ny.getLong(5) == 4000000L)
    assert(rows.keySet == Set(("new", "visit"), ("visit", "york"),
      ("new", "york"), ("new", "today"), ("today", "york")))
  }
}

