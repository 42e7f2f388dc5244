package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q163's largest-remainder allocation on a hand strata table where
  * the quota arithmetic unrolls on paper (N = 7 against the prime
  * budget, so every floor/remainder is visible). */
class AllocationSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(docs: Seq[(String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("alloc-fix")
    docs.zipWithIndex.map { case ((l, src), i) => (i.toLong, l, src) }
      .toDF("doc_id", "lang", "source").write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("floors + the largest remainder absorb the whole budget " +
      "exactly") {
    // counts: en/a = 3, en/b = 3, de/c = 1; N = 7, B = 99991.
    // base: 3·99991 div 7 = 42853 rem 2 (twice); 99991 div 7 = 14284
    // rem 3. Σbase = 99990 → one leftover seat, and de/c has the
    // largest remainder.
    val dir = fixtureDir(
      Seq.fill(3)("en" -> "a") ++ Seq.fill(3)("en" -> "b") ++
        Seq("de" -> "c"))
    val rows = Allocation.q163StrataAlloc(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(rows == Map(
      ("de", "c") -> (1L, 14285L),
      ("en", "a") -> (3L, 42853L),
      ("en", "b") -> (3L, 42853L)), s"got $rows")
    assert(rows.values.map(_._2).sum == Allocation.Budget)
  }

  test("remainder ties break by stratum key, and the total still " +
      "lands on the budget") {
    // four equal strata: N = 4, base = 24997 rem 3 each, leftover =
    // 99991 − 99988 = 3 → the three KEY-SMALLEST strata get the seat.
    val dir = fixtureDir(Seq("de" -> "x", "en" -> "x", "es" -> "x",
      "fr" -> "x"))
    val rows = Allocation.q163StrataAlloc(s, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows == Map("de" -> 24998L, "en" -> 24998L,
      "es" -> 24998L, "fr" -> 24997L), s"got $rows")
    assert(rows.values.sum == Allocation.Budget)
  }
}
