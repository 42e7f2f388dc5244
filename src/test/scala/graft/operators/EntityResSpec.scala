package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Entity-resolution semantics on planted fixtures (the synthetic
  * corpus has no true duplicate entities, so the real behavior —
  * duplicates matched, distinct entities not, blocking respected —
  * is pinned here; exact corpus output is oracle-gated). */
class EntityResSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def customersDir(
      rows: Seq[(Long, String, Int, Double)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("er-cust")
    rows.map { case (ck, name, nation, bal) =>
      (ck, name, nation, bal, "BUILDING") }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    dir.toString
  }

  test("q101: planted duplicates match; distinct entities and " +
      "cross-block twins do not") {
    val dir = customersDir(Seq(
      (1L, "ACME Corporation", 7, 100.0),
      (2L, "ACME Corporation Inc", 7, 250.0),   // same block, near-dup
      (3L, "Globex Industries", 7, 400.0),      // same block, distinct
      (4L, "ACME Corporation", 7, 5100.0),      // other bal bucket
      (5L, "ACME Corporation", 9, 120.0)))      // other nation
    val rows = EntityRes.q101ErBlocking(s, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(7)))
    assert(rows.map(t => (t._1, t._2)).toSeq === Seq((1L, 2L)),
      s"got $rows")
    assert(rows.head._3 >= EntityRes.ErTauE6)
  }

  test("q101: jaccard arithmetic is exact on a hand case") {
    // "abcde" grams {abc,bcd,cde}; "abcdx" grams {abc,bcd,cdx}:
    // inter=2, union=4 → 500000 < τ → excluded; identical strings
    // → 1000000 → included
    val dir = customersDir(Seq(
      (1L, "abcde", 1, 0.0), (2L, "abcdx", 1, 0.0),
      (3L, "abcde", 1, 9.0)))
    val rows = EntityRes.q101ErBlocking(s, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.toSeq === Seq((1L, 3L, 3L, 3L, 3L, 1000000L)))
  }

  test("q101 plans block-local pair expansion only: no cartesian, " +
      "no BNLJ, no global window, no self-join of the table") {
    val a = graft.tools.PlanAudit.of(
      EntityRes.q101ErBlocking(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
