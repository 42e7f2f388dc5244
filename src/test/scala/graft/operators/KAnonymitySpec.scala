package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q130 k-anonymity/l-diversity semantics on a hand-built table where
  * every group size and diversity count is known: a nation with a
  * singleton QI group (k=1 — re-identifiable) and one with a single
  * 5-row group of uniform segment (k=5 but l=1 — attribute
  * disclosure). */
class KAnonymitySpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q130: group sizes, sub-k row counts and l-diversity on a hand case") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kanon")
    // nation 0: bucket 0 holds custs 1,2 (segments A,B → k=2, l=2);
    //           bucket 1 holds cust 3 alone (k=1, l=1)
    // nation 1: bucket 0 holds custs 4..8, all segment A (k=5, l=1)
    Seq(
      (1L, "c1", 0, 100.0, "A"), (2L, "c2", 0, 200.0, "B"),
      (3L, "c3", 0, 1500.0, "A"),
      (4L, "c4", 1, 100.0, "A"), (5L, "c5", 1, 200.0, "A"),
      (6L, "c6", 1, 300.0, "A"), (7L, "c7", 1, 400.0, "A"),
      (8L, "c8", 1, 500.0, "A"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    val rows = Quality.q130KAnonymity(s, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      //         groups rows  min_k k<2  k<5  min_l
      (0L, 2L, 3L, 1L, 1L, 3L, 1L),
      (1L, 1L, 5L, 5L, 0L, 0L, 1L)))
  }
}
