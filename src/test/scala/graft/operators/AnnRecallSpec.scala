package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q131 recall-calibration semantics. On a corpus of IDENTICAL
  * vectors every index is perfect by construction — one LSH bucket,
  * one IVF list, all ties broken by neighbor id identically in the
  * approximate and exact rankings — so any reported recall below 100
  * is a harness bug, not an index property. The corpus fixture's
  * recall VALUES are oracle-gated (q131 in CORRECTNESS); this spec
  * pins the harness itself plus the per-method pool convention
  * (IVF's ground truth starts past its centroid stand-ins). */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q131: identical-vector corpus yields recall 100 for both indexes") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("annrecall")
    val v = Array.tabulate(64)(i => ((i % 9) + 1).toFloat / 1000f)
    (0L until 25L).map(id => (id, v, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    val rows = Similarity.q131AnnRecall(s, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 10)
    rows.foreach { case (q, lshHits, ivfHits, lshPct, ivfPct) =>
      assert(lshHits == 3L && lshPct == 100L, s"query $q lsh")
      assert(ivfHits == 3L && ivfPct == 100L, s"query $q ivf")
    }
  }

  test("q131: recall_pct is exactly hits*100 div 3 on the corpus fixture") {
    val rows = Similarity.q131AnnRecall(s, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * 100 / 3)
      assert(r.getLong(4) == r.getLong(2) * 100 / 3)
      assert(r.getLong(1) <= 3 && r.getLong(2) <= 3)
    }
  }

  test("q169: the full-dimension arm is an identity (agreement by " +
      "construction) and every arm is bounded by the probe budget") {
    val rows = Similarity.q169DimTruncation(s, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Similarity.TruncDims.map(_.toLong),
      "one row per dimension budget, ascending")
    val byDims = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val full = byDims(Similarity.TruncDims.last.toLong)
    assert(full == (10L, 10L, 30L, 1000000L),
      s"dims=64 must agree with itself exactly: $full")
    byDims.values.foreach { case (nq, t1, h3, rp) =>
      assert(nq == 10L && t1 <= 10L && h3 <= 30L)
      assert(rp == h3 * 1000000L / 30L)
    }
  }
}
