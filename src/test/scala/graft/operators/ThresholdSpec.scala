package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed Otsu on a four-doc corpus with ttr scores
  * {25, 50, 100, 100} (hist: 25→1, 50→1, 100→2; W=4, S=275):
  *  - split at thr=25: x = 25·3 − 250·1 = −175, x² = 30625,
  *    den = (1·3)·(4·4) = 48 ⇒ betw_e6 = floor(30625e6/48) = 638020833
  *  - split at thr=50: x = 75·2 − 200·2 = −250, x² = 62500,
  *    den = (2·2)·16 = 64 ⇒ betw_e6 = floor(62500e6/64) = 976562500
  * argmax ⇒ thr=50 separates {25,50} from {100,100}. */
class ThresholdSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("otsu-docs")
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q86: hand-computed curve and argmax") {
    val dir = docsDir(Seq(
      (1L, "a a a a"),   // ttr 25
      (2L, "a a b b"),   // ttr 50
      (3L, "a b c d"),   // ttr 100
      (4L, "x y z w")))  // ttr 100
    val rows = Threshold.q86OtsuThreshold(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.toSeq === Seq(
      (25L, 1L, 3L, 638020833L, 0),
      (50L, 2L, 2L, 976562500L, 1)))
  }

  test("q86: degenerate single-bucket corpus yields an empty curve, " +
      "not a crash") {
    val dir = docsDir(Seq((1L, "a b"), (2L, "c d")))  // both ttr 100
    assert(Threshold.q86OtsuThreshold(s, dir).collect().isEmpty)
  }

  test("q86 on the real corpus: exactly one selected threshold, " +
      "monotone class masses") {
    val rows = Threshold.q86OtsuThreshold(s, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(rows.nonEmpty)
    assert(rows.count(_._4 == 1) === 1)
    val total = rows.head._2 + rows.head._3
    assert(rows.forall { case (_, w0, w1, _) => w0 + w1 == total })
    val w0s = rows.map(_._2)
    assert(w0s.zip(w0s.tail).forall { case (a, b) => a < b })
  }

  test("q86 plans no join, no window: one scan to a bounded " +
      "histogram, then single-row HOFs") {
    val a = graft.tools.PlanAudit.of(
      Threshold.q86OtsuThreshold(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }

  test("q100: the sketch bucket encloses the discrete order " +
      "statistic it targets; bounds are consistent") {
    val rows = Threshold
      .q100QuantileSketch(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length ===
      Threshold.QuantQs.length * rows.map(_._1).distinct.length)
    // ground truth: the per-priority sorted cents, computed directly
    val byPrio = graft.Tables
      .load(s, "/root/testdata/sf0.001", "orders")
      .select(org.apache.spark.sql.functions.col("o_orderpriority"),
        Relational.cents(org.apache.spark.sql.functions
          .col("o_totalprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    rows.foreach { case (prio, q, n, exact, b, lo, hi) =>
      val sorted = byPrio(prio)
      assert(n === sorted.length.toLong, prio)
      assert(lo === (1L << (b - 1)) && hi === (1L << b) - 1, prio)
      // the bucket's defining guarantee: the ⌈q·n/100⌉-th order
      // statistic falls inside [lo, hi]
      val rank = ((n * q + 99) / 100).toInt
      val x = sorted(rank - 1)
      assert(x >= lo && x <= hi, s"$prio q$q: x=$x not in [$lo,$hi]")
      // and the interpolated exact value sits within one bucket of it
      assert(exact >= lo / 2 && exact <= hi * 2,
        s"$prio q$q: exact=$exact vs [$lo,$hi]")
    }
  }

  test("q100 plans map-side bucket merges and a partitioned window " +
      "only: no cartesian, no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(
      Threshold.q100QuantileSketch(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
