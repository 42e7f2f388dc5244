package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CMS invariants that hold regardless of hash collisions: the
  * estimate NEVER undershoots (min over rows of sums that each
  * include the token's own mass), and on a corpus whose total mass
  * fits one bucket's worth of collisions the overshoot equals the
  * colliding mass. Exact values are oracle-gated in CORRECTNESS. */
class SketchSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sketch-docs")
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q91: estimates never undershoot; top-k is exact-count ranked") {
    val df = Sketch.q91CmsCalibration(s, "/root/testdata/sf0.001")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    assert(rows.length === Sketch.TopK)
    assert(rows.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact })
    // ranked by exact count desc (ties by token asc)
    val counts = rows.map(_._2).toSeq
    assert(counts === counts.sorted(Ordering[Long].reverse))
  }

  test("q91: single-token corpus estimates exactly (no collisions)") {
    val dir = docsDir(Seq((1L, "word word word")))
    val rows = Sketch.q91CmsCalibration(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.toSeq === Seq(("word", 3L, 3L, 0L)))
  }

  test("q91 plans broadcast probes over the d-by-W sketch: no " +
      "cartesian, no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(
      Sketch.q91CmsCalibration(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }

  test("q94: one row per source; self-consistent err; estimate " +
      "accurate once the vocab is inside the raw-HLL regime") {
    // sf0.001 sources hold ~31 distinct tokens each — far BELOW the
    // 5/2·m = 640 crossover, where the raw estimator is biased high
    // by design (the scaladoc's documented contract). Assert only
    // structure there…
    val rows = Sketch.q94HllCalibration(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (src, exact, est, err) =>
      assert(exact > 0 && est > 0, src)
      assert(err === (est - exact) * 10000 / exact, src)
    }
    // …and accuracy on a corpus with n >> 5/2·m, the regime a
    // corpus-scale distinct count actually runs in. m=256 has ~6.5%
    // std error; 4 sigma catches a broken register/rank outright.
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hll-docs")
    (0 until 4).map { src =>
      val text = (0 until 5000).map(i => s"s${src}w$i").mkString(" ")
      (src.toLong, text, "en", s"src$src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    Sketch.q94HllCalibration(s, dir.toString).collect()
      .foreach { r =>
        val (src, exact, est) =
          (r.getString(0), r.getLong(1), r.getLong(2))
        assert(exact === 5000L, src)
        assert(math.abs(est - exact).toDouble / exact < 0.26,
          s"$src: exact=$exact est=$est")
      }
  }

  test("q94 plans map-side register merges: no cartesian, no BNLJ, " +
      "no global window") {
    val a = graft.tools.PlanAudit.of(
      Sketch.q94HllCalibration(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }

  test("q95: the Bloom filter never false-negatives and its verdict " +
      "arithmetic is self-consistent") {
    val rows = Sketch.q95BloomPrune(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (st, n, pass, member, fp, fpr) =>
      assert(member <= pass, s"$st: member $member > bloom-pass $pass")
      assert(fp === pass - member, st)
      assert(pass <= n && member <= n, st)
      assert(fpr === fp * 1000000 / (n - member), st)
      // m=4096 bits, k=3, ~90 set bits: fpr should be far below 1%
      assert(fpr < 10000, s"$st: fpr_e6=$fpr suspiciously high")
    }
  }

  test("q95 plans broadcast bit-set probes: no cartesian, no BNLJ, " +
      "no global window") {
    val a = graft.tools.PlanAudit.of(
      Sketch.q95BloomPrune(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
