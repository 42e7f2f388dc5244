package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed water-filling: sources a (5 tokens, cap 20) and
  * b (50 tokens, cap 200); N=55 ⇒ B = 55·3 div 2 = 82 < Σcap=220.
  * Candidates on the cap-sorted list [(20,a),(200,b)]:
  *  k0=0: c = 82 div 2 = 41, invalid (41 ≥ cap_1=20);
  *  k0=1: c = (82−20) div 1 = 62, valid (20 ≤ 62 < 200) ⇒ level 62.
  * alloc_a = 20 (saturated, 4 epochs), alloc_b = 62
  * (epochs_e6 = 62·10⁶ div 50 = 1240000), slack 0. */
class BudgetSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("budget-docs")
    rows.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  test("q88: hand-computed level, saturation, and epoch counts") {
    val dir = docsDir(Seq(
      (1L, "a", "w w w w w"),
      (2L, "b", Seq.fill(50)("x").mkString(" "))))
    val rows = Budget.q88TokenBudget(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq === Seq(
      ("a", 5L, 20L, 20L, 4000000L, 62L, 0L),
      ("b", 50L, 200L, 62L, 1240000L, 62L, 0L)))
  }

  test("q88: single-source corpus fills straight to the level") {
    val dir = docsDir(Seq((1L, "only", "w w w w")))
    // n=4, cap=16, B = 12 div 2 = 6: c = 6 div 1 = 6 valid ⇒ all 6
    val rows = Budget.q88TokenBudget(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4),
        r.getLong(6)))
    assert(rows.toSeq === Seq(("only", 6L, 1500000L, 0L)))
  }

  test("q88 on the real corpus: allocation is feasible, exhaustive " +
      "up to reported slack, and capped") {
    val rows = Budget.q88TokenBudget(s, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val n = rows.map(_._1).sum
    val b = n * Budget.BudgetNum / Budget.BudgetDen
    val captot = rows.map(_._2).sum
    val alloc = rows.map(_._3).sum
    val slack = rows.head._5
    assert(rows.forall { case (nt, cap, a, lvl, _) =>
      cap == nt * Budget.MaxEpochs && a == math.min(cap, lvl) })
    assert(alloc + slack == math.min(b, captot))
    val unsaturated = rows.count { case (_, cap, a, _, _) => a < cap }
    assert(slack >= 0 && (slack == 0 || slack < unsaturated.toLong))
  }

  test("q88 plans one scan to a bounded per-source table: no join, " +
      "no window, no cartesian") {
    val a = graft.tools.PlanAudit.of(
      Budget.q88TokenBudget(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
