package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Layout-planning invariants that hold regardless of data values;
  * exact numbers are oracle-gated in CORRECTNESS. */
class LayoutSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q96: both layouts hold the same rows and matches; Z-order " +
      "touches no more files than insertion order") {
    val rows = Layout.q96ZorderLayout(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("linear", "zorder"))
    val (lnF, lnT, lnS, lnM) = rows("linear")
    val (zF, zT, zS, zM) = rows("zorder")
    assert(lnM === zM, "the predicate matches the same rows either way")
    assert(zM > 0, "predicate selects something")
    assert(lnF <= Layout.NFiles && zF <= Layout.NFiles)
    assert(zT <= lnT, s"zorder touched $zT files, linear $lnT")
    assert(zS <= lnS, s"zorder scanned $zS rows, linear $lnS")
    // the quarter-square predicate fixes the two top Morton bits:
    // its 16 cells are CONSECUTIVE z values, i.e. at most 16/cells-
    // per-file files — the whole point of the curve
    assert(zT <= 16 / (Layout.ZLevels * Layout.ZLevels / Layout.NFiles),
      s"zorder hit set not contiguous: $zT files")
    assert(zS >= zM && lnS >= lnM, "scan supersets matches")
  }

  test("q96 plans one fact scan against a broadcast bounds row: no " +
      "cartesian, no global window (constant-side BNLJ intended)") {
    val a = graft.tools.PlanAudit.of(
      Layout.q96ZorderLayout(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.globalWindow)
  }

  test("q97: shards conserve docs and bytes; shard count is bounded " +
      "by ceil(total/target)") {
    val plan = Layout.q97CompactionPlan(s, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(plan.nonEmpty)
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("n_chars").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    plan.groupBy(_._1).foreach { case (src, shards) =>
      val (nDocs, totBytes) = docs(src)
      assert(shards.map(_._4).sum === nDocs, s"$src docs conserved")
      assert(shards.map(_._5).sum === totBytes, s"$src bytes conserved")
      // next-fit on start offsets: shard ids live in [0, total div T]
      assert(shards.length <= totBytes / Layout.ShardTarget + 1,
        s"$src: ${shards.length} shards for $totBytes bytes")
      shards.foreach { case (_, _, nf, nd, bytes, fill) =>
        assert(nf >= 1 && nd >= nf, s"$src shard shape")
        assert(fill === bytes * 10000 / Layout.ShardTarget, src)
      }
    }
  }

  test("q97 plans a source-partitioned window only: no cartesian, " +
      "no BNLJ, no global window") {
    val a = graft.tools.PlanAudit.of(
      Layout.q97CompactionPlan(s, "/root/testdata/sf0.001"))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
