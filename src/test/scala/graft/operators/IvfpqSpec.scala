package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** IVF-PQ invariants on the real sf0.001 corpus (exact values gate
  * through the DuckDB oracle): ranks contiguous, residual-ADC
  * distances non-negative and ordered, results deterministic, and
  * every reported neighbor must live in one of the query's NProbe
  * probed cells — the whole point of the inverted index. */
class IvfpqSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val out = Ivfpq.q87Ivfpq(s, sf).collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("q87: contiguous ranks, non-negative ordered distances, " +
      "no self-pairs") {
    assert(out.nonEmpty && out.length <= Pq.NQueries * Pq.TopK)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq.sorted === (1 to rows.length))
      val dists = rows.sortBy(_._2).map(_._4)
      assert(dists.forall(_ >= 0L))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
    assert(out.forall { case (qid, _, vid, _) => qid != vid })
  }

  test("q87 is deterministic across runs") {
    val again = Ivfpq.q87Ivfpq(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("q87 honors the inverted index: every neighbor is in a " +
      "probed cell") {
    import org.apache.spark.sql.functions._
    // recompute coarse assignment independently of the operator
    val b = Similarity.exactPairsBase(s, sf)
      .select(col("vec_id"), col("v"), col("sq")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val coarse = b.filter(_._1 < Ivfpq.Kc)
    def rankCells(v: Array[Long], sq: Long): Seq[Long] =
      coarse.map { case (cid, cv, csq) =>
        val dot = cv.zip(v).map { case (a, c) => a * c }.sum
        (sq - 2 * dot + csq, cid)
      }.sortBy(identity).map(_._2).toSeq
    val cellOf = b.map { case (id, v, sq) => id -> rankCells(v, sq).head }
      .toMap
    val probed = b.filter(_._1 < Pq.NQueries)
      .map { case (id, v, sq) =>
        id -> rankCells(v, sq).take(Ivfpq.NProbe).toSet
      }.toMap
    out.foreach { case (qid, _, vid, _) =>
      assert(probed(qid).contains(cellOf(vid)),
        s"neighbor $vid of query $qid is outside the probed cells")
    }
  }

  test("q87 plans the intended shape: the coarse codebook BNLJ is " +
      "allowlisted, no cartesian, no global window") {
    val a = graft.tools.PlanAudit.of(Ivfpq.q87Ivfpq(s, sf))
    assert(!a.cartesian && !a.globalWindow)
    assert(graft.tools.PlanAudit.intendedNonEqui("q87_ivfpq"))
  }
}
