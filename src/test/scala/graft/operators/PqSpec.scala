package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PQ/ADC invariants on the real sf0.001 corpus (the exact-value gate
  * is the DuckDB oracle): ADC distances are sums of squared subspace
  * distances so they are non-negative; ranks are contiguous and
  * ordered; the whole op is deterministic across runs (floor-division
  * re-quantization + total tie order); and the quantized top-k
  * meaningfully overlaps the EXACT integer top-k — PQ is an
  * approximation of the metric, not of the arithmetic. */
class PqSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val out = Pq.q85PqAdc(s, sf).collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

  test("q85: full panel, contiguous ranks, non-negative distances " +
      "ordered within each query") {
    assert(out.length === Pq.NQueries * Pq.TopK)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq === (1 to Pq.TopK))
      val dists = rows.sortBy(_._2).map(_._4)
      assert(dists.forall(_ >= 0L))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
    // a result never pairs a query with itself
    assert(out.forall { case (qid, _, vid, _) => qid != vid })
  }

  test("q85 is deterministic across runs") {
    val again = Pq.q85PqAdc(s, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("q85 ADC top-k overlaps the exact integer top-k") {
    // Measured at sf0.01: recall@10 = 0.30 vs a 10/499 ≈ 2% random
    // baseline — a 15× enrichment. The absolute level is bounded by
    // the TESTDATA embeddings being near-isotropic (distance
    // concentration is PQ's worst case); clustered real-corpus
    // embeddings sit far higher, and M/K are the knobs. The bar is
    // set at half the measured value to gate structure, not noise.
    val sf01 = "/root/testdata/sf0.01"
    val adcOut = Pq.q85PqAdc(s, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val b = Similarity.exactPairsBase(s, sf01)
      .select(col("vec_id"), col("v"), col("sq"))
    val q = b.filter(col("vec_id") < Pq.NQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("sq").as("qsq"))
    val exact = b.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("dist",
        col("qsq") - lit(2L) * Similarity.idot(col("qv"), col("v"))
          + col("sq"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("dist").asc, col("vec_id").asc)))
      .filter(col("rk") <= Pq.TopK)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = adcOut.toSet
    val recall =
      adc.count(exact.contains).toDouble / (Pq.NQueries * Pq.TopK)
    assert(recall >= 0.15, s"ADC recall@${Pq.TopK} = $recall")
  }

  test("q85 plans equi-joins only: no cartesian, no nested-loop, " +
      "no global window") {
    val a = graft.tools.PlanAudit.of(Pq.q85PqAdc(s, sf))
    assert(!a.cartesian && !a.bnlj && !a.globalWindow)
  }
}
