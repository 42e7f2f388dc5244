package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q166's isotropy profile on hand vectors — sufficient statistics,
  * truncating means, and variance shares unroll on paper. */
class EmbStatsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(vecs: Seq[Seq[Float]]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("emb-fix")
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("a one-variant-dimension corpus puts the whole variance share " +
      "on that dimension") {
    // dim 0: q = ±1000 (mean 0, var_num = 2·2e6); dim 1: constant 0.
    val dir = fixtureDir(Seq(Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)))
    val rows = EmbStats.q166EmbeddingIsotropy(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 2L, 0L, 1000000L), (1L, 2L, 0L, 0L)),
      s"got ${rows.toSeq}")
  }

  test("means truncate like the oracle and shares split exactly on a " +
      "two-dim hand case") {
    // dim 0: q = 1500, 2000 → mean_e3 = 3500·1000 div 2 = 1750000,
    //   var_num = 2·(1500² + 2000²) − 3500² = 250000.
    // dim 1: q = 0, 1000 → mean_e3 = 500000, var_num = 2·10⁶ − 10⁶
    //   = 10⁶. tv = 1.25e6 → shares 200000 / 800000.
    val dir = fixtureDir(Seq(Seq(1.5f, 0.0f), Seq(2.0f, 1.0f)))
    val rows = EmbStats.q166EmbeddingIsotropy(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 1750000L, 200000L),
      (1L, 500000L, 800000L)), s"got ${rows.toSeq}")
  }

  test("q170: rank-1 data recovers its own direction as an exact " +
      "power-iteration fixpoint") {
    // Rows ±(1,2)·c with zero column sums → G ∝ [[20,40],[40,80]]
    // (rank 1, direction (1,2)). gs = G·10⁶ div 80·u = [[250000,
    // 500000],[500000,1000000]]; every round maps any positive
    // vector to the (500000, 1000000) fixpoint exactly (the ratios
    // are dyadic — no truncation residue). All other dims stay 0;
    // the sign pick lands on dim 1, already positive.
    val dir = fixtureDir(Seq(
      Seq(1.0f, 2.0f), Seq(-1.0f, -2.0f),
      Seq(3.0f, 6.0f), Seq(-3.0f, -6.0f)))
    val rows = EmbStats.q170PcaPower(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(0L) == 500000L, s"dim0 ${rows(0L)}")
    assert(rows(1L) == 1000000L, s"dim1 ${rows(1L)}")
    assert((2L until 64L).forall(d => rows.getOrElse(d, 0L) == 0L))
    assert(rows.size == EmbStats.PcaDims)
  }

  test("q170: the sign convention flips a negative-leading iterate " +
      "and a constant corpus reports all zeros") {
    // Rows ±(−3,1,1,1,1)·c: u·r0 > 0, so the un-flipped iterate
    // carries dim 0 NEGATIVE at the largest magnitude — the output
    // must flip it to +10⁶, dims 1–4 equal and negative, rest 0.
    val dir = fixtureDir(Seq(
      Seq(-3.0f, 1.0f, 1.0f, 1.0f, 1.0f),
      Seq(3.0f, -1.0f, -1.0f, -1.0f, -1.0f),
      Seq(-6.0f, 2.0f, 2.0f, 2.0f, 2.0f),
      Seq(6.0f, -2.0f, -2.0f, -2.0f, -2.0f)))
    val rows = EmbStats.q170PcaPower(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(0L) == 1000000L, s"dim0 ${rows(0L)} must flip positive")
    val tail = (1L to 4L).map(rows)
    assert(tail.forall(_ < 0L) && tail.distinct.size == 1,
      s"dims 1-4 must be equal and negative: $tail")
    assert((5L until 64L).forall(d => rows(d) == 0L))
    // zero variance: every vector identical → G = 0 → all-zero output
    val dir2 = fixtureDir(Seq(Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
    val z = EmbStats.q170PcaPower(s, dir2).collect()
    assert(z.forall(_.getLong(1) == 0L))
  }
}
