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
}
