package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantic invariants of the q70 k-means codebook trainer (the oracle
  * proves the exact arithmetic; these prove the clustering LAWS hold
  * on the real table) plus its physical-plan shape. */
class ClusteringSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s = SparkSpec.spark

  private lazy val out = Clustering.q70Kmeans(s, sf).cache()

  test("q76: hand-computed centroid, distances and outlier ranking") {
    import s.implicits._
    // milli-vecs (0,0),(0,0),(9,0); centroid = (floor(9/3), 0) = (3,0);
    // dists 9, 9, 36 → rank: v3 first, then the tie breaks by vec_id
    val dir = java.nio.file.Files.createTempDirectory("q76")
    Seq((1L, Array(0f, 0f), 0), (2L, Array(0f, 0f), 0),
        (3L, Array(0.009f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    val rows = Clustering.q76CentroidOutliers(s, dir.toString).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows == Seq((0, 1, 3L, 36L), (0, 2, 1L, 9L), (0, 3, 2L, 9L)))
  }

  test("q70: every centroid is a full Dims-dim vector, ids from the seed range") {
    val perCent = out.groupBy("cent_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perCent.values.forall(_ == Clustering.Dims))
    assert(perCent.keySet.subsetOf((0L until Clustering.K).toSet))
  }

  test("q70: assignment counts cover the whole corpus exactly once") {
    val n = graft.Tables.load(s, sf, "embeddings").count()
    // n_assigned is repeated per dim row; sum distinct per centroid
    val covered = out.select("cent_id", "n_assigned").distinct()
      .agg(sum("n_assigned")).head().getLong(0)
    assert(covered == n)
  }

  test("q70: trained centroids lie inside the corpus component range") {
    import s.implicits._
    val corpus = graft.Tables.load(s, sf, "embeddings")
      .select(posexplode(Similarity.ivec(col("embedding")))
        .as(Seq("i", "m")))
      .agg(min("m"), max("m")).as[(Long, Long)].head()
    val cents = out.agg(min("comp"), max("comp")).as[(Long, Long)].head()
    // a mean (floored) of members can never escape the member range
    assert(cents._1 >= corpus._1 - 1 && cents._2 <= corpus._2)
  }

  test("q70: plan is broadcast-codebook only — no cartesian, no global window") {
    import graft.tools.PlanAudit
    val a = PlanAudit.of(Clustering.q70Kmeans(s, sf))
    val bnljOk = !a.bnlj || PlanAudit.intendedNonEqui("q70_kmeans")
    assert(!a.cartesian && bnljOk && !a.globalWindow,
      s"cartesian=${a.cartesian} bnlj=${a.bnlj} globalWindow=${a.globalWindow}")
  }

  test("q92: caps dense cells, keeps sparse cells whole, ranks 1..cap") {
    val rows = Clustering.q92DiversitySample(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_._1)
    byCell.foreach { case (_, rs) =>
      val nCell = rs.head._4
      assert(rs.forall(_._4 == nCell)) // consistent cell size
      // exactly min(n_cell, cap) survivors, ranked contiguously
      assert(rs.length.toLong == math.min(nCell, Clustering.SampleCap.toLong))
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // cells are codebook ids; a dense corpus must actually get cut
    assert(byCell.keySet.subsetOf((0L until Clustering.K).toSet))
    val n = graft.Tables.load(s, sf, "embeddings").count()
    if (n > Clustering.K.toLong * Clustering.SampleCap)
      assert(rows.exists(r => r._4 > Clustering.SampleCap))
  }

  test("q92: plan reuses the intended broadcast-codebook assignment") {
    import graft.tools.PlanAudit
    val a = PlanAudit.of(Clustering.q92DiversitySample(s, sf))
    assert(PlanAudit.intendedNonEqui("q92_diversity_sample"))
    assert(!a.cartesian && !a.globalWindow,
      s"cartesian=${a.cartesian} globalWindow=${a.globalWindow}")
  }
}
