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
}
