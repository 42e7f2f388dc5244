package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** dedup_embedding scale-shape and recall: the banded-LSH candidate
  * stage must never materialize all pairs (no cartesian in the plan),
  * and its top-50 must overlap the exact all-pairs top-50 well enough
  * to be a useful near-dup miner even on this worst-case corpus
  * (random vectors — top pair cosine only ≈ 0.5; planted near-dups at
  * cos ≥ 0.95 would collide in a band with p ≈ 0.99). */
class SimilaritySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s = SparkSpec.spark

  test("dedup_embedding plan has no cartesian / broadcast nested loop") {
    val plan = Similarity.dedupEmbedding(s, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("dedup_embedding: banded top-50 recall vs exact all-pairs") {
    val banded = Similarity.dedupEmbedding(s, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact baseline: the pre-round-3 all-pairs formulation
    val b = Similarity.exactPairsBase(s, sf)
    val a = b.select(col("vec_id").as("vec_a"), col("v").as("va"),
      col("sq").as("sqa"))
    val c = b.select(col("vec_id").as("vec_b"), col("v").as("vb"),
      col("sq").as("sqb"))
    val exact = a.crossJoin(c).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_e6", Similarity.cosE6(
        Similarity.idot(col("va"), col("vb")), col("sqa"), col("sqb")))
      .orderBy(col("cos_e6").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(50)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.size == 50)
    val recall = (banded intersect exact).size
    // random-vector corpus: measured 28/50 at sf0.001 (cos≈0.4-0.5
    // pairs are genuinely not near-dups); bound guards regressions
    assert(recall >= 20, s"recall $recall/50 vs exact top-50")
  }
}
