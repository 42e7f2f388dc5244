package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q141 hard-negative mining — the properties a miner must not get
  * wrong: same-label vectors NEVER appear (they would poison the
  * contrastive loss as false negatives), the returned negatives are
  * exactly the top-k most-similar label-mismatched vectors, and the
  * plan broadcasts the anchor side (no corpus-scale shuffle). */
class HardNegativesSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hardneg")
    def vec(xs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      xs.foreach { case (i, v) => a(i) = v }
      a
    }
    // anchor 0 (label 0) at e0; a same-label near-copy (must be
    // EXCLUDED however similar); diff-label vectors at known angles
    val rows = Seq(
      (0L, vec(0 -> 1f), 0), // anchor, label 0
      (100L, vec(0 -> 0.999f, 1 -> 0.001f), 0), // same label: excluded
      (101L, vec(0 -> 0.9f, 1 -> 0.1f), 1), // closest negative
      (102L, vec(0 -> 0.5f, 1 -> 0.5f), 1), // second
      (103L, vec(1 -> 1f), 2), // orthogonal
      (104L, vec(0 -> -1f), 2)) // opposite
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)
    dir.toString
  }

  test("q141: same-label vectors are never mined; ranking follows " +
      "exact cosine order") {
    val got = Similarity.q141HardNegatives(s, fixtureDir()).collect()
    val forAnchor0 = got.filter(_.getLong(0) == 0L)
      .sortBy(_.getInt(2))
      .map(r => (r.getLong(3), r.getLong(4)))
    // anchor 0 (label 0): negatives ranked 101 (cos .994) > 102
    // (.707) > 103 (0) > 104 (−1); 100 (same label) absent anywhere
    assert(forAnchor0.map(_._1).toSeq == Seq(101L, 102L, 103L, 104L),
      forAnchor0.toSeq.toString)
    assert(!got.exists(r => r.getLong(1) == r.getLong(4)),
      "a mined negative shares its anchor's label")
    // anchors are the only query ids (vec_id < HardNegAnchors)
    assert(got.map(_.getLong(0)).forall(_ < Similarity.HardNegAnchors))
  }

  test("q141 plan broadcasts the anchors — no corpus-scale shuffle " +
      "on the scoring path") {
    val plan = Similarity.q141HardNegatives(s, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
