package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Connected-components semantics: the fixed-round q38 and the
  * fixpoint q45 agree on the real corpus (its graph converges in one
  * round), and genuinely differ on a synthetic chain longer than
  * `CcRounds` — the case the fixpoint variant exists for. */
class PipelineSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val s = SparkSpec.spark

  test("fixpoint CC equals fixed-round CC on the test corpus") {
    val fixed = Pipeline.q38CcLabels(s, sf).collect().toSeq
    val fix = Pipeline.q45CcFixpoint(s, sf).collect().toSeq
    assert(fixed == fix)
  }

  test("fixpoint CC differs from fixed rounds on a long chain") {
    import s.implicits._
    // chain 0-1-2-...-9: min label needs 9 rounds to reach the tail
    val n = 10
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("u", "v")
    val bidir = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    val labels0 = s.range(n).select(col("id").as("doc_id"),
      col("id").as("label"))
    val fix = Pipeline.fixpointLabels(labels0, bidir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix == (0 until n).map(i => i.toLong -> 0L).toMap,
      "fixpoint must label the whole chain with its min id")
    // k synchronous rounds move a label at most k hops: vertex i still
    // holds max(0, i - k) after k rounds — ≠ fixpoint for i > k
    val k = Pipeline.CcRounds
    val kRound = (1 to k).foldLeft(labels0) { (l, _) =>
      l.union(l.join(bidir, l("doc_id") === bidir("u"))
          .select(col("v").as("doc_id"), col("label")))
        .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
    }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kRound == (0 until n).map(i => i.toLong -> math.max(0, i - k).toLong).toMap)
    assert(kRound != fix)
  }
}
