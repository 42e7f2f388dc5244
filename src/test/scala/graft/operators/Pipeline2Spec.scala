package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantic pins for the second pipeline block (the oracle gate checks
  * exact values; these pin the operator CONTRACTS — cap respected,
  * votes bounded, shares in range — on the smallest corpus). */
class Pipeline2Spec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("q52: repetition shares are integer percents in [0, 100]") {
    val bad = Pipeline2.q52Repetition(spark, dir)
      .filter(col("top_token_pct") < 0 || col("top_token_pct") > 100 ||
        col("top_bigram_pct") < 0 || col("top_bigram_pct") > 100 ||
        col("dup_trigram_pct") < 0 || col("dup_trigram_pct") > 100)
      .count()
    assert(bad == 0)
  }

  test("q53: no source exceeds the cap; ranks are 1..k dense per source") {
    val out = Pipeline2.q53DomainCap(spark, dir)
    val over = out.groupBy("source").count()
      .filter(col("count") > Pipeline2.DomainCap).count()
    assert(over == 0)
    val badRank = out.groupBy("source")
      .agg(min("rk").as("lo"), max("rk").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(badRank == 0)
  }

  test("q54: one row per query; votes in [1, k]; labels from the corpus domain") {
    val out = Pipeline2.q54KnnClassify(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("q_id")).distinct.length == rows.length)
    assert(rows.forall { r =>
      val v = r.getAs[Long]("n_votes")
      v >= 1 && v <= Pipeline2.KnnK
    })
    assert(rows.forall(r => (0 to 9).contains(r.getAs[Int]("pred_label"))))
  }

  test("q55: top-k size bound, support floor, strict output ordering") {
    val rows = Pipeline2.q55CooccurPmi(spark, dir).collect()
    assert(rows.length <= Pipeline2.PmiTopK && rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("cnt_ab") >= Pipeline2.PmiMinSupport))
    val scores = rows.map(r =>
      (r.getAs[Long]("pmi_scaled"), r.getAs[String]("bigram")))
    assert(scores.sameElements(
      scores.sortBy { case (s, b) => (-s, b) }))
  }

  test("q63: fused list is the top-k by RRF with both rank systems bounded") {
    import org.apache.spark.sql.functions._
    val rows = Pipeline2.q63RrfFusion(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= Pipeline2.RrfTopK)
    val scores = rows.map(r => (r.getAs[Long]("rrf"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy { case (s, d) => (-s, d) }))
    // rrf bounds: two systems, each term ≤ 1e6/(60+1), ≥ 1e6/(60+n)
    val maxTerm = 1000000L / (Pipeline2.RrfK + 1)
    assert(rows.forall { r =>
      val v = r.getAs[Long]("rrf"); v > 0 && v <= 2 * maxTerm
    })
    assert(rows.forall(r => r.getAs[Long]("kw_rank") >= 1 &&
      r.getAs[Long]("vec_rank") >= 1))
  }

  test("q61: isolated docs hold the teleport floor; every doc is ranked") {
    import org.apache.spark.sql.functions._
    // sf0.01: the smallest corpus whose near-dup graph is non-empty
    val d01 = "/root/testdata/sf0.01"
    val pr = Pipeline2.q61Pagerank(spark, d01)
    val nDocs = graft.Tables.load(spark, d01, "documents").count()
    assert(pr.count() == nDocs)
    // deg=0 ⇔ rank is exactly the teleport term (150); linked docs
    // receive flow on top of it
    assert(pr.filter(col("deg") === 0 && col("rank_x1000") =!= 150)
      .count() == 0)
    assert(pr.filter(col("rank_x1000") < 150).count() == 0)
    assert(pr.filter(col("deg") > 0).count() > 0, "graph must be non-trivial")
  }

  test("q65: fixed 3 rounds genuinely truncate where the fixpoint " +
      "converges; dangling mass is redistributed, not leaked") {
    import spark.implicits._
    // a 5-star (hub 0 ↔ 1..5) plus 10 isolated docs: the isolated
    // ranks feed the dangling pool, whose redistribution keeps raising
    // everyone for ~10 rounds (contraction ≈ 0.85 × dangling share) —
    // at round 3 the flow has NOT stabilized, so q61-style fixed
    // rounds and the fixpoint genuinely differ
    val ids = (0L until 16L).toDF("doc_id")
    val star = (1L to 5L).map(v => (0L, v)).toDF("u", "v")
    val bidir = star.union(star.select(col("v").as("u"), col("u").as("v")))
    val deg = bidir.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val edges = bidir.join(deg, "u")
    val fp = Pipeline2.pagerankFixpoint(ids, edges, 16,
      oracleRoundBound = Some(Pipeline2.PrOracleRounds))
      .orderBy("doc_id").collect()
    val r3 = Pipeline2.pagerankFixpoint(ids, edges, 16, maxRounds = 3)
      .orderBy("doc_id").collect()
    assert(!fp.sameElements(r3),
      "3 rounds must not reach the fixpoint on this graph")
    // dangling redistribution: isolated docs sit ABOVE the teleport
    // floor at fixpoint (q61's form leaks their mass and pins them
    // to exactly 150)
    val isolated = fp.filter(_.getAs[Long]("doc_id") >= 6L)
    assert(isolated.nonEmpty &&
      isolated.forall(_.getAs[Long]("r") > 150L), isolated.take(3).toSeq)
    // monotone seed ⇒ ranks only grew; hub outranks leaves
    val hub = fp.find(_.getAs[Long]("doc_id") == 0L).get.getAs[Long]("r")
    val leaf = fp.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Long]("r")
    assert(hub > leaf && leaf >= 150L)
  }

  test("q65: the star-collapsed solver is bit-identical to the generic " +
      "fixpoint solver on the real near-dup graph") {
    // round-14 optimization gate: q65PagerankFixpoint now solves the
    // per-star recurrence on the driver (one scalar iteration per
    // DISTINCT star size) instead of running ~60 cluster rounds; this
    // cross-gates it against the generic pagerankFixpoint chain it
    // replaced, on the smallest corpus whose graph is non-empty.
    val d01 = "/root/testdata/sf0.01"
    val fast = Pipeline2.q65PagerankFixpoint(spark, d01).collect()
    val (ids, edges) = Pipeline2.prGraph(spark, d01)
    val n = ids.count()
    val ranks = Pipeline2.pagerankFixpoint(ids, edges, n,
      oracleRoundBound = Some(Pipeline2.PrOracleRounds))
    val deg = edges.select(col("u"), col("d")).distinct()
    val slow = ranks.join(deg, ranks("doc_id") === deg("u"), "left")
      .select(ranks("doc_id"), col("r").as("rank_x1000"),
        coalesce(col("d"), lit(0L)).as("deg"))
      .orderBy(col("doc_id")).collect()
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (f, sl) =>
      assert(f.toSeq == sl.toSeq, s"diverged: $f vs $sl")
    }
    // and the graph must be non-trivial for the gate to mean anything
    assert(fast.exists(_.getAs[Long]("deg") > 0))
  }

  test("q57: merged base+delta partials equal the full recompute") {
    import org.apache.spark.sql.functions._
    val merged = Pipeline2.q57IncrementalAgg(spark, dir)
    val full = graft.Tables.load(spark, dir, "events")
      .groupBy((expr("ts div 86400000000000") * 86400L).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"),
        min(round(col("value") * 100).cast("long")).as("min_cents"),
        max(round(col("value") * 100).cast("long")).as("max_cents"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("q56: per-lang shares sum to ~100 and buckets stay in range") {
    val out = Pipeline2.q56LengthHist(spark, dir)
    val badBucket = out
      .filter(col("bucket") < 0 || col("bucket") > Pipeline2.HistMaxBucket)
      .count()
    assert(badBucket == 0)
    // integer div loses <1% per bucket; the sum must land in (100-n, 100]
    val sums = out.groupBy("lang")
      .agg(sum("pct_of_lang").as("p"), count(lit(1)).as("n")).collect()
    assert(sums.forall { r =>
      val p = r.getAs[Long]("p"); val n = r.getAs[Long]("n")
      p <= 100 && p > 100 - n
    })
  }
}
