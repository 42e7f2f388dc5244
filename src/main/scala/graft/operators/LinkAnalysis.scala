package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** HITS hubs-and-authorities (Kleinberg 1999) over the directed
  * bipartite customer → supplier graph (an edge when the customer
  * ordered a line that supplier fulfilled): customers are hubs,
  * suppliers are authorities — a supplier scores high when
  * high-volume customers buy from it, a customer scores high when it
  * buys from high-authority suppliers, the mutual-reinforcement pair
  * q65's PageRank doesn't express.
  *
  * Engine-exact iteration, the q158 discipline: scores are
  * ×10⁶-scaled integers; each half-step sums the opposite side's
  * scores over the edges (DECIMAL(38,0)/HUGEINT internals — the
  * q114 widening rule: raw·(n·10⁶) overflows BIGINT at corpus
  * degree counts) and renormalizes to Σ = |side|·10⁶ with truncating
  * division; the round count is PINNED at [[HitsRounds]] and the
  * oracle unrolls the same rounds, so both engines compute the
  * identical not-yet-converged iterate (convergence is a modeling
  * question, bit-equality is the gate).
  *
  * 100 TB posture: ONE corpus-scale exchange builds the distinct
  * edge list behind a barrier; every round is then two edge-keyed
  * equi-joins + two keyed aggregates with map-side combine — cost
  * linear in |E| per round, rounds O(1). Score tables are
  * value-scale (|customers|, |suppliers|); normalization totals ride
  * as 1-row broadcasts, and each round's outputs take a lazy
  * localCheckpoint (the q158 lesson: an un-barriered loop nests the
  * round subtree once per reference). */
object LinkAnalysis {

  /** Pinned HITS rounds (unrolled identically in the oracle). */
  val HitsRounds = 2
  /** Score scale (initial hub = one unit). */
  val HitsScale = 1000000L

  /** One normalize step: raw sums → ×10⁶ integers with Σ = n·10⁶. */
  private def normalized(raw: DataFrame, key: String, out: String)
      : DataFrame = {
    val tot = raw.agg(sum(col("raw")).as("tot"), count(lit(1)).as("n"))
    raw.crossJoin(broadcast(tot))
      .select(col(key),
        expr(s"""CAST(greatest(CAST(1 AS DECIMAL(38,0)),
            CAST(raw AS DECIMAL(38,0)) * (n * $HitsScale) div tot)
          AS BIGINT)""").as(out))
      .localCheckpoint(false) // next half-step + final report read it
  }

  /** q162: HITS over customer→supplier order edges. Output one row
    * per graph node: (node_type 'customer'|'supplier', node_id,
    * score_e6) — hub score for customers, authority for suppliers —
    * ordered by (node_type, node_id). */
  def q162HitsBipartite(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    val eb = e.localCheckpoint(false) // read by every round's joins
    // Round 1's authority pass sums a UNIFORM h₀ = HitsScale over each
    // supplier's edges — that is deg(sk)·HitsScale, a plain count: the
    // join against the constant score table is algebraically dead and
    // skipped (the oracle keeps the literal h0 join as the independent
    // unrolled formulation). Round-11 ×100 isolated measurements: the
    // dead-join removal is a modest 46.0 → 43.7 s warm — the remaining
    // floor is the three score joins + the distinct, each edge-scale by
    // the algorithm's definition. A two-copy pre-partitioned edge
    // barrier (eByC/eBySk) was also tried and MEASURED WORSE — 87.9 s:
    // localCheckpoint does not preserve a reusable outputPartitioning,
    // so both copies re-exchanged anyway and the second edge-scale
    // materialization was pure cost. Broadcasting the supplier-side
    // score table would win locally but lies about 100 TB (both score
    // tables scale with the corpus); the shuffle IS the honest plan.
    val ar1 = eb.groupBy(col("sk"))
      .agg((count(lit(1)) * HitsScale).cast("decimal(38,0)").as("raw"))
    var a: DataFrame = normalized(ar1, "sk", "a")
    var h: DataFrame = null
    for (r <- 1 to HitsRounds) {
      val hr = eb.join(a, Seq("sk"))
        .groupBy(col("c"))
        .agg(sum(col("a").cast("decimal(38,0)")).as("raw"))
      h = normalized(hr, "c", "h")
      if (r < HitsRounds) {
        val ar = eb.join(h, Seq("c"))
          .groupBy(col("sk"))
          .agg(sum(col("h").cast("decimal(38,0)")).as("raw"))
        a = normalized(ar, "sk", "a")
      }
    }
    a.select(lit("supplier").as("node_type"), col("sk").as("node_id"),
        col("a").as("score_e6"))
      .unionByName(h.select(lit("customer").as("node_type"),
        col("c").as("node_id"), col("h").as("score_e6")))
      .orderBy(col("node_type"), col("node_id"))
  }

  val q162HitsBipartiteOracle: String = {
    def round(r: Int, prevH: String): String =
      s"""ar$r AS MATERIALIZED (
         |  SELECT e.s, sum(CAST(h.h AS HUGEINT)) AS raw
         |  FROM e JOIN $prevH h ON h.c = e.c GROUP BY e.s),
         |a$r AS MATERIALIZED (
         |  SELECT s, CAST(greatest(CAST(1 AS HUGEINT),
         |    raw * ((SELECT count(*) FROM ar$r) * $HitsScale)
         |      // (SELECT sum(raw) FROM ar$r)) AS BIGINT) AS a
         |  FROM ar$r),
         |hr$r AS MATERIALIZED (
         |  SELECT e.c, sum(CAST(a.a AS HUGEINT)) AS raw
         |  FROM e JOIN a$r a ON a.s = e.s GROUP BY e.c),
         |h$r AS MATERIALIZED (
         |  SELECT c, CAST(greatest(CAST(1 AS HUGEINT),
         |    raw * ((SELECT count(*) FROM hr$r) * $HitsScale)
         |      // (SELECT sum(raw) FROM hr$r)) AS BIGINT) AS h
         |  FROM hr$r)""".stripMargin
    val rounds = (1 to HitsRounds)
      .map(r => round(r, s"h${r - 1}")).mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |h0 AS MATERIALIZED (
       |  SELECT DISTINCT c, CAST($HitsScale AS BIGINT) AS h FROM e),
       |$rounds
       |SELECT 'supplier' AS node_type, s AS node_id, a AS score_e6
       |FROM a$HitsRounds
       |UNION ALL
       |SELECT 'customer', c, h FROM h$HitsRounds
       |ORDER BY node_type, node_id""".stripMargin
  }
}
