package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Differential-privacy release operators — the noisy-publication
  * companion to q130's k-anonymity audit: where q130 measures how
  * re-identifiable a table is BEFORE release, q156 produces the
  * noised aggregate a DP deployment actually publishes.
  *
  * Engine-portability design (the q144 discipline): the "randomness"
  * is an md5-derived 48-bit uniform mapped through precomputed
  * integer CDF thresholds, so every noise draw is bit-identical in
  * Spark and the DuckDB oracle and the gate certifies VALUES, not
  * just shape.
  */
object Privacy {

  /** Noise truncation bound: draws are clamped to ±[[GeomNoiseMax]].
    * Untruncated CDF thresholds are used below the clamp, so within
    * ±16 the draw is exactly geometric; the two tails (probability
    * 2·(1/3)·2⁻¹⁶ ≈ 1e-5 each) collapse onto ±16 IDENTICALLY in both
    * engines. Bounded noise is what real releases ship (unbounded
    * draws break downstream range checks); the formal cost is a
    * (documented) δ-style truncation of pure ε-DP. */
  val GeomNoiseMax = 16

  /** Two-sided-geometric (discrete Laplace) CDF, α = 1/2 (ε = ln 2),
    * scaled to 2⁴⁸ and floored — P(X ≤ k)·2⁴⁸ for k = −16..15:
    * CDF(k) = 2^(1−|k|)/3 for k ≤ −1, 2/3 at 0, 1 − 2^(−k)/3 for
    * k ≥ 1 (P(X = j) ∝ α^|j|; Ghosh–Roughgarden–Sundararajan 2009's
    * universally-optimal mechanism for counting queries). Pure
    * BigInt arithmetic — both engines compare against identical
    * literals. */
  val GeomCdfE48: Seq[(Int, BigInt)] = {
    val scale = BigInt(2).pow(48)
    (-GeomNoiseMax until GeomNoiseMax).map { k =>
      val cdf =
        if (k < 0) BigInt(2).pow(49 + k) / 3
        else if (k == 0) BigInt(2).pow(49) / 3
        else (BigInt(3) * BigInt(2).pow(k) - 1) * scale / (BigInt(3) * BigInt(2).pow(k))
      k -> cdf
    }
  }

  /** CASE chain mapping a 48-bit uniform to its geometric draw —
    * plain integer literals, valid in BOTH SQL dialects (the q144
    * Poisson-CDF pattern). */
  private def geomNoiseSql(u: String): String =
    GeomCdfE48.map { case (k, t) => s"WHEN $u < $t THEN ($k)" }
      .mkString("CASE ", " ", s" ELSE $GeomNoiseMax END")

  /** q156: DP noisy-count release of customers per (nation, market
    * segment) — the geometric mechanism (discrete Laplace) with
    * α = 1/2 (ε = ln 2, sensitivity 1: each customer lands in
    * exactly one group). Per group: the true count, the
    * deterministic noise draw (md5("dp:" ⊕ group key) → 48-bit
    * uniform → inverse-CDF through [[GeomCdfE48]]), and the released
    * count clamped at 0 (negative published counts are
    * post-processed away, which DP permits). An audit row set — the
    * release itself would drop `true_n`/`noise`; keeping them is
    * what lets the oracle gate the arithmetic end to end.
    *
    * 100 TB posture: ONE exchange keyed by the (value-type-scale)
    * group tuple; the noise draw is a map-only codegen CASE over
    * integer literals on the grouped rows. No corpus-scale state, no
    * driver collect — the mechanism's cost is the aggregate you were
    * already paying. */
  def q156DpRelease(s: SparkSession, dir: String): DataFrame = {
    val grouped = Tables.spread(Tables.load(s, dir, "customer"))
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .groupBy(col("nation"), col("segment"))
      .agg(count(lit(1)).as("true_n"))
    grouped
      .withColumn("u", expr(
        "CAST(conv(substring(md5(concat('dp:', CAST(nation AS STRING)," +
          " ':', segment)), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("noise", expr(geomNoiseSql("u")).cast("long"))
      .select(col("nation"), col("segment"), col("true_n"),
        col("noise"),
        greatest(lit(0L), col("true_n") + col("noise")).as("released_n"))
      .orderBy(col("nation"), col("segment"))
  }

  val q156DpReleaseOracle: String = {
    val uSql = s"(${Sketch.hexSql("hx", 12)})"
    s"""WITH grouped AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS segment,
       |    CAST(count(*) AS BIGINT) AS true_n
       |  FROM customer GROUP BY 1, 2),
       |hashed AS (
       |  SELECT nation, segment, true_n,
       |    substring(md5('dp:' || CAST(nation AS VARCHAR) || ':' ||
       |      segment), 1, 12) AS hx
       |  FROM grouped),
       |drawn AS (
       |  SELECT nation, segment, true_n,
       |    CAST(${geomNoiseSql(uSql)} AS BIGINT) AS noise
       |  FROM hashed)
       |SELECT nation, segment, true_n, noise,
       |  greatest(CAST(0 AS BIGINT), true_n + noise) AS released_n
       |FROM drawn ORDER BY nation, segment""".stripMargin
  }
}
