package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Proportional sample allocation with the largest-remainder (Hare
  * quota / Hamilton) method — the governance step that turns "sample
  * [[Budget]] docs, proportional to (lang, source) strata" into an
  * integer per-stratum quota that sums to the budget EXACTLY: each
  * stratum gets ⌊B·n/N⌋, and the ⌊⌋-lost remainder seats go one each
  * to the strata with the largest B·n mod N (ties broken by stratum
  * key), the apportionment scheme whose only integer distortion is
  * ±1 per stratum. The budget is deliberately PRIME (99991): a round
  * budget divides the synthetic corpus's round doc counts and the
  * remainder path would gate vacuously.
  *
  * 100 TB posture: one corpus-scale keyed aggregate (the stratum
  * count, map-side combined) collapses to a vocabulary-scale strata
  * table; the remainder ranking is a broadcast non-equi self-join on
  * that table (category-cardinality side — the q62 constant-side
  * shape, never corpus-bounded), quota arithmetic widened to
  * DECIMAL(38,0)/HUGEINT (B·n overflows nothing up to 10³¹ docs).
  */
object Allocation {

  /** Sample budget (prime — see scaladoc). */
  val Budget = 99991L

  /** q163: largest-remainder allocation of [[Budget]] sample slots
    * across (lang, source) strata of `documents`. Columns: (lang,
    * source, n_docs, alloc), Σ alloc = [[Budget]], ordered by
    * stratum. */
  def q163StrataAlloc(s: SparkSession, dir: String): DataFrame = {
    val strata = Tables.load(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = strata.agg(sum(col("n_docs")).as("n"))
    val q = strata.crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("n_docs"),
        expr(s"""CAST(CAST(n_docs AS DECIMAL(38,0)) * $Budget div n
          AS BIGINT)""").as("base"),
        expr(s"""CAST(CAST(n_docs AS DECIMAL(38,0)) * $Budget % n
          AS BIGINT)""").as("rem"))
      .localCheckpoint(false) // rank-join sides + the leftover read it
    val leftover = q.agg((lit(Budget) - sum(col("base"))).as("leftover"))
    val ahead = q.select(col("lang").as("lang_b"),
      col("source").as("source_b"), col("rem").as("rem_b"))
    // rank = 1 + #strata strictly ahead in (rem DESC, lang, source):
    // a broadcast non-equi join against the value-scale strata table
    // (intendedNonEqui-allowlisted), not a global Window.
    q.join(broadcast(ahead),
        col("rem_b") > col("rem") ||
          (col("rem_b") === col("rem") &&
            (col("lang_b") < col("lang") ||
              (col("lang_b") === col("lang") &&
                col("source_b") < col("source")))),
        "left")
      .groupBy(col("lang"), col("source"), col("n_docs"), col("base"))
      .agg((count(col("rem_b")) + 1L).as("rk"))
      .crossJoin(broadcast(leftover))
      .select(col("lang"), col("source"), col("n_docs"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
      .orderBy(col("lang"), col("source"))
  }

  val q163StrataAllocOracle: String =
    s"""WITH strata AS MATERIALIZED (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1, 2),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM strata),
       |q AS MATERIALIZED (
       |  SELECT lang, source, n_docs,
       |    CAST(CAST(n_docs AS HUGEINT) * $Budget // t.n AS BIGINT)
       |      AS base,
       |    CAST(CAST(n_docs AS HUGEINT) * $Budget % t.n AS BIGINT)
       |      AS rem
       |  FROM strata, t),
       |l AS (SELECT CAST($Budget - sum(base) AS BIGINT) AS leftover
       |  FROM q),
       |r AS (
       |  SELECT q.*, row_number() OVER (
       |    ORDER BY rem DESC, lang, source) AS rk
       |  FROM q)
       |SELECT lang, source, n_docs,
       |  base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS alloc
       |FROM r, l ORDER BY lang, source""".stripMargin
}
