package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-space isotropy audit — the health check an ANN/retrieval
  * pipeline runs before trusting cosine geometry (Ethayarajh 2019,
  * Mu & Viswanath 2018: contextual embedding spaces are anisotropic —
  * a few rogue dimensions carry most of the variance, and cosine
  * similarity degenerates toward the dominant direction). Per
  * dimension of the quantized embedding (the q85 ×1000 integer
  * components, so the DuckDB oracle is bit-exact): vector count, mean
  * ×10³, and the dimension's share of TOTAL corpus variance in ppm —
  * variance as the exact integer n·Σq² − (Σq)² (the q146 sufficient-
  * statistics trick, DECIMAL(38,0)/HUGEINT, no float subtraction of
  * near-equal sums).
  *
  * 100 TB posture: map-only posexplode to (dim, q) pairs, ONE
  * dim-keyed aggregate with map-side combine onto a |dims|-row
  * table, one 1-row broadcast total — the q36/q55 totals shape;
  * cost is one corpus scan regardless of scale. */
object EmbStats {

  /** q166: per-dimension isotropy profile. Columns: (dim [0-based],
    * n_vecs, mean_e3, var_share_ppm), ordered by dim. */
  def q166EmbeddingIsotropy(s: SparkSession, dir: String): DataFrame = {
    val pd = Tables.spread(Tables.load(s, dir, "embeddings"))
      .select(posexplode(Similarity.ivec(col("embedding")))
        .as(Seq("dim", "q")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("s"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("ss"))
      .withColumn("var_num", expr("n * ss - s * s"))
      .localCheckpoint(false) // the totals row + report read it
    val tot = pd.agg(sum(col("var_num")).as("tv"))
    pd.crossJoin(broadcast(tot))
      .select(col("dim").cast("long").as("dim"), col("n").as("n_vecs"),
        expr("CAST(s * 1000 div n AS BIGINT)").as("mean_e3"),
        expr("CAST(var_num * 1000000 div tv AS BIGINT)")
          .as("var_share_ppm"))
      .orderBy(col("dim"))
  }

  val q166EmbeddingIsotropyOracle: String =
    s"""WITH base AS (
       |  SELECT ${Similarity.ivecSql} AS v FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1,
       |  (SELECT max(len(v)) FROM base))) AS dim),
       |ex AS (SELECT dim, v[dim] AS q FROM base, dims),
       |pd AS (
       |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(q) AS HUGEINT) AS s,
       |    CAST(sum(q * q) AS HUGEINT) AS ss
       |  FROM ex GROUP BY dim),
       |vn AS (SELECT dim, n, s, n * ss - s * s AS var_num FROM pd),
       |tot AS (SELECT sum(var_num) AS tv FROM vn)
       |SELECT dim - 1 AS dim, n AS n_vecs,
       |  CAST(s * 1000 // n AS BIGINT) AS mean_e3,
       |  CAST(var_num * 1000000 // tv AS BIGINT) AS var_share_ppm
       |FROM vn, tot ORDER BY dim""".stripMargin
}
