package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity resolution / record linkage over structured records — the
  * dedup family applied to TABLES instead of documents: blocking to
  * bound the candidate space, in-block pair expansion, and a
  * deterministic string-similarity score against ground truth
  * fields. The q89 in-list pair shape keeps the whole thing free of
  * any row-level self-join at data scale.
  */
object EntityRes {

  /** Account-balance blocking bucket width (cents). */
  val BalBucket = 100000L
  /** Match threshold on the name-trigram Jaccard (×10⁶). */
  val ErTauE6 = 750000L

  /** Distinct character 3-grams of a lowercased string column
    * (guarded: Spark's `sequence(1, 0)` would DESCEND, so strings
    * shorter than 3 chars return an empty set explicitly). */
  private def trigrams(c: Column): Column = {
    val lc = lower(c)
    when(length(lc) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(lc) - 2),
        i => lc.substr(i, lit(3)))))
  }

  /** q101: blocked entity resolution over customers — block by
    * (nation, $1000 balance bucket), expand the C(s,2) in-block
    * pairs, score each by distinct-name-trigram Jaccard, and emit
    * candidates at jacc_e6 ≥ [[ErTauE6]]: (nation, bal_bucket,
    * cust_a, cust_b, n_a, n_b, n_inter, jacc_e6).
    *
    * This is the Fellegi–Sunter blocking+comparison skeleton every
    * record-linkage system runs (the synthetic corpus has no true
    * duplicate entities, so the threshold selects near-identical
    * name strings — EntityResSpec plants real duplicate fixtures to
    * pin the semantics): blocking keys bound the quadratic term to
    * Σ C(block,2), and the per-pair comparator is exact integer
    * arithmetic both engines reproduce.
    *
    * 100 TB posture: ONE customer scan, map-side trigram kernel,
    * one shuffle on the block key, and the pair expansion happens
    * inside each block's collected struct list (the q89 shape) — no
    * self-join of the table, ever. Block sizes are bounded by
    * construction (nation × balance bucket); a production run swaps
    * the key for phonetic/sorted-neighborhood blocks and keeps the
    * identical plan. Downstream, matched pairs feed the q45
    * connected-components fixpoint to form entity clusters. */
  def q101ErBlocking(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nation"),
        expr(s"CAST(round(c_acctbal * 100) AS BIGINT) div $BalBucket")
          .as("bal_bucket"),
        col("c_custkey").as("ck"),
        trigrams(col("c_name")).as("g"))
      .withColumn("ng", size(col("g")).cast("long"))
    val blocks = base
      .groupBy(col("nation"), col("bal_bucket"))
      .agg(sort_array(collect_list(
        struct(col("ck"), col("ng"), col("g")))).as("ms"))
    blocks
      .select(col("nation"), col("bal_bucket"),
        explode(Overlap.orderedPairs(col("ms"), (a, b) => {
          val inter = size(array_intersect(
            a.getField("g"), b.getField("g"))).cast("long")
          struct(a.getField("ck").as("cust_a"),
            b.getField("ck").as("cust_b"),
            a.getField("ng").as("n_a"), b.getField("ng").as("n_b"),
            inter.as("n_inter"))
        })).as("p"))
      .select(col("nation"), col("bal_bucket"), col("p.cust_a"),
        col("p.cust_b"), col("p.n_a"), col("p.n_b"), col("p.n_inter"))
      .withColumn("jacc_e6",
        expr("n_inter * 1000000 div (n_a + n_b - n_inter)"))
      .filter(col("jacc_e6") >= ErTauE6)
      .orderBy(col("nation"), col("bal_bucket"), col("cust_a"),
        col("cust_b"))
  }

  val q101ErBlockingOracle: String =
    s"""WITH base AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(round(c_acctbal * 100) AS BIGINT) // $BalBucket
       |      AS bal_bucket,
       |    c_custkey AS ck,
       |    list_distinct(list_transform(
       |      range(1, greatest(len(c_name) - 2, 0) + 1),
       |      i -> substring(lower(c_name), i, 3))) AS g
       |  FROM customer),
       |pairs AS (
       |  SELECT a.nation, a.bal_bucket,
       |    a.ck AS cust_a, b.ck AS cust_b,
       |    CAST(len(a.g) AS BIGINT) AS n_a,
       |    CAST(len(b.g) AS BIGINT) AS n_b,
       |    CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_inter
       |  FROM base a JOIN base b
       |    ON a.nation = b.nation AND a.bal_bucket = b.bal_bucket
       |    AND a.ck < b.ck)
       |SELECT nation, bal_bucket, cust_a, cust_b, n_a, n_b, n_inter,
       |  CAST(n_inter * 1000000 // (n_a + n_b - n_inter) AS BIGINT)
       |    AS jacc_e6
       |FROM pairs
       |WHERE n_inter * 1000000 // (n_a + n_b - n_inter) >= $ErTauE6
       |ORDER BY nation, bal_bucket, cust_a, cust_b""".stripMargin
}
