package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Contamination-safe train/val/test split assignment — the hygiene
  * step between deduplication and training: hash-partition documents
  * into splits BY NEAR-DUP CLUSTER, not by document, so two
  * near-duplicates can never land on opposite sides of the
  * train/test boundary (the test-set leakage that inflates benchmark
  * scores; Lee et al. 2022 measure exactly this effect from
  * duplicate-driven leakage).
  */
object Splits {

  /** Split boundaries on the 0–99 hash bucket: train < 80 ≤ val < 90
    * ≤ test. */
  val TrainPct = 80
  val ValPct = 90

  private def bucket(key: Column): Column =
    conv(substring(md5(concat(lit("split:"), key.cast("string"))), 1, 6),
      16, 10).cast("long") % 100

  private def splitOf(b: Column): Column =
    when(b < TrainPct, "train").when(b < ValPct, "val").otherwise("test")

  /** q108: dup-cluster-aware split assignment with a leakage audit —
    * returns one row per split: (split, n_docs, n_clusters, n_chars,
    * leaked_pairs_aware, leaked_pairs_naive).
    *
    * Pipeline: the verified MinHash-LSH near-dup pairs
    * ([[Dedup.minhashPairs]]) form an undirected graph; connected
    * components ([[EntityRes.ccContract]], the q102 log-round
    * loop) give every document a cluster representative (its
    * component's min doc_id; singletons represent themselves); the
    * split bucket hashes the REPRESENTATIVE (md5('split:'‖rep) mod
    * 100), so a whole dup cluster moves as one unit. The audit
    * re-joins the pair list against both assignments:
    * leaked_pairs_aware counts near-dup pairs straddling splits
    * under cluster hashing (structurally 0 — both ends share a rep)
    * NEXT TO leaked_pairs_naive, the leak count under the naive
    * per-document hash a pipeline uses by default — the measured
    * contamination the operator exists to remove.
    *
    * 100 TB posture: the pair job is the capped LSH pipeline (run
    * ONCE behind a barrier — CC, and the audit all reuse it); CC
    * rounds are O(log component diameter); assignment is one
    * doc-keyed broadcast/left join + a map-side md5; the report is a
    * 3-row aggregate and the audit a pair-keyed join on the capped
    * pair set. No stage exceeds the dedup pipeline it composes. */
  def q108SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val edges = Dedup.minhashPairs(s, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(true)
    val bidir = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v")))
    val labels0 = bidir.select(col("u").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
    val labels = EntityRes.ccContract(labels0, bidir)
    val assigned = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("label"), col("doc_id")).as("rep"))
      .withColumn("split", splitOf(bucket(col("rep"))))
      .withColumn("naive_split", splitOf(bucket(col("doc_id"))))
      .localCheckpoint(false)
    val perSplit = assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_clusters"),
        sum(col("n_chars")).as("n_chars"))
    val audit = edges
      .join(assigned.select(col("doc_id").as("u"),
        col("split").as("su"), col("naive_split").as("nu")), "u")
      .join(assigned.select(col("doc_id").as("v"),
        col("split").as("sv"), col("naive_split").as("nv")), "v")
      .agg(
        coalesce(sum(when(col("su") =!= col("sv"), 1L)), lit(0L))
          .as("leaked_pairs_aware"),
        coalesce(sum(when(col("nu") =!= col("nv"), 1L)), lit(0L))
          .as("leaked_pairs_naive"))
    perSplit.crossJoin(broadcast(audit)).orderBy(col("split"))
  }

  val q108SplitLeakageOracle: String = {
    def hex6(hx: String): String = Sketch.hexSql(hx, 6)
    s"""WITH RECURSIVE ${Dedup.minhashPairsSqlCtes},
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM verified
       |  WHERE n_inter * 2 >= n_union),
       |bidir AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
       |reach AS (
       |  SELECT u AS node, u AS lab FROM bidir
       |  UNION
       |  SELECT b.v AS node, r.lab AS lab
       |  FROM reach r JOIN bidir b ON b.u = r.node),
       |lab AS (SELECT node, min(lab) AS rep FROM reach GROUP BY node),
       |hx AS (
       |  SELECT d.doc_id, d.n_chars,
       |    coalesce(l.rep, d.doc_id) AS rep,
       |    substring(md5('split:'
       |      || CAST(coalesce(l.rep, d.doc_id) AS VARCHAR)), 1, 6) AS hxr,
       |    substring(md5('split:'
       |      || CAST(d.doc_id AS VARCHAR)), 1, 6) AS hxn
       |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node),
       |sp AS (
       |  SELECT doc_id, n_chars, rep,
       |    CASE WHEN (${hex6("hxr")}) % 100 < $TrainPct THEN 'train'
       |         WHEN (${hex6("hxr")}) % 100 < $ValPct THEN 'val'
       |         ELSE 'test' END AS split,
       |    CASE WHEN (${hex6("hxn")}) % 100 < $TrainPct THEN 'train'
       |         WHEN (${hex6("hxn")}) % 100 < $ValPct THEN 'val'
       |         ELSE 'test' END AS naive_split
       |  FROM hx),
       |per AS (
       |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
       |    CAST(sum(n_chars) AS BIGINT) AS n_chars
       |  FROM sp GROUP BY split),
       |audit AS (
       |  SELECT
       |    CAST(coalesce(sum(CASE WHEN a.split <> b.split
       |      THEN 1 END), 0) AS BIGINT) AS leaked_pairs_aware,
       |    CAST(coalesce(sum(CASE WHEN a.naive_split <> b.naive_split
       |      THEN 1 END), 0) AS BIGINT) AS leaked_pairs_naive
       |  FROM edges e
       |  JOIN sp a ON a.doc_id = e.u
       |  JOIN sp b ON b.doc_id = e.v)
       |SELECT split, n_docs, n_clusters, n_chars,
       |  leaked_pairs_aware, leaked_pairs_naive
       |FROM per CROSS JOIN audit ORDER BY split""".stripMargin
  }
}
