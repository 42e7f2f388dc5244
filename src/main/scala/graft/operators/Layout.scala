package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Physical-layout planning operators — the write-side half of scan
  * performance at 100 TB. Query engines only prune what the LAYOUT
  * lets them prune: q96 measures how multi-dimensional (Z-order)
  * clustering changes the file-level hit set of a 2-D range
  * predicate, and q97 plans small-file compaction into target-size
  * shards. Both are pure integer arithmetic so the DuckDB oracle
  * reproduces them bit for bit.
  */
object Layout {

  /** Quantization levels per dimension (4 bits each → 8-bit Z value)
    * and file count per layout arm. */
  val ZBits = 4
  val ZLevels: Int = 1 << ZBits       // 16 × 16 grid
  val NFiles = 64

  /** Morton interleave of two [[ZBits]]-bit values as engine SQL
    * (`shiftleft`/`shiftright`, Spark) or operator SQL (`>> << &`,
    * DuckDB). */
  private def zSpark(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i + 1}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i})").mkString(" + ")
  private def zDuck(x: String, y: String): String =
    (0 until ZBits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i + 1}) + ((($y >> $i) & 1) << ${2 * i})")
      .mkString(" + ")

  /** q96: Z-order vs insertion-order layout, measured — quantize
    * orders onto a 16×16 (customer, order-day) grid, lay the table
    * out twice into [[NFiles]] fixed-range files (once by Morton
    * code, once by insertion key), and report what a 2-D range
    * predicate (the middle quarter of both dimensions) would touch
    * under each: (layout, n_files, files_touched, rows_scanned,
    * rows_matched).
    *
    * This is the evidence behind `OPTIMIZE ... ZORDER BY` in every
    * lakehouse engine: a single-dimension sort answers range queries
    * on THAT dimension only, while the Morton curve bounds the file
    * hit set for conjunctive ranges on both. rows_scanned /
    * rows_matched is the read amplification a 100 TB scan pays —
    * with file-level min/max statistics (parquet row-group pruning),
    * files_touched is the number of files the scan opens at all.
    *
    * Shape: ONE orders scan; the grid bounds come from a 1-row
    * aggregate broadcast to the fact side (the q36 constant-side
    * BNLJ, allow-listed); each order then emits its (layout, file)
    * pair via a 2-element explode, and the rest is two map-side
    * collapsing aggregates (file stats → layout summary). No
    * data-scale shuffle: the explode feeds a groupBy on ≤ 2·NFiles
    * groups, combined map-side. Fully deterministic: quantization is
    * integer `div` against the broadcast maxima. */
  def q96ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val lo = ZLevels / 4       // predicate: middle quarter of each dim
    val hi = ZLevels / 2 - 1
    val cellsPerFile = ZLevels * ZLevels / NFiles
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("od"))
    // every grid/layout bound in ONE 1-row broadcast aggregate
    val bounds = o.agg(
      max(col("o_custkey")).as("ck_max"),
      min(col("od")).as("d0"), max(col("od")).as("d1"),
      max(col("o_orderkey")).as("ok_max"))
    val base = o.crossJoin(broadcast(bounds))
      .withColumn("dd", datediff(col("od"), col("d0")).cast("long"))
      .withColumn("dspan", datediff(col("d1"), col("d0")).cast("long"))
      .withColumn("xq", expr(s"(o_custkey * $ZLevels) div (ck_max + 1)"))
      .withColumn("yq", expr(s"(dd * $ZLevels) div (dspan + 1)"))
      .withColumn("z", expr(zSpark("xq", "yq")))
      .withColumn("zfile", expr(s"z div $cellsPerFile"))
      .withColumn("lfile",
        expr(s"o_orderkey div ((ok_max div $NFiles) + 1)"))
      .withColumn("hit",
        (col("xq").between(lo, hi) && col("yq").between(lo, hi))
          .cast("long"))
    val perFile = base
      .select(explode(array(
        struct(lit("zorder").as("layout"), col("zfile").as("f")),
        struct(lit("linear").as("layout"), col("lfile").as("f"))))
        .as("lf"), col("hit"))
      .groupBy(col("lf.layout").as("layout"), col("lf.f").as("f"))
      .agg(count(lit(1)).as("n_rows"), sum(col("hit")).as("n_hit"))
    perFile.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("n_hit") > 0, 1L).otherwise(0L)).as("files_touched"),
        sum(when(col("n_hit") > 0, col("n_rows")).otherwise(0L))
          .as("rows_scanned"),
        sum(col("n_hit")).as("rows_matched"))
      .orderBy(col("layout"))
  }

  val q96ZorderLayoutOracle: String = {
    val lo = ZLevels / 4
    val hi = ZLevels / 2 - 1
    val cellsPerFile = ZLevels * ZLevels / NFiles
    val hitCase = s"CASE WHEN xq BETWEEN $lo AND $hi " +
      s"AND yq BETWEEN $lo AND $hi THEN 1 ELSE 0 END"
    s"""WITH o AS (
       |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od
       |  FROM orders),
       |b AS (
       |  SELECT max(o_custkey) AS ck_max, min(od) AS d0,
       |    max(od) AS d1, max(o_orderkey) AS ok_max FROM o),
       |q AS (
       |  SELECT o_orderkey,
       |    (o_custkey * $ZLevels) // (ck_max + 1) AS xq,
       |    (date_diff('day', d0, od) * $ZLevels)
       |      // (date_diff('day', d0, d1) + 1) AS yq,
       |    ok_max
       |  FROM o CROSS JOIN b),
       |zz AS (
       |  SELECT o_orderkey, xq, yq, ${zDuck("xq", "yq")} AS z, ok_max
       |  FROM q),
       |lf AS (
       |  SELECT 'zorder' AS layout, z // $cellsPerFile AS f,
       |    $hitCase AS hit FROM zz
       |  UNION ALL
       |  SELECT 'linear', o_orderkey // ((ok_max // $NFiles) + 1),
       |    $hitCase FROM zz),
       |pf AS (
       |  SELECT layout, f, count(*) AS n_rows, sum(hit) AS n_hit
       |  FROM lf GROUP BY layout, f)
       |SELECT layout, count(*) AS n_files,
       |  CAST(sum(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS files_touched,
       |  CAST(sum(CASE WHEN n_hit > 0 THEN n_rows ELSE 0 END)
       |    AS BIGINT) AS rows_scanned,
       |  CAST(sum(n_hit) AS BIGINT) AS rows_matched
       |FROM pf GROUP BY layout ORDER BY layout""".stripMargin
  }

  /** Target shard size (bytes of document text) for q97. */
  val ShardTarget = 4096L
  /** Docs per simulated input file (doc_id div this). */
  val FileGroup = 5L

  /** q97: small-file compaction planning — group each source's
    * documents into their current small "files" (doc_id ranges),
    * then pack files into shards targeting [[ShardTarget]] bytes by
    * first-fit over a size-descending scan, and report every planned
    * shard: (source, shard, n_files, n_docs, bytes, fill_e4).
    *
    * This is the lakehouse `OPTIMIZE`/compaction planner: the
    * many-small-files state (one file per append) degrades 100 TB
    * scans with per-file open cost and tiny row groups; the plan
    * output is the merge manifest a rewrite job executes. Packing is
    * a per-source running sum over files ordered (bytes DESC, fid) —
    * shard id = floor((cumsum - bytes) / target), the next-fit rule
    * on a first-fit-decreasing order, fully deterministic.
    *
    * 100 TB posture: one documents scan collapses map-side to the
    * per-file stats (O(files) rows); the only shuffle is on `source`,
    * and the running-sum window is PARTITIONED by source — thousands
    * of sources spread across the cluster, no global window
    * anywhere. */
  def q97CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.load(s, dir, "documents")
      .groupBy(col("source"),
        expr(s"doc_id div $FileGroup").as("fid"))
      .agg(sum(col("n_chars")).as("bytes"), count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("bytes").desc, col("fid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("shard", expr(s"(cum - bytes) div $ShardTarget"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
        sum(col("bytes")).as("bytes"))
      .withColumn("fill_e4", expr(s"bytes * 10000 div $ShardTarget"))
      .orderBy(col("source"), col("shard"))
  }

  val q97CompactionPlanOracle: String =
    s"""WITH files AS (
       |  SELECT source, doc_id // $FileGroup AS fid,
       |    CAST(sum(n_chars) AS BIGINT) AS bytes,
       |    count(*) AS n_docs
       |  FROM documents GROUP BY source, doc_id // $FileGroup),
       |packed AS (
       |  SELECT source, fid, bytes, n_docs,
       |    sum(bytes) OVER (PARTITION BY source
       |      ORDER BY bytes DESC, fid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM files)
       |SELECT source, CAST((cum - bytes) // $ShardTarget AS BIGINT)
       |    AS shard,
       |  count(*) AS n_files, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |  CAST(sum(bytes) AS BIGINT) AS bytes,
       |  CAST(sum(bytes) * 10000 // $ShardTarget AS BIGINT) AS fill_e4
       |FROM packed GROUP BY source, (cum - bytes) // $ShardTarget
       |ORDER BY source, shard""".stripMargin
}
