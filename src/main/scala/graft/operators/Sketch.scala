package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextAnalysis.tokensSql

/** Count-Min-Sketch frequency estimation over corpus tokens, with
  * its error calibrated against exact counts in the same table
  * (Cormode & Muthukrishnan 2005) — the mergeable sketch behind
  * "how often does this token/n-gram occur in 100 TB" questions
  * where a full exact count table is not worth materializing.
  *
  * The sketch is `Depth` hash rows × `Width` counters; an
  * occurrence increments one counter per row (bucket = 24-bit
  * md5 prefix of `r:token` mod Width); the point estimate is the MIN
  * over rows — never an underestimate, overshoot bounded by
  * collisions. The query reports, for the `TopK` exact heavy
  * hitters, the exact count NEXT TO the sketch estimate and its
  * overshoot — like q89, the estimator and its ground truth in one
  * table, which is the evidence a deployment needs before dropping
  * the exact arm.
  *
  * Scale shape: counter increments are associative sums, so the
  * sketch is built by one map-side-combined groupBy to a d×W-row
  * table — the partial aggregate per partition IS the per-partition
  * sketch and the shuffle merges them, which is exactly the
  * mergeable-summary contract. Building from the distinct-word
  * count table (as here, where the exact arm needs that table
  * anyway) or directly from the occurrence stream is the same
  * result by associativity; a sketch-only deployment does the
  * latter and never shuffles anything wider than d×W counters.
  * Heavy-hitter selection is TakeOrderedAndProject (O(k) per
  * partition); the estimate join probes a broadcast d×W table.
  *
  * Exactness: counts BIGINT; buckets are integer md5-prefix
  * arithmetic identical in both engines; ties in the top-k break on
  * the token string. Fully deterministic. */
object Sketch {

  val Depth = 4   // hash rows
  val Width = 64  // counters per row
  val TopK = 20   // heavy hitters reported

  /** CMS bucket of `w` for hash row `r`: 24-bit md5 prefix mod Width. */
  private def bucket(r: Column, w: Column): Column =
    conv(substring(md5(concat(r.cast("string"), lit(":"), w)), 1, 6),
      16, 10).cast("long") % Width

  /** The d×W sketch of a document set, built straight from the
    * occurrence stream — ONE declarative definition that runs over a
    * batch DataFrame *and* a streaming one unchanged (a streaming
    * aggregation whose state is the ≤ d×W counter groups themselves:
    * bounded regardless of stream length, no watermark needed — the
    * mergeable-summary contract as a Spark plan). By associativity
    * of the counter sums this equals q91's build from the exact
    * word-count table; [[SketchStreamSpec]] asserts all three routes
    * (batch here, streaming here, q91's) agree counter for counter. */
  def tokenSketch(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(col("w"), explode(sequence(lit(0), lit(Depth - 1))).as("r"))
      .withColumn("b", bucket(col("r"), col("w")))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))

  /** q91: CMS estimates vs exact counts for the top-K tokens;
    * returns (token, n_exact, cms_est, overshoot). */
  def q91CmsCalibration(s: SparkSession, dir: String): DataFrame = {
    // the ONE corpus-scale pass: occurrence counts per distinct word.
    // localCheckpoint: both the sketch build and the top-k selection
    // consume it; without the barrier the corpus is re-scanned twice.
    val exact = Tables.spread(Tables.load(s, dir, "documents"))
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)

    val rs = explode(sequence(lit(0), lit(Depth - 1))).as("r")
    val sketch = exact.select(col("w"), col("n"), rs)
      .withColumn("b", bucket(col("r"), col("w")))
      .groupBy(col("r"), col("b")).agg(sum(col("n")).as("c"))

    val topk = exact.orderBy(col("n").desc, col("w")).limit(TopK)
    topk.select(col("w"), col("n"), rs)
      .withColumn("b", bucket(col("r"), col("w")))
      .join(sketch, Seq("r", "b"))
      .groupBy(col("w"), col("n")).agg(min(col("c")).as("cms_est"))
      .select(col("w").as("token"), col("n").as("n_exact"),
        col("cms_est"), (col("cms_est") - col("n")).as("overshoot"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** 6-hex-char decode as DuckDB SQL (the q81 strpos chain). */
  private def hex6Sql(hx: String): String =
    (0 until 6).map { i =>
      val mult = math.pow(16, 5 - i).toLong
      s"(strpos('0123456789abcdef', substring($hx, ${i + 1}, 1)) - 1)" +
        (if (mult == 1) "" else s" * $mult")
    }.mkString("\n      + ")

  val q91CmsCalibrationOracle: String =
    s"""WITH toks AS (
       |  SELECT unnest($tokensSql) AS w FROM documents),
       |exact AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY w),
       |bv AS (
       |  SELECT w, n, r,
       |    (${hex6Sql("hx")}) % $Width AS b
       |  FROM (
       |    SELECT w, n, r,
       |      substring(md5(CAST(r AS VARCHAR) || ':' || w), 1, 6) AS hx
       |    FROM (SELECT w, n,
       |            unnest([${(0 until Depth).mkString(", ")}]) AS r
       |          FROM exact))),
       |sketch AS (
       |  SELECT r, b, CAST(sum(n) AS BIGINT) AS c
       |  FROM bv GROUP BY r, b),
       |topk AS (
       |  SELECT w, n FROM exact ORDER BY n DESC, w LIMIT $TopK),
       |est AS (
       |  SELECT p.w, p.n, min(s.c) AS e
       |  FROM (SELECT t.w, t.n, v.r, v.b
       |        FROM topk t JOIN bv v ON v.w = t.w) p
       |  JOIN sketch s ON s.r = p.r AND s.b = p.b
       |  GROUP BY p.w, p.n)
       |SELECT w AS token, n AS n_exact, CAST(e AS BIGINT) AS cms_est,
       |  CAST(e - n AS BIGINT) AS overshoot
       |FROM est ORDER BY n_exact DESC, token""".stripMargin
}
