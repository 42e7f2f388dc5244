package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Token-budget mixture planning: given per-source token masses, a
  * total training budget and a repetition cap, compute each source's
  * token allocation by exact integer WATER-FILLING — the "how many
  * epochs of each domain" computation behind curated data mixtures
  * (the Gopher/Chinchilla/DoReMi-style budget split, with the
  * up-sampling ceiling that keeps small domains from repeating
  * unboundedly).
  *
  * Semantics: every source can supply at most `cap_i = E·n_i` tokens
  * (E epochs of itself). The budget B fills all sources to a common
  * integer level c — small sources saturate at their cap, large ones
  * stop at c — where c is the largest integer with
  * Σ min(cap_i, c) ≤ B. Exactly the classic water-filling solution,
  * computed in closed form over the cap-sorted prefix sums. The
  * leftover `slack = B − Σ alloc` (0 ≤ slack < #unsaturated) is
  * reported, not silently smeared: allocation is integer and
  * deterministic, no rounding policy hides in the result.
  *
  * Exactness: masses, caps, prefix sums, allocations and the
  * per-source epoch count in 1e-6 units (`epochs_e6 = alloc·1e6 div
  * n`, true integer division) are BIGINT end to end. The one
  * non-integer step is the water-level division,
  * `floor(double(B − prefix) / double(D − k))` — identical IEEE ops
  * on identical integer inputs in both engines (the q70 trick),
  * and exact outright while B − prefix < 2⁵³ (a ~9·10¹⁵-token
  * budget; beyond that, lift to DECIMAL as q55 did). The
  * `epochs_e6` intermediate `alloc·10⁶` similarly holds to
  * ~9·10¹²-token sources on BIGINT — same DECIMAL lift applies.
  *
  * 100 TB posture: one map pass over the corpus collapses to a
  * #sources-row table via map-side combined groupBy; the
  * water-filling itself runs inside a single collected row with
  * array HOFs (the q86 bounded-sufficient-statistic shape — no
  * window over data, no join, no driver loop). A corpus of any size
  * costs one scan; the planning math costs O(D²) on a D ≈ dozens
  * array. */
object Budget {

  val MaxEpochs = 4L   // E: repetition ceiling per source
  val BudgetNum = 3L   // budget B = floor(N · 3/2): forces both
  val BudgetDen = 2L   // saturation (small sources) and trimming

  private def lsum(arr: Column, f: Column => Column): Column =
    aggregate(arr, lit(0L), (a, x) => a + f(x))

  /** q88: per-source water-filled token allocation; returns
    * (source, n_tokens, cap, alloc, epochs_e6, level, slack). */
  def q88TokenBudget(s: SparkSession, dir: String): DataFrame = {
    val masses = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("source"),
        graft.functions.TextStatFunctions.tokenStats(col("text"), Nil)
          .getItem(1).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n"))
      .filter(col("n") > 0)

    // ONE row: sources sorted by (cap, source) + the global masses
    val one = masses
      .select(struct((col("n") * MaxEpochs).as("cap"),
        col("source").as("source"), col("n").as("n")).as("d"))
      .agg(sort_array(collect_list(col("d"))).as("ds"))
      .withColumn("dn", size(col("ds")))
      .withColumn("ntot", lsum(col("ds"), _.getField("n")))
      .withColumn("captot", lsum(col("ds"), _.getField("cap")))
      .withColumn("b", expr(s"ntot * $BudgetNum div $BudgetDen"))

    // water level: for k saturated sources (the k smallest caps),
    // c_k = (B − prefix_k) div (D − k); the valid k is the one with
    // cap_k ≤ c_k < cap_{k+1}. If B ≥ Σcap every source saturates
    // and the level is the max cap.
    val levels = transform(
      filter(sequence(lit(1), greatest(col("dn"), lit(1))),
        t => t <= col("dn")),
      k => {
        val k0 = k - 1 // saturated count for this candidate
        val prefix = lsum(slice(col("ds"), lit(1), k0),
          _.getField("cap"))
        val c = floor((col("b") - prefix).cast("double") /
          (col("dn") - k0).cast("double")).cast("long")
        val lo = when(k0 === 0, lit(0L))
          .otherwise(element_at(col("ds"), k0).getField("cap"))
        val hi = element_at(col("ds"), k).getField("cap")
        struct((lo <= c && c < hi).as("ok"), c.as("c"))
      })
    val level = when(col("dn") === 0, lit(0L))
      .when(col("b") >= col("captot"),
        element_at(col("ds"), col("dn")).getField("cap"))
      .otherwise(element_at(
        filter(levels, l => l.getField("ok")), 1).getField("c"))

    val withLevel = one.withColumn("level", level)
      .withColumn("alloctot",
        lsum(col("ds"), d => least(d.getField("cap"), col("level"))))
      .withColumn("slack",
        least(col("b"), col("captot")) - col("alloctot"))

    withLevel
      .select(explode(col("ds")).as("d"), col("level"), col("slack"))
      .select(col("d.source").as("source"), col("d.n").as("n_tokens"),
        col("d.cap").as("cap"),
        least(col("d.cap"), col("level")).as("alloc"),
        col("level"), col("slack"))
      .withColumn("epochs_e6", expr("alloc * 1000000 div n_tokens"))
      .select(col("source"), col("n_tokens"), col("cap"), col("alloc"),
        col("epochs_e6"), col("level"), col("slack"))
      .orderBy(col("source"))
  }

  val q88TokenBudgetOracle: String = {
    val toks = TextAnalysis.tokensSql
    s"""WITH masses AS (
       |  SELECT source, CAST(sum(len($toks)) AS BIGINT) AS n
       |  FROM documents GROUP BY source HAVING sum(len($toks)) > 0),
       |caps AS (
       |  SELECT source, n, n * $MaxEpochs AS cap,
       |    row_number() OVER (ORDER BY n * $MaxEpochs, source) AS rk
       |  FROM masses),
       |tot AS (
       |  SELECT count(*) AS dn, CAST(sum(n) AS BIGINT) AS ntot,
       |    CAST(sum(cap) AS BIGINT) AS captot,
       |    CAST(sum(n) * $BudgetNum // $BudgetDen AS BIGINT) AS b
       |  FROM caps),
       |pre AS (
       |  SELECT rk, cap,
       |    CAST(coalesce(sum(cap) OVER (ORDER BY rk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS prefix,
       |    CAST(coalesce(lag(cap) OVER (ORDER BY rk), 0) AS BIGINT)
       |      AS lo
       |  FROM caps),
       |cand AS (
       |  SELECT p.rk,
       |    CAST(floor(CAST(t.b - p.prefix AS DOUBLE)
       |      / CAST(t.dn - (p.rk - 1) AS DOUBLE)) AS BIGINT) AS c,
       |    p.lo, p.cap FROM pre p, tot t),
       |lvl AS (
       |  SELECT CASE WHEN t.b >= t.captot
       |    THEN (SELECT max(cap) FROM caps)
       |    ELSE (SELECT c FROM cand
       |          WHERE lo <= c AND c < cap ORDER BY rk LIMIT 1)
       |    END AS level, t.b, t.captot
       |  FROM tot t),
       |alloc AS (
       |  SELECT c.source, c.n, c.cap,
       |    CAST(least(c.cap, l.level) AS BIGINT) AS alloc,
       |    l.level, l.b, l.captot
       |  FROM caps c, lvl l)
       |SELECT source, n AS n_tokens, cap, alloc,
       |  CAST(alloc * 1000000 // n AS BIGINT) AS epochs_e6,
       |  CAST(level AS BIGINT) AS level,
       |  CAST(least(b, captot) -
       |    (SELECT sum(alloc) FROM alloc) AS BIGINT) AS slack
       |FROM alloc
       |ORDER BY source""".stripMargin
  }
}
