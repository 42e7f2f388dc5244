package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Optimizer-grade statistics and ranking operators: join-size
  * estimation from collected column statistics (the ANALYZE TABLE
  * machinery every cost-based optimizer runs, calibrated against the
  * exact answer), and time-decayed popularity ranking.
  */
object Stats {

  /** Heavy-hitter histogram size for q111's end-biased estimate. */
  val HistK = 100

  /** q111: join-cardinality estimation, calibrated — for two joins
    * (the orders⋈lineitem PK/FK join and the skewed lineitem
    * partkey self-join) compute the EXACT join output size next to
    * the two estimates an optimizer would derive from collected
    * stats, one row per join: (join_name, n_a, n_b, ndv_a, ndv_b,
    * exact_rows, est_indep, est_hist, err_indep_e4, err_hist_e4).
    *
    * est_indep = n_a·n_b div max(ndv_a, ndv_b) — the textbook
    * attribute-independence/containment assumption (Selinger 1979),
    * the formula Spark's own CBO and every System-R descendant use
    * when only (rowcount, NDV) exist. est_hist — the end-biased
    * histogram (Ioannidis & Poosala): the [[HistK]] most frequent
    * keys of side A contribute their EXACT product (their B counts
    * are joined in), the tails fall back to independence:
    * tail_a·tail_b div max(tail-NDVs). The calibration columns are
    * the evidence for when cheap stats suffice and when the
    * heavy-hitter histogram pays (the skew case).
    *
    * 100 TB posture: everything runs on per-KEY count tables
    * (key-type scale, the q98 argument — one map-side-combined
    * groupBy per side is the only corpus-scale work); the histogram
    * is TakeOrderedAndProject(k); every estimate is a 1-row
    * algebraic aggregate. Exact integer arithmetic throughout
    * (DECIMAL(38,0) for the row products — n_a·n_b overflows BIGINT
    * at warehouse scale). */
  def q111JoinCard(s: SparkSession, dir: String): DataFrame = {
    def stats(counts: DataFrame): DataFrame =
      counts.agg(sum(col("c")).as("n"), count(lit(1)).as("ndv"))

    def estimate(name: String, ca: DataFrame, cb: DataFrame): DataFrame = {
      val a = ca.localCheckpoint(false)
      val b = cb.localCheckpoint(false)
      val top = a.orderBy(col("c").desc, col("k")).limit(HistK)
        .select(col("k"), col("c").as("ca_top"))
      // exact product over the histogram keys (B counts joined in);
      // 1-row aggregates everywhere after
      val hh = top.join(b.select(col("k"), col("c").as("cb_top")), Seq("k"), "left")
        .agg(coalesce(sum(expr(
          "CAST(ca_top AS DECIMAL(38,0)) * coalesce(cb_top, 0)")),
          lit(0).cast("decimal(38,0)")).as("hh_rows"),
          coalesce(sum(col("ca_top")), lit(0L)).as("na_top"),
          coalesce(sum(col("cb_top")), lit(0L)).as("nb_top"),
          coalesce(sum(when(col("cb_top").isNotNull, 1L).otherwise(0L)),
            lit(0L)).as("ndv_b_top"),
          count(lit(1)).as("ndv_a_top"))
      val exact = a.join(b.select(col("k"), col("c").as("cb")), "k")
        .agg(coalesce(sum(expr("CAST(c AS DECIMAL(38,0)) * cb")),
          lit(0).cast("decimal(38,0)")).as("exact_rows"))
      stats(a).crossJoin(broadcast(
          stats(b).select(col("n").as("n_b"), col("ndv").as("ndv_b"))))
        .select(col("n").as("n_a"), col("ndv").as("ndv_a"),
          col("n_b"), col("ndv_b"))
        .crossJoin(broadcast(hh))
        .crossJoin(broadcast(exact))
        .select(lit(name).as("join_name"), col("n_a"), col("n_b"),
          col("ndv_a"), col("ndv_b"),
          expr("CAST(exact_rows AS BIGINT)").as("exact_rows"),
          expr("CAST(CAST(n_a AS DECIMAL(38,0)) * n_b" +
            " div greatest(ndv_a, ndv_b) AS BIGINT)").as("est_indep"),
          expr("CAST(hh_rows + CAST(n_a - na_top AS DECIMAL(38,0))" +
            " * (n_b - nb_top)" +
            " div greatest(ndv_a - ndv_a_top, ndv_b - ndv_b_top, 1)" +
            " AS BIGINT)").as("est_hist"))
        .withColumn("err_indep_e4", expr(
          "CASE WHEN exact_rows = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE (est_indep - exact_rows) * 10000 div exact_rows END"))
        .withColumn("err_hist_e4", expr(
          "CASE WHEN exact_rows = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE (est_hist - exact_rows) * 10000 div exact_rows END"))
    }

    val ordersK = Tables.load(s, dir, "orders")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("c"))
    val liOrderK = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c"))
    val liPartK = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("c"))
    estimate("orders_lineitem_orderkey", ordersK, liOrderK)
      .unionByName(estimate("lineitem_partkey_selfjoin", liPartK, liPartK))
      .orderBy(col("join_name"))
  }

  val q111JoinCardOracle: String = {
    def block(name: String, aSql: String, bSql: String): String =
      s"""SELECT '$name' AS join_name, n_a, n_b, ndv_a, ndv_b,
         |  CAST(exact_rows AS BIGINT) AS exact_rows,
         |  CAST(CAST(n_a AS HUGEINT) * n_b
         |    // greatest(ndv_a, ndv_b) AS BIGINT) AS est_indep,
         |  CAST(hh_rows + CAST(n_a - na_top AS HUGEINT) * (n_b - nb_top)
         |    // greatest(ndv_a - ndv_a_top, ndv_b - ndv_b_top, 1)
         |    AS BIGINT) AS est_hist,
         |  CASE WHEN exact_rows = 0 THEN 0
         |    ELSE CAST((CAST(CAST(n_a AS HUGEINT) * n_b
         |      // greatest(ndv_a, ndv_b) AS BIGINT) - exact_rows)
         |      * 10000 // exact_rows AS BIGINT) END AS err_indep_e4,
         |  CASE WHEN exact_rows = 0 THEN 0
         |    ELSE CAST((CAST(hh_rows
         |      + CAST(n_a - na_top AS HUGEINT) * (n_b - nb_top)
         |      // greatest(ndv_a - ndv_a_top, ndv_b - ndv_b_top, 1)
         |      AS BIGINT) - exact_rows)
         |      * 10000 // exact_rows AS BIGINT) END AS err_hist_e4
         |FROM (
         |  SELECT
         |    (SELECT CAST(sum(c) AS BIGINT) FROM ($aSql)) AS n_a,
         |    (SELECT CAST(count(*) AS BIGINT) FROM ($aSql)) AS ndv_a,
         |    (SELECT CAST(sum(c) AS BIGINT) FROM ($bSql)) AS n_b,
         |    (SELECT CAST(count(*) AS BIGINT) FROM ($bSql)) AS ndv_b,
         |    (SELECT CAST(coalesce(sum(CAST(a.c AS HUGEINT) * b.c), 0)
         |       AS HUGEINT)
         |     FROM ($aSql) a JOIN ($bSql) b ON a.k = b.k) AS exact_rows,
         |    (SELECT CAST(coalesce(sum(CAST(t.c AS HUGEINT)
         |       * coalesce(b.c, 0)), 0) AS HUGEINT)
         |     FROM (SELECT * FROM ($aSql) ORDER BY c DESC, k
         |           LIMIT $HistK) t
         |     LEFT JOIN ($bSql) b ON t.k = b.k) AS hh_rows,
         |    (SELECT CAST(coalesce(sum(c), 0) AS BIGINT)
         |     FROM (SELECT * FROM ($aSql) ORDER BY c DESC, k
         |           LIMIT $HistK)) AS na_top,
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM (SELECT * FROM ($aSql) ORDER BY c DESC, k
         |           LIMIT $HistK)) AS ndv_a_top,
         |    (SELECT CAST(coalesce(sum(b.c), 0) AS BIGINT)
         |     FROM (SELECT * FROM ($aSql) ORDER BY c DESC, k
         |           LIMIT $HistK) t JOIN ($bSql) b ON t.k = b.k)
         |      AS nb_top,
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM (SELECT * FROM ($aSql) ORDER BY c DESC, k
         |           LIMIT $HistK) t JOIN ($bSql) b ON t.k = b.k)
         |      AS ndv_b_top)""".stripMargin
    val ok = "SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c" +
      " FROM orders GROUP BY 1"
    val lok = "SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c" +
      " FROM lineitem GROUP BY 1"
    val lpk = "SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS c" +
      " FROM lineitem GROUP BY 1"
    s"""SELECT * FROM (
       |${block("orders_lineitem_orderkey", ok, lok)}
       |UNION ALL
       |${block("lineitem_partkey_selfjoin", lpk, lpk)}
       |) ORDER BY join_name""".stripMargin
  }

  /** q112 decay schedule: weight = 1024 >> (age_weeks div 13) — a
    * quarterly half-life in pure bit-shift integers, zero after ~10
    * quarters (shift clamped at 62). */
  val DecayBase = 1024L
  val DecayHalfLifeWeeks = 13L
  val DecayTopK = 25

  /** q112: time-decayed popularity ranking — the freshness-weighted
    * leaderboard every feed/recommender pipeline maintains, in exact
    * integer arithmetic: per part, decayed_score = Σ over its order
    * lines of l_quantity · (1024 >> quarters_of_age), next to the
    * undecayed all-time total; top [[DecayTopK]] parts by decayed
    * score: (p_partkey, decayed_score, total_qty, n_orders).
    *
    * Age anchors to the corpus max(o_orderdate) computed in-query (a
    * 1-row broadcast, the q36/q55 totals shape) so the result is a
    * pure function of the data. The exponential decay is a power of
    * two per [[DecayHalfLifeWeeks]]-week step: bit-exact on both
    * engines, no floating point.
    *
    * 100 TB posture: ONE orderkey-keyed join (lineitem⋈orders, the
    * unavoidable fact-to-fact shuffle), map-side weight arithmetic,
    * one partkey-keyed map-side-combined aggregate, and a
    * TakeOrderedAndProject(25) cut — decayed scores are plain sums,
    * so the aggregate merges like any algebraic one.
    * [[q127DecayedMv]] PROVES the incremental-maintenance path:
    * the q57 partial-merge refresh of this leaderboard, gated
    * bit-identical against this full recompute. */
  def q112DecayedPopularity(s: SparkSession, dir: String): DataFrame = {
    val anchor = Tables.load(s, dir, "orders")
      .agg(max(col("o_orderdate")).as("maxd"))
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
      .crossJoin(broadcast(anchor))
      .select(col("o_orderkey"),
        expr("datediff(maxd, o_orderdate) div 7").as("age_weeks"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey"),
        expr(s"shiftright($DecayBase, CAST(least(age_weeks" +
          s" div $DecayHalfLifeWeeks, 62) AS INT))").as("w"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(expr("qty * w")).as("decayed_score"),
        sum(col("qty")).as("total_qty"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("decayed_score").desc, col("p_partkey").asc)
      .limit(DecayTopK)
  }

  val q112DecayedPopularityOracle: String =
    s"""WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
       |aged AS (
       |  SELECT o_orderkey,
       |    datediff('day', o_orderdate, maxd) // 7 AS age_weeks
       |  FROM orders CROSS JOIN anchor),
       |weighted AS (
       |  SELECT l_partkey AS p_partkey,
       |    $DecayBase >> least(age_weeks // $DecayHalfLifeWeeks, 62)
       |      AS w,
       |    CAST(l_quantity AS BIGINT) AS qty
       |  FROM aged JOIN lineitem ON o_orderkey = l_orderkey)
       |SELECT p_partkey,
       |  CAST(sum(qty * w) AS BIGINT) AS decayed_score,
       |  CAST(sum(qty) AS BIGINT) AS total_qty,
       |  count(*) AS n_orders
       |FROM weighted GROUP BY p_partkey
       |ORDER BY decayed_score DESC, p_partkey ASC
       |LIMIT $DecayTopK""".stripMargin

  /** q127: q112's leaderboard maintained INCREMENTALLY — the q57
    * partial-merge MV refresh applied to the decayed score, gated
    * bit-identical against the full recompute (the oracle IS q112's).
    *
    * The maintainable grain is (p_partkey, order-epoch-day): the day
    * key is ANCHOR-INDEPENDENT (an "age bucket" view would go stale
    * the moment the anchor advances), and the stored measures
    * (qty_sum, n_lines) are plain sums, so yesterday's view merges
    * with today's delta by sum — q57's algebraic-merge contract. The
    * decay weights are NOT stored: they derive at refresh time from
    * the stored day keys and the CURRENT anchor, which is exactly
    * how yesterday's scores halve on schedule without touching a
    * single base row. The anchor itself is the refresh-time "now"
    * (q112's definition: corpus max order date — one 1-row
    * broadcast).
    *
    * Refresh cost is O(delta + |view|): each stored view row holds
    * the base partial and the newest modular-orderkey delta partial
    * (q57's convention) as separate slice COLUMNS of its (part, day)
    * key, all off ONE fact-to-fact join, and the refresh merge is a
    * columnwise sum touching only |parts|·|days| view rows. At
    * 100 TB this is the difference between a nightly leaderboard
    * refresh and a nightly corpus rescan. */
  def q127DecayedMv(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("eday"))
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("qty"))
    // ONE fact join, ONE view-grain aggregate: the stored view row
    // carries the base slice and the delta slice as separate
    // COLUMNS of its (part, day) key, so the refresh merge is a
    // columnwise sum — q57's algebraic merge with zero extra
    // passes. (The alternatives both lose: filter-and-union lets
    // Catalyst push the group-key filter below the aggregate and
    // split the plan into two full fact joins, and a second
    // re-keying aggregate doubles the full-cardinality agg — TPC-H's
    // (part, day) grain is near-lineitem-sized; measured 26 s / 19 s
    // vs 12 s here at ×100.)
    val isDelta = col("o_orderkey") % 10 === 9
    val view = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_partkey").as("p_partkey"), col("eday"))
      .agg(
        sum(when(!isDelta, col("qty")).otherwise(0L)).as("qty_base"),
        sum(when(isDelta, col("qty")).otherwise(0L)).as("qty_delta"),
        sum(when(!isDelta, 1L).otherwise(0L)).as("n_base"),
        sum(when(isDelta, 1L).otherwise(0L)).as("n_delta"))
    val merged = view.select(col("p_partkey"), col("eday"),
      (col("qty_base") + col("qty_delta")).as("qty_sum"),
      (col("n_base") + col("n_delta")).as("n_lines"))
    val anchor = o.agg(max(col("eday")).as("maxday"))
    merged.crossJoin(broadcast(anchor))
      .select(col("p_partkey"),
        expr(s"shiftright($DecayBase, CAST(least((maxday - eday)" +
          s" div 7 div $DecayHalfLifeWeeks, 62) AS INT))").as("w"),
        col("qty_sum"), col("n_lines"))
      .groupBy(col("p_partkey"))
      .agg(sum(expr("qty_sum * w")).as("decayed_score"),
        sum(col("qty_sum")).as("total_qty"),
        sum(col("n_lines")).as("n_orders"))
      .orderBy(col("decayed_score").desc, col("p_partkey").asc)
      .limit(DecayTopK)
  }

  /** Refresh ≡ recompute IS the gate: the oracle is q112's full
    * recompute, so any drift in the merge (a lost partial, a stale
    * weight, a double-counted delta) hash-fails. */
  val q127DecayedMvOracle: String = q112DecayedPopularityOracle

  /** q144 resample count — enough for stable 2.5/97.5 percentile
    * ranks (5 and 195) while the resample table stays a 200-row
    * aggregate. */
  val BootstrapB = 200

  /** Poisson(1) CDF thresholds scaled to 2⁴⁸ — P(X ≤ k)·2⁴⁸ for
    * k = 0..8 (mass beyond 8 is ~1.1e-9 of draws and truncates to
    * weight 8 IDENTICALLY in both engines). A per-(doc, replicate)
    * uniform u < T_k ⟺ the Poisson draw is ≤ k. */
  val PoissonCdfE48: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L,
    276130285696162L, 280444821410164L, 281307728552965L,
    281451546410098L, 281472091818260L, 281474659994280L)

  /** CASE chain mapping a 48-bit uniform to its Poisson(1) draw —
    * plain integer literals, valid in BOTH SQL dialects. */
  private def poissonWeightSql(u: String): String =
    PoissonCdfE48.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** q144: nonparametric CI for the corpus mean document length via
    * the POISSON BOOTSTRAP — the resampling scheme that works in one
    * distributed pass because each row draws its own independent
    * Poisson(1) multiplicity per replicate instead of the sequential
    * multinomial draw classical bootstrap needs (Chamandy, Muralidharan,
    * Najmi & Naidu 2012, "Estimating uncertainty for massive data
    * streams"; Kleiner et al.'s BLB is the other standard answer).
    * One row: (b_resamples, n_docs, point_mean_e6, ci_lo_e6,
    * ci_hi_e6) — the 95% percentile interval of [[BootstrapB]]
    * resample means of n_chars.
    *
    * Determinism across engines: the "randomness" is md5(doc_id:b)
    * truncated to 48 bits — the q107 portable-hash rule — compared
    * against precomputed integer Poisson CDF thresholds
    * ([[PoissonCdfE48]]); every draw is bit-identical in Spark and
    * DuckDB, so the oracle gates values, not just shape. Resample
    * means are exact integers (Σw·x and Σw are BIGINTs; the ratio
    * widens to DECIMAL(38,0) before the ×10⁶ — the q114 rule).
    *
    * 100 TB posture: the corpus×B expansion is map-side codegen
    * (explode over a literal sequence feeding a partial aggregate);
    * the only exchange carries ≤ B·partitions partial rows into a
    * B-row final aggregate, and the percentile pick runs inside ONE
    * sorted [[BootstrapB]]-element array — no corpus-scale shuffle,
    * no unpartitioned Window, no driver collect. */
  def q144BootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("n_chars"))
    val weighted = docs
      .select(col("doc_id"), col("n_chars"),
        explode(expr(s"sequence(0, ${BootstrapB - 1})")).as("b"))
      .withColumn("u", expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':'," +
          " CAST(b AS STRING))), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("w", expr(poissonWeightSql("u")))
    // a zero-weight resample has no mean — dropped on BOTH engines
    // (P = e^{-n} per replicate: real for toy fixtures, vanishing at
    // corpus scale), and the percentile ranks run over the survivors
    val resamples = weighted.groupBy(col("b"))
      .agg(sum(col("w") * col("n_chars")).as("sx"),
        sum(col("w")).as("nw"))
      .filter(col("nw") > 0)
      .select(col("b"), expr(
        """CAST(CAST(sx AS DECIMAL(38,0)) * 1000000 div nw
           AS BIGINT)""").as("mean_e6"))
    val ci = resamples
      .agg(sort_array(collect_list(col("mean_e6"))).as("ms"))
      .select(
        expr("""element_at(ms, CAST(greatest(1,
                size(ms) * 25 div 1000) AS INT))""").as("ci_lo_e6"),
        expr("""element_at(ms, CAST(greatest(1,
                size(ms) * 975 div 1000) AS INT))""").as("ci_hi_e6"))
    val point = docs.agg(count(lit(1)).as("n_docs"),
      expr("""CAST(CAST(sum(n_chars) AS DECIMAL(38,0)) * 1000000
              div count(*) AS BIGINT)""").as("point_mean_e6"))
    point.crossJoin(ci)
      .select(lit(BootstrapB.toLong).as("b_resamples"), col("n_docs"),
        col("point_mean_e6"), col("ci_lo_e6"), col("ci_hi_e6"))
  }

  val q144BootstrapCiOracle: String = {
    val uSql = s"(${graft.operators.Sketch.hexSql("hx", 12)})"
    s"""WITH expl AS (
       |  SELECT doc_id, n_chars, unnest(range(0, $BootstrapB)) AS b
       |  FROM documents),
       |hashed AS (
       |  SELECT n_chars,  b,
       |    substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
       |      CAST(b AS VARCHAR)), 1, 12) AS hx
       |  FROM expl),
       |drawn AS (
       |  SELECT b, n_chars,
       |    ${poissonWeightSql(uSql)} AS w
       |  FROM hashed),
       |resamples AS (
       |  SELECT b,
       |    CAST(CAST(sum(w * n_chars) AS HUGEINT) * 1000000
       |      // sum(w) AS BIGINT) AS mean_e6
       |  FROM drawn GROUP BY b HAVING sum(w) > 0),
       |ranked AS (
       |  SELECT mean_e6,
       |    row_number() OVER (ORDER BY mean_e6) AS rk,
       |    count(*) OVER () AS nv
       |  FROM resamples),
       |point AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(CAST(sum(n_chars) AS HUGEINT) * 1000000 // count(*)
       |      AS BIGINT) AS point_mean_e6
       |  FROM documents)
       |SELECT CAST($BootstrapB AS BIGINT) AS b_resamples,
       |  p.n_docs, p.point_mean_e6,
       |  (SELECT mean_e6 FROM ranked
       |    WHERE rk = greatest(1, nv * 25 // 1000)) AS ci_lo_e6,
       |  (SELECT mean_e6 FROM ranked
       |    WHERE rk = greatest(1, nv * 975 // 1000)) AS ci_hi_e6
       |FROM point p""".stripMargin
  }
}
