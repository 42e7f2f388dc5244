package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Pairwise-preference strength rating — the Bradley–Terry model
  * (Bradley & Terry 1952) fit by Hunter 2004's MM iteration, the
  * standard aggregation for preference/comparison data (RLHF reward
  * QA, ranker evaluation, A/B duel analysis). The "duels" here are
  * deterministic order-basket comparisons: within one order, the
  * line with strictly higher quantity beats the other line's brand —
  * a revealed-preference proxy whose point is the SHAPE (bounded
  * per-group pair generation → tiny strength table → value-scale
  * iteration), not the marketing claim.
  *
  * Engine-exact iteration: ratings are ×10⁶-scaled integers, every
  * MM update a truncating integer division both engines share, and
  * the round count is PINNED (q61's fixed-round discipline — the
  * oracle unrolls the same rounds, so both engines compute the
  * identical not-yet-converged iterate; convergence is a modeling
  * question, bit-equality is the gate).
  */
object Preference {

  /** Pinned MM rounds (unrolled identically in the oracle). */
  val BtRounds = 3
  /** Rating scale (p₀ = one unit). */
  val BtScale = 1000000L

  /** q158: Bradley–Terry brand strength via [[BtRounds]] MM rounds.
    * Per round (ratings ×10⁶-scaled, internals ×10¹² in
    * DECIMAL(38,0)/HUGEINT — the q114 widening rule):
    *   denom_i = Σ_j n_ij·10¹² div (p_i + p_j)  (≈ 10⁶·Σ n_ij/(p_i+p_j))
    *   p_i'    = max(1, W_i·10¹² div max(1, denom_i))
    *   p_i''   = normalized so Σp = |items|·10⁶
    * The max(1, ·) guards make winless brands and sparse rows
    * well-defined in both engines (DuckDB errors on //0, Spark
    * returns null — neither is a result). Output: (brand, rating_e6,
    * n_wins, n_comparisons) ordered by rating desc.
    *
    * 100 TB posture: ONE bounded-fan-out corpus exchange (the
    * orderkey self-join) collapses to a ≤|brands|² strength table;
    * the MM rounds join value-scale relations only — iteration cost
    * is independent of corpus size, the same shape a reward-model
    * duel matrix has at any scale. */
  def q158BtRating(s: SparkSession, dir: String): DataFrame = {
    // Round-14 shape (the q65 treatment): the MM iteration runs over
    // a VALUE-SCALE table — ≤ |brands|² ≈ 625 rows at any corpus
    // size — so iterating it as Spark jobs bought ~30 tiny stages of
    // pure scheduling (the per-round pi/pj joins, normalization
    // crossJoin, and barrier; measured ~2 s of the query's 3.2 s at
    // sf0.1 with the duel aggregation itself at ~0.4 s). The corpus
    // does ONE thing: the bounded orderkey self-join collapsing to
    // the directed win matrix, collected at ≤ |brands|² rows; the MM
    // recurrence then runs on the driver in BigInt — bit-identical to
    // the old DECIMAL(38,0) dataflow (truncating division on
    // positive operands, same max(1, ·) guards, same pinned
    // [[BtRounds]]), which the unchanged unrolled oracle re-proves.
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"), col("l_partkey"))
      .join(broadcast(Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("qty"),
        col("p_brand").as("brand"))
    val a = li.select(col("l_orderkey"), col("l_linenumber").as("ln_a"),
      col("qty").as("qty_a"), col("brand").as("brand_a"))
    val b = li.select(col("l_orderkey"), col("l_linenumber").as("ln_b"),
      col("qty").as("qty_b"), col("brand").as("brand_b"))
    val w = a.join(b, Seq("l_orderkey"))
      .filter(col("ln_a") < col("ln_b") &&
        col("brand_a") =!= col("brand_b") &&
        col("qty_a") =!= col("qty_b"))
      .select(
        when(col("qty_a") > col("qty_b"), col("brand_a"))
          .otherwise(col("brand_b")).as("wb"),
        when(col("qty_a") > col("qty_b"), col("brand_b"))
          .otherwise(col("brand_a")).as("lb"))
      .groupBy(col("wb"), col("lb"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    // driver-side duel algebra over the ≤ |brands|² win matrix
    val nMap = scala.collection.mutable.Map.empty[(String, String), Long]
    w.foreach { case (wb, lb, c) =>
      nMap((wb, lb)) = nMap.getOrElse((wb, lb), 0L) + c
      nMap((lb, wb)) = nMap.getOrElse((lb, wb), 0L) + c
    }
    val items = nMap.keys.map(_._1).toSeq.distinct.sorted
    val wins = items.map(i =>
      i -> w.filter(_._1 == i).map(_._3).sum).toMap
    val comps = items.map(i =>
      i -> nMap.collect { case ((a0, _), c) if a0 == i => c }.sum).toMap

    // the MM recurrence, exactly the old per-round dataflow
    val one = BigInt(1)
    val e12 = BigInt(1000000000000L)
    var p = items.map(_ -> BigInt(BtScale)).toMap
    for (_ <- 1 to BtRounds) {
      val denom = items.map { i =>
        i -> nMap.collect { case ((a0, j), c) if a0 == i =>
          BigInt(c) * e12 / (p(i) + p(j))
        }.sum
      }.toMap
      val praw = items.map { i =>
        i -> (BigInt(wins(i)) * e12 / denom(i).max(one)).max(one)
      }.toMap
      val tot = praw.values.sum
      val k = items.size
      p = items.map { i =>
        i -> (praw(i) * (BigInt(k) * BigInt(BtScale)) / tot).max(one)
      }.toMap
    }
    items.map(i => (i, p(i).toLong, wins(i), comps(i)))
      .toDF("brand", "rating_e6", "n_wins", "n_comparisons")
      .orderBy(col("rating_e6").desc, col("brand"))
  }

  val q158BtRatingOracle: String = {
    def round(r: Int, prev: String): String =
      s"""d$r AS MATERIALIZED (
         |  SELECT nn.i,
         |    sum(CAST(nn.n AS HUGEINT) * 1000000000000
         |      // (pa.p + pb.p)) AS denom
         |  FROM nn JOIN $prev pa ON pa.i = nn.i
         |    JOIN $prev pb ON pb.i = nn.j
         |  GROUP BY nn.i),
         |r$r AS MATERIALIZED (
         |  SELECT wi.i,
         |    CAST(greatest(CAST(1 AS HUGEINT),
         |      CAST(wi.wins AS HUGEINT) * 1000000000000 //
         |        greatest(CAST(1 AS HUGEINT), d$r.denom))
         |      AS BIGINT) AS praw
         |  FROM wi JOIN d$r ON d$r.i = wi.i),
         |p$r AS MATERIALIZED (
         |  SELECT i, greatest(CAST(1 AS BIGINT),
         |    CAST(praw * ((SELECT count(*) FROM r$r) * $BtScale) //
         |      (SELECT sum(praw) FROM r$r) AS BIGINT)) AS p
         |  FROM r$r)""".stripMargin
    val rounds = (1 to BtRounds)
      .map(r => round(r, s"p${r - 1}")).mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(l_quantity AS BIGINT) AS qty, p_brand AS brand
       |  FROM lineitem JOIN part ON p_partkey = l_partkey),
       |duels AS (
       |  SELECT CASE WHEN a.qty > b.qty THEN a.brand ELSE b.brand END
       |      AS wb,
       |    CASE WHEN a.qty > b.qty THEN b.brand ELSE a.brand END AS lb
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_linenumber < b.l_linenumber
       |    AND a.brand <> b.brand AND a.qty <> b.qty),
       |w AS MATERIALIZED (
       |  SELECT wb, lb, CAST(count(*) AS BIGINT) AS c
       |  FROM duels GROUP BY 1, 2),
       |nn AS MATERIALIZED (
       |  SELECT i, j, CAST(sum(c) AS BIGINT) AS n FROM (
       |    SELECT wb AS i, lb AS j, c FROM w
       |    UNION ALL SELECT lb AS i, wb AS j, c FROM w)
       |  GROUP BY 1, 2),
       |items AS (SELECT DISTINCT i FROM nn),
       |wi AS MATERIALIZED (
       |  SELECT items.i, CAST(coalesce(sum(w.c), 0) AS BIGINT) AS wins
       |  FROM items LEFT JOIN w ON w.wb = items.i
       |  GROUP BY items.i),
       |p0 AS MATERIALIZED (
       |  SELECT i, CAST($BtScale AS BIGINT) AS p FROM items),
       |$rounds
       |SELECT p$BtRounds.i AS brand, p$BtRounds.p AS rating_e6,
       |  wi.wins AS n_wins,
       |  (SELECT CAST(sum(n) AS BIGINT) FROM nn WHERE nn.i = p$BtRounds.i)
       |    AS n_comparisons
       |FROM p$BtRounds JOIN wi ON wi.i = p$BtRounds.i
       |ORDER BY rating_e6 DESC, brand""".stripMargin
  }
}
