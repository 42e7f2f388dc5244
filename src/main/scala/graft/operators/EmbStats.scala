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

  /** Embedding dimensionality (the corpus is fixed 64-dim). */
  val PcaDims = 64
  /** Pinned power-iteration rounds (unrolled identically in the
    * oracle — the q65/q164 discipline: both engines compute the same
    * not-yet-converged iterate; convergence is a modeling question,
    * bit-equality is the gate). */
  val PcaRounds = 3
  /** Fixed-point scale: vectors renormalize to ∥·∥∞ = 10⁶ each round. */
  val PcaScale = 1000000L

  /** q170: top principal direction of the centered embedding Gram
    * matrix by integer power iteration — the DIRECTION of the
    * anisotropy q166 quantifies per-dimension (Mu & Viswanath 2018's
    * "all-but-the-top" removes exactly this vector before trusting
    * cosine; computing it from the corpus is the first step of that
    * standard embedding post-process). One row per dimension:
    * (dim [0-based], comp_e6), the iterate after [[PcaRounds]]
    * rounds, ∥·∥∞-normalized to ×10⁶ integers, sign fixed so the
    * largest-|component| dimension (ties → lowest dim) is positive.
    *
    * EXACT WITHOUT CENTERING THE SCAN: with S_j = Σv_j and n rows,
    * the centered Gram is G_ij = n²·X_ij − n·S_i·S_j where X_ij =
    * Σv_i·v_j — so the corpus pass needs only the RAW second moment.
    * ONE scan computes everything: the codegen'd
    * [[graft.functions.OuterProducts]] kernel emits the flattened
    * v·vᵀ per row, the vector itself and a count-1 cell are
    * concatenated onto it, and a single flat-index aggregate with
    * map-side combine reduces the corpus to dims²+dims+1 partials
    * per partition — only those ever shuffle, at ANY corpus size.
    * G's own assembly `n²·X − n·S_i·S_j` is bounded by ~n³·maxv²
    * (maxv = 10³ milli-units here), so DECIMAL(38,0) holds up to
    * n ≈ 5·10¹⁰ rows — ~25× past the 100 TB corpus — and beyond that
    * Spark's non-ANSI decimal yields silent NULLs where DuckDB's
    * HUGEINT errors loudly; the guard below turns that into a loud
    * error on this side too. G is then pre-scaled to ppm by its own
    * max |entry| (G·r would pass DECIMAL(38,0) at warehouse row
    * counts otherwise — the pre-scale protects the matvec, NOT G's
    * assembly, hence the separate bound above); each
    * round is a dims²-row join + aggregate with 1-row max
    * renormalization. All divisions truncate with the sign OUTSIDE
    * (the q152 convention); zero-variance corpora report all-zero
    * components rather than dividing by zero. */
  def q170PcaPower(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.outerProducts
    val d = PcaDims
    val flat = Tables.spread(Tables.load(s, dir, "embeddings"))
      .select(Similarity.ivec(col("embedding")).as("v0"))
      // pad/truncate to exactly d components: the flat-index layout
      // below (products at k < d², components at d² ≤ k < d²+d, the
      // count cell at k = d²+d) requires a fixed-width vector
      .select(expr(s"concat(slice(v0, 1, $d), array_repeat(" +
        s"CAST(0 AS BIGINT), $d - size(slice(v0, 1, $d))))").as("v"))
      .select(posexplode(concat(outerProducts(col("v"), d), col("v"),
        array(lit(1L)))).as(Seq("k", "p")))
      .groupBy(col("k"))
      .agg(sum(col("p").cast("decimal(38,0)")).as("sp"))
      .localCheckpoint(false) // X block + S block + n row read it
    val nRow = flat.filter(col("k") === d * d + d)
      .select(col("sp").as("n"))
    val sVec = flat.filter(col("k") >= d * d && col("k") < d * d + d)
      .select((col("k") - d * d).cast("long").as("dim"), col("sp").as("s"))
    val g = flat.filter(col("k") < d * d)
      .select(expr(s"CAST(k div $d AS BIGINT)").as("di"),
        expr(s"CAST(k % $d AS BIGINT)").as("dj"), col("sp").as("x"))
      .join(broadcast(sVec.select(col("dim").as("di"), col("s").as("si"))),
        "di")
      .join(broadcast(sVec.select(col("dim").as("dj"), col("s").as("sj"))),
        "dj")
      .crossJoin(broadcast(nRow))
      // inputs are non-null sums, so a NULL here is exactly decimal
      // overflow (n³·maxv² past DECIMAL(38,0)) — raise instead of
      // letting max() skip it and renormalize a corrupted G
      .select(col("di"), col("dj"),
        expr("""CASE WHEN (n * n * x - n * si * sj) IS NULL
                THEN raise_error('q170: Gram assembly overflowed ' ||
                  'DECIMAL(38,0); corpus exceeds the n^3*maxv^2 bound')
                ELSE n * n * x - n * si * sj END""").as("gv"))
    val gm = g.agg(max(abs(col("gv"))).as("gmax"))
    val gs = g.crossJoin(broadcast(gm))
      .select(col("di"), col("dj"),
        expr(s"""CASE WHEN gmax = 0 THEN CAST(0 AS DECIMAL(38,0))
                 ELSE (CASE WHEN gv < 0 THEN -1 ELSE 1 END)
                   * (abs(gv) * $PcaScale div gmax) END""").as("gv"))
      .localCheckpoint(false) // read by every round's matvec
    var r: DataFrame = s.range(d)
      .select(col("id").cast("long").as("dim"),
        lit(PcaScale).cast("decimal(38,0)").as("r"))
    for (_ <- 1 to PcaRounds) {
      val raw = gs
        .join(r.select(col("dim").as("dj"), col("r")), Seq("dj"))
        .groupBy(col("di"))
        .agg(sum(expr("gv * r")).as("raw"))
      val m = raw.agg(max(abs(col("raw"))).as("m"))
      r = raw.crossJoin(broadcast(m))
        .select(col("di").as("dim"),
          expr(s"""CASE WHEN m = 0 THEN CAST(0 AS DECIMAL(38,0))
                   ELSE (CASE WHEN raw < 0 THEN -1 ELSE 1 END)
                     * (abs(raw) * $PcaScale div m) END""").as("r"))
        .localCheckpoint(false) // next round + sign pick + report
    }
    val top = r.orderBy(abs(col("r")).desc, col("dim").asc).limit(1)
      .select(expr("CASE WHEN r < 0 THEN -1 ELSE 1 END").as("sgn"))
    r.crossJoin(broadcast(top))
      .select(col("dim"), expr("CAST(r * sgn AS BIGINT)").as("comp_e6"))
      .orderBy(col("dim"))
  }

  val q170PcaPowerOracle: String = {
    def round(k: Int): String =
      s"""raw$k AS MATERIALIZED (
         |  SELECT gs.di AS dim, sum(gs.gv * p.r) AS raw
         |  FROM gs JOIN r${k - 1} p ON p.dim = gs.dj GROUP BY 1),
         |m$k AS (SELECT max(abs(raw)) AS m FROM raw$k),
         |r$k AS MATERIALIZED (
         |  SELECT dim,
         |    CASE WHEN m = 0 THEN CAST(0 AS HUGEINT)
         |      ELSE (CASE WHEN raw < 0 THEN -1 ELSE 1 END)
         |        * (abs(raw) * $PcaScale // m) END AS r
         |  FROM raw$k, m$k)""".stripMargin
    val rounds = (1 to PcaRounds).map(round).mkString(",\n")
    s"""WITH base AS MATERIALIZED (
       |  SELECT ${Similarity.ivecSql} AS v FROM embeddings),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM base),
       |ds AS (SELECT unnest(range(1, $PcaDims + 1)) AS i),
       |sv AS MATERIALIZED (
       |  SELECT i AS dim, CAST(sum(v[i]) AS HUGEINT) AS s
       |  FROM base, ds GROUP BY 1),
       |xx AS MATERIALIZED (
       |  SELECT a.i AS di, b.i AS dj,
       |    CAST(sum(v[a.i] * v[b.i]) AS HUGEINT) AS x
       |  FROM base, ds a, ds b GROUP BY 1, 2),
       |g AS (
       |  SELECT di, dj, n * n * x - n * sa.s * sb.s AS gv
       |  FROM xx JOIN sv sa ON sa.dim = di JOIN sv sb ON sb.dim = dj
       |  CROSS JOIN nn),
       |gm AS (SELECT max(abs(gv)) AS gmax FROM g),
       |gs AS MATERIALIZED (
       |  SELECT di, dj,
       |    CASE WHEN gmax = 0 THEN CAST(0 AS HUGEINT)
       |      ELSE (CASE WHEN gv < 0 THEN -1 ELSE 1 END)
       |        * (abs(gv) * $PcaScale // gmax) END AS gv
       |  FROM g, gm),
       |r0 AS (SELECT i AS dim, CAST($PcaScale AS HUGEINT) AS r FROM ds),
       |$rounds,
       |top AS (
       |  SELECT CASE WHEN r < 0 THEN -1 ELSE 1 END AS sgn
       |  FROM r$PcaRounds ORDER BY abs(r) DESC, dim ASC LIMIT 1)
       |SELECT CAST(f.dim - 1 AS BIGINT) AS dim,
       |  CAST(f.r * top.sgn AS BIGINT) AS comp_e6
       |FROM r$PcaRounds f, top ORDER BY dim""".stripMargin
  }
}
