package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** n-hex-char decode as DuckDB SQL (the q81 strpos chain). */
  private[operators] def hexSql(hx: String, n: Int): String =
    (0 until n).map { i =>
      val mult = math.pow(16, n - 1 - i).toLong
      s"(strpos('0123456789abcdef', substring($hx, ${i + 1}, 1)) - 1)" +
        (if (mult == 1) "" else s" * $mult")
    }.mkString("\n      + ")

  private def hex6Sql(hx: String): String = hexSql(hx, 6)

  // ---- q94: HyperLogLog distinct-count calibration -----------------

  /** HLL register-index bits (m = 2^RegBits registers). */
  val RegBits = 8
  val Regs: Int = 1 << RegBits          // 256 registers
  /** Bits of hash material the rank (leading-zero count) reads. */
  val SubBits = 24
  /** α_m × 10⁶ for m = 256: 0.7213 / (1 + 1.079/m) (Flajolet et al.
    * 2007, HyperLogLog) — fixed to an integer constant so both
    * engines compute the identical estimate. */
  val AlphaE6 = 718272L
  /** Scaled estimator numerator: α_e6 · m² · 2^SubBits (≈7.9e17,
    * inside BIGINT); estimate = HllNum div (denom · 10⁶). */
  val HllNum: Long = AlphaE6 * Regs.toLong * Regs.toLong * (1L << SubBits)

  /** The [[Regs]]-register HLL of a document set, built straight
    * from the token OCCURRENCE stream — ONE declarative aggregation
    * that runs over a batch DataFrame *and* a streaming one
    * unchanged (a streaming aggregation whose state is the ≤ m
    * register rows; register maxes merge by max, the HLL
    * mergeability contract). Duplicate tokens are free by insert
    * idempotence (max over equal ranks), so this equals q94's
    * post-distinct build; [[graft.streaming.StreamSketch]] runs it
    * continuously and SketchStreamSpec pins all routes equal. */
  def tokenHll(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .withColumn("hx", md5(col("w")))
      .withColumn("reg", conv(substring(col("hx"), 1, 2), 16, 10)
        .cast("long"))
      .withColumn("v", conv(substring(col("hx"), 3, 6), 16, 10)
        .cast("long"))
      .withColumn("rho", when(col("v") === 0, lit(SubBits + 1))
        .otherwise(lit(SubBits + 1) - length(bin(col("v")))))
      .groupBy(col("reg")).agg(max(col("rho")).as("mr"))

  /** q94: per-source distinct-token cardinality — EXACT count next to
    * the HyperLogLog estimate from 256 one-byte registers; returns
    * (source, n_exact, hll_est, err_e4).
    *
    * The sketch: md5(w) supplies 8 register-index bits + 24 rank
    * bits; register value = max over tokens of (leading zeros of the
    * 24 rank bits) + 1; estimate = α·m²/Σ 2^(-M_j), computed in pure
    * integer arithmetic (Σ 2^(SubBits-M_j) ≤ 2^32, one integer
    * division at the end) so the engine and the DuckDB oracle agree
    * bit for bit. No small-range linear-counting correction: the
    * per-source vocabularies here sit far above the 5/2·m crossover,
    * and the raw estimator is the regime a corpus-scale distinct
    * count runs in anyway — err_e4 against the exact arm IS the
    * calibration evidence.
    *
    * 100 TB posture: the exact arm needs a full distinct shuffle of
    * (source, token) — that is the cost being escaped; the sketch arm
    * collapses map-side to ≤ m rows per source (register maxes are
    * associative, so partials merge like any algebraic aggregate —
    * the HLL mergeability contract as a Spark plan), and at scale you
    * keep ONLY that arm: one map-side-combined groupBy to S·m rows
    * regardless of corpus size, the same shape `approx_count_distinct`
    * plans internally (used here in open-coded form because the
    * estimate must be reproducible in the oracle engine). */
  def q94HllCalibration(s: SparkSession, dir: String): DataFrame = {
    // ONE distinct (source, token) pass feeds both arms (the exact
    // arm requires it; the sketch reads hash material post-distinct
    // so md5 runs once per distinct token, not per occurrence).
    val dw = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct()
      .localCheckpoint(false)
    val exact = dw.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    val regs = dw
      .withColumn("hx", md5(col("w")))
      .withColumn("reg", conv(substring(col("hx"), 1, 2), 16, 10)
        .cast("long"))
      .withColumn("v", conv(substring(col("hx"), 3, 6), 16, 10)
        .cast("long"))
      // rank = leading zeros of the 24-bit window + 1 = 25 - bitlen(v)
      .withColumn("rho", when(col("v") === 0, lit(SubBits + 1))
        .otherwise(lit(SubBits + 1) - length(bin(col("v")))))
      .groupBy(col("source"), col("reg")).agg(max(col("rho")).as("mr"))
    // rho = SubBits+1 (the all-zero rank window, p ≈ 16^-6 per
    // distinct token) would make the exponent NEGATIVE: Spark's Java
    // shift masking turns shiftleft(1, -1) into 1<<63 (huge negative,
    // silently corrupting the denominator) while DuckDB raises on a
    // negative shift — so BOTH engines clamp the exponent at 0,
    // truncating that register's true 2^-1 term to 2^0. The estimate
    // stays bit-for-bit identical across engines (the documented
    // contract); the truncation overstates the denominator by at most
    // 2^-1 out of ≥ 2^SubBits — below the estimator's own noise.
    val est = regs.groupBy(col("source"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), greatest($SubBits - mr, 0))"))
        .as("dp"), count(lit(1)).as("np"))
      // absent registers hold M=0 and contribute 2^SubBits each
      .withColumn("denom",
        col("dp") + (lit(Regs.toLong) - col("np")) * lit(1L << SubBits))
      .withColumn("hll_est", expr(s"$HllNum div (denom * 1000000)"))
    exact.join(est, "source")
      .select(col("source"), col("n_exact"), col("hll_est"),
        expr("(hll_est - n_exact) * 10000 div n_exact").as("err_e4"))
      .orderBy(col("source"))
  }

  val q94HllCalibrationOracle: String =
    s"""WITH dw AS (
       |  SELECT DISTINCT source, w FROM (
       |    SELECT source, unnest($tokensSql) AS w FROM documents)),
       |h AS (
       |  SELECT source, substring(md5(w), 1, 2) AS hx2,
       |    substring(md5(w), 3, 6) AS hx6
       |  FROM dw),
       |b AS (
       |  SELECT source,
       |    (${hexSql("hx2", 2)}) AS reg,
       |    (${hexSql("hx6", 6)}) AS v
       |  FROM h),
       |r AS (
       |  SELECT source, reg,
       |    max(CASE WHEN v = 0 THEN ${SubBits + 1}
       |        ELSE ${SubBits + 1} - length(bin(v)) END) AS mr
       |  FROM b GROUP BY source, reg),
       |d AS (
       |  SELECT source,
       |    CAST(sum(CAST(1 AS BIGINT) << greatest($SubBits - mr, 0)) AS BIGINT)
       |      + ($Regs - count(*)) * ${1L << SubBits} AS denom
       |  FROM r GROUP BY source),
       |e AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_exact
       |  FROM dw GROUP BY source)
       |SELECT e.source AS source, n_exact,
       |  CAST($HllNum // (denom * 1000000) AS BIGINT) AS hll_est,
       |  CAST(($HllNum // (denom * 1000000) - n_exact) * 10000
       |    // n_exact AS BIGINT) AS err_e4
       |FROM e JOIN d ON e.source = d.source
       |ORDER BY source""".stripMargin

  // ---- q95: Bloom-filter join pruning ------------------------------

  /** Bloom bitmap size in bits (2^12 → positions are one 3-hex-char
    * md5 window) and hash-function count. */
  val BloomBits = 4096
  val BloomK = 3

  /** q95: Bloom-filter semi-join pruning, calibrated — build a
    * [[BloomBits]]-bit, [[BloomK]]-hash Bloom filter over the
    * BUILDING-segment customer keys, probe every order through it,
    * and report the filter's verdict AGAINST the exact semi-join per
    * order status: (o_orderstatus, n_orders, n_pass_bloom, n_member,
    * n_false_pos, fpr_e6).
    *
    * This is the declarative twin of the runtime join-filter every
    * warehouse engine ships (Spark's InjectRuntimeFilter /
    * bloom_filter_agg): the filter is [[BloomBits]] bits = 64 BIGINT
    * words (512 bytes), built by one tiny dim-side job, collected to
    * the driver, and inlined as a LITERAL array the fact side probes
    * per row. The no-false-negative guarantee is structural (a
    * member's k positions are all set by construction); the query
    * MEASURES the false-positive rate next to ground truth, which is
    * the number a deployment tunes m/k against before trusting the
    * filter to cut a 100 TB shuffle.
    *
    * 100 TB posture: the build side is one distinct over k·|keys|
    * ints collapsing to ≤ m rows before the 512-byte collect (dim
    * side only — the collect never sees fact data). The fact side is
    * genuinely MAP-ONLY: per-row, [[BloomK]] md5 positions tested
    * against the literal bitmap inside whole-stage codegen — no row
    * expansion, no join for the probe, and the only shuffles ride on
    * ≤ |order statuses| partial-aggregate rows (the exact-arm
    * membership check is a broadcast hash join, also shuffle-free).
    * No data-scale shuffle anywhere. At cluster scale the same
    * bitmap feeds a scan-level IN-filter (DPP-style) so pruned row
    * groups are never read at all. */
  def q95BloomPrune(s: SparkSession, dir: String): DataFrame = {
    def pos(key: Column, j: Column): Column =
      conv(substring(md5(concat(j.cast("string"), lit(":"),
        key.cast("string"))), 1, 3), 16, 10).cast("long")

    val keys = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    // THE Bloom filter: distinct set bit positions, folded into 64
    // BIGINT words on the driver (the one eager job here, dim-side)
    val setPos = keys
      .select(col("k"), explode(sequence(lit(0), lit(BloomK - 1))).as("j"))
      .select(pos(col("k"), col("j")).as("pos")).distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](BloomBits / 64)
    setPos.foreach(p => words(p.toInt >> 6) |= (1L << (p.toInt & 63)))
    val bm = typedLit(words.toSeq)

    // bit test, all inside codegen: word = bm[pos div 64], then
    // (word >> (pos mod 64)) & 1
    def bitSet(p: Column): Column =
      call_function("shiftright",
        element_at(bm, (p - p.mod(lit(64L))).divide(lit(64L)).cast("int") + lit(1)),
        p.mod(lit(64L)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)

    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderstatus"))
      .withColumn("bloom_pass",
        (0 until BloomK).map(j => bitSet(pos(col("o_custkey"), lit(j))))
          .reduce(_ && _).cast("long"))
      .join(broadcast(keys.withColumn("m", lit(1L))
        .withColumnRenamed("k", "o_custkey")), Seq("o_custkey"), "left")
      .withColumn("is_member", coalesce(col("m"), lit(0L)))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("bloom_pass")).as("n_pass_bloom"),
        sum(col("is_member")).as("n_member"),
        sum(when(col("bloom_pass") === 1L && col("is_member") === 0L, 1L)
          .otherwise(0L)).as("n_false_pos"))
      .withColumn("fpr_e6",
        expr("n_false_pos * 1000000 div (n_orders - n_member)"))
      .orderBy(col("o_orderstatus"))
  }

  val q95BloomPruneOracle: String =
    s"""WITH keys AS (
       |  SELECT c_custkey AS k FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |bits AS (
       |  SELECT DISTINCT (${hexSql("hx3", 3)}) AS pos FROM (
       |    SELECT substring(md5(CAST(j AS VARCHAR) || ':'
       |      || CAST(k AS VARCHAR)), 1, 3) AS hx3
       |    FROM (SELECT k, unnest([${(0 until BloomK).mkString(", ")}])
       |          AS j FROM keys))),
       |pp AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus,
       |    (${hexSql("hx3", 3)}) AS pos FROM (
       |    SELECT o_orderkey, o_custkey, o_orderstatus,
       |      substring(md5(CAST(j AS VARCHAR) || ':'
       |        || CAST(o_custkey AS VARCHAR)), 1, 3) AS hx3
       |    FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
       |          unnest([${(0 until BloomK).mkString(", ")}]) AS j
       |          FROM orders))),
       |pb AS (
       |  SELECT o_orderkey, min(o_custkey) AS o_custkey,
       |    min(o_orderstatus) AS o_orderstatus,
       |    CASE WHEN count(b.pos) = $BloomK THEN 1 ELSE 0 END
       |      AS bloom_pass
       |  FROM pp LEFT JOIN bits b ON pp.pos = b.pos
       |  GROUP BY o_orderkey),
       |ex AS (
       |  SELECT pb.*,
       |    CASE WHEN k IS NULL THEN 0 ELSE 1 END AS is_member
       |  FROM pb LEFT JOIN keys ON pb.o_custkey = keys.k)
       |SELECT o_orderstatus, count(*) AS n_orders,
       |  CAST(sum(bloom_pass) AS BIGINT) AS n_pass_bloom,
       |  CAST(sum(is_member) AS BIGINT) AS n_member,
       |  CAST(sum(CASE WHEN bloom_pass = 1 AND is_member = 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       |  CAST(sum(CASE WHEN bloom_pass = 1 AND is_member = 0
       |    THEN 1 ELSE 0 END) * 1000000
       |    // (count(*) - sum(is_member)) AS BIGINT) AS fpr_e6
       |FROM ex GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

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

  // ---- q103: KMV (k-minimum-values) set-operation sketch -----------

  /** Sketch size: the k smallest hash values are kept per set. */
  val KmvK = 128
  /** Hex chars of md5 a KMV hash reads (48 bits — collision odds over
    * a corpus vocabulary are ~|V|²/2⁴⁹, and a collision is CONSISTENT
    * across engines anyway because both read the same digest). */
  val KmvHex = 12
  /** The hash space size 2^48 the k-th-minimum normalizes against. */
  val KmvSpace: Long = 1L << (4 * KmvHex)
  /** Scaled estimator numerator (k−1)·2^48 ≈ 3.6e16, inside BIGINT. */
  val KmvNum: Long = (KmvK - 1).toLong * KmvSpace

  /** q103: KMV distinct-count sketches with UNION/INTERSECTION
    * algebra, calibrated against exact set operations — per source
    * pair: (src_a, src_b, n_a, n_b, exact_inter, exact_union,
    * est_union, est_inter, err_union_e4).
    *
    * The k-minimum-values sketch (Bar-Yossef et al. 2002; the
    * Theta-sketch family, Dasgupta et al. 2016) keeps the [[KmvK]]
    * smallest 48-bit hash values of each set. Where MinHash (q89)
    * estimates only the Jaccard RATIO, KMV supports set-operation
    * CARDINALITIES: the union sketch of two sets is the k smallest
    * of the merged value lists with D̂(∪) = (k−1)·2⁴⁸/h₍k₎, and the
    * intersection estimate is ρ/k · D̂(∪) where ρ counts union-sketch
    * members present in both input sketches — the algebra behind
    * "distinct users in segment A ∩ B" questions answered from
    * per-segment sketches without rescanning 100 TB. A sketch
    * holding fewer than k values IS its set (small-set exact path,
    * both engines branch identically).
    *
    * 100 TB posture: ONE distinct (source, token) shuffle feeds both
    * arms (the exact arm — the cost being escaped — needs it
    * anyway); k-min selection runs on the distinct-HASH table
    * (vocabulary-scale, sublinear in corpus) via a per-source
    * window; everything pairwise operates on S sketch rows of ≤ k
    * longs each — S·(S−1)/2 constant-size array ops, a broadcast
    * BNLJ over ~500-byte rows (allow-listed; at deployment scale the
    * sketch table IS the artifact you persist, and pair queries
    * never touch the corpus). Exactness: pure integer arithmetic
    * (48-bit hash decode, one `div` per estimate) — bit-identical in
    * DuckDB. */
  def q103KmvOverlap(s: SparkSession, dir: String): DataFrame = {
    // distinct (source, token) → distinct (source, 48-bit hash):
    // vocabulary-scale after the one corpus-scale distinct
    val hh = Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .distinct()
      .select(col("source"),
        conv(substring(md5(col("w")), 1, KmvHex), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .localCheckpoint(false)
    val kmin = hh
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= KmvK)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    val counts = hh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = hh.as("a")
      .join(hh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val sk = kmin.join(counts, "source")
    sk.select(col("source").as("src_a"), col("hs").as("ha"),
        col("n").as("n_a"))
      .join(broadcast(sk.select(col("source").as("src_b"),
        col("hs").as("hb"), col("n").as("n_b"))),
        col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union",
        col("n_a") + col("n_b") - col("exact_inter"))
      .withColumn("u", array_sort(array_distinct(
        concat(col("ha"), col("hb")))))
      .withColumn("est_union",
        when(size(col("u")) <= KmvK, size(col("u")).cast("long"))
          .otherwise(expr(s"$KmvNum div element_at(u, $KmvK)")))
      .withColumn("rho",
        size(array_intersect(slice(col("u"), 1, KmvK),
          array_intersect(col("ha"), col("hb")))).cast("long"))
      .withColumn("est_inter",
        when(size(col("u")) <= KmvK,
          size(array_intersect(col("ha"), col("hb"))).cast("long"))
          .otherwise(expr(s"rho * est_union div $KmvK")))
      .withColumn("err_union_e4",
        expr("(est_union - exact_union) * 10000 div exact_union"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("exact_inter"), col("exact_union"), col("est_union"),
        col("est_inter"), col("err_union_e4"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val q103KmvOverlapOracle: String =
    s"""WITH dw AS (
       |  SELECT DISTINCT source, w FROM (
       |    SELECT source, unnest($tokensSql) AS w FROM documents)),
       |hh AS (
       |  SELECT DISTINCT source, (${hexSql("hx", KmvHex)}) AS h FROM (
       |    SELECT source, substring(md5(w), 1, $KmvHex) AS hx FROM dw)),
       |kmin AS (
       |  SELECT source, list_sort(list(h)) AS hs FROM (
       |    SELECT source, h, row_number() OVER (
       |      PARTITION BY source ORDER BY h) AS rn FROM hh)
       |  WHERE rn <= $KmvK GROUP BY source),
       |cnt AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n
       |  FROM hh GROUP BY source),
       |inter AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    CAST(count(*) AS BIGINT) AS exact_inter
       |  FROM hh a JOIN hh b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2),
       |sk AS (
       |  SELECT kmin.source AS source, hs, n
       |  FROM kmin JOIN cnt ON kmin.source = cnt.source),
       |calc AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    a.n AS n_a, b.n AS n_b,
       |    coalesce(exact_inter, 0) AS exact_inter,
       |    a.n + b.n - coalesce(exact_inter, 0) AS exact_union,
       |    list_sort(list_distinct(a.hs || b.hs)) AS u,
       |    a.hs AS ha, b.hs AS hb
       |  FROM sk a JOIN sk b ON a.source < b.source
       |  LEFT JOIN inter
       |    ON inter.src_a = a.source AND inter.src_b = b.source),
       |est AS (
       |  SELECT src_a, src_b, n_a, n_b, exact_inter, exact_union,
       |    CASE WHEN len(u) <= $KmvK THEN CAST(len(u) AS BIGINT)
       |         ELSE CAST($KmvNum // u[$KmvK] AS BIGINT) END AS est_union,
       |    u, ha, hb
       |  FROM calc)
       |SELECT src_a, src_b, n_a, n_b, exact_inter, exact_union,
       |  est_union,
       |  CASE WHEN len(u) <= $KmvK
       |       THEN CAST(len(list_intersect(ha, hb)) AS BIGINT)
       |       ELSE CAST(CAST(len(list_intersect(u[1:$KmvK],
       |         list_intersect(ha, hb))) AS BIGINT)
       |         * est_union // $KmvK AS BIGINT) END AS est_inter,
       |  CAST((est_union - exact_union) * 10000 // exact_union
       |    AS BIGINT) AS err_union_e4
       |FROM est ORDER BY src_a, src_b""".stripMargin
  // ---- q135: Misra–Gries heavy hitters -------------------------------

  /** Counter budget k for the Misra–Gries summaries: any token with
    * frequency > N/k is GUARANTEED to survive every partition's
    * summary (Misra & Gries 1982; mergeability Agarwal et al.
    * PODS'12). 64 counters ⇒ the report lists every token above
    * ~1.6% of the corpus token stream. */
  val MgK = 64

  /** Misra–Gries digest of one iterator: at most [[MgK]] counters;
    * an arrival with no counter and a full table decrements ALL
    * counters (dropping zeros) instead of being stored. Exposed for
    * the spec. */
  private[operators] def mgCandidates(
      it: Iterator[String]): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < MgK => m.update(t, 1L)
        case None =>
          val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
          m.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(m.remove)
      }
    }
    m.keysIterator
  }

  /** q135: heavy hitters via per-partition Misra–Gries summaries —
    * the O(k)-state alternative to a corpus-wide groupBy when only
    * the heavy tail matters. Each partition keeps [[MgK]] counters;
    * the candidate UNION across partitions provably contains every
    * token with global count > N/[[MgK]] (if freq_p ≤ n_p/k in every
    * partition then Σfreq ≤ N/k — the averaging argument), so the
    * gated output — candidates re-counted exactly and filtered on
    * cnt·k > N — is EXACTLY the true heavy-hitter set regardless of
    * partitioning. That partition-independence is what makes a
    * sketch whose internal state is arrival-order-dependent safe to
    * oracle-gate bit-for-bit (the q94/q91 calibration discipline:
    * publish only the order-free claim the sketch proves).
    *
    * Scale shape: the summary pass is mapPartitions with O(k) state
    * and k-row output per partition — no shuffle at all; the exact
    * arm re-counts ONLY the ≤ k·P candidate tokens behind a
    * broadcast semi-join (the shuffle carries candidate tokens
    * only, never the token universe); the total is a 1-row
    * aggregate. Three scans, zero corpus-scale exchanges — the
    * inverse trade of q113's exact-NDV profiler. */
  def q135HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.spread(Tables.load(s, dir, "documents"))
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cands = toks.as[String]
      .mapPartitions(mgCandidates)
      .toDF("tok").distinct()
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(broadcast(cands), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(MgK.toLong) > col("n_total"))
      .select(col("tok"), col("cnt"), col("n_total"),
        expr("CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000 div n_total" +
          " AS BIGINT)").as("share_ppm"))
      .orderBy(col("cnt").desc, col("tok").asc)
  }

  val q135HeavyHittersOracle: String =
    s"""WITH tok AS (
       |  SELECT unnest($tokensSql) AS tok FROM documents),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
       |cnts AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
       |  FROM tok GROUP BY tok)
       |SELECT c.tok, c.cnt, t.n_total,
       |  CAST(CAST(c.cnt AS HUGEINT) * 1000000 // t.n_total
       |    AS BIGINT) AS share_ppm
       |FROM cnts c CROSS JOIN tot t
       |WHERE c.cnt * $MgK > t.n_total
       |ORDER BY c.cnt DESC, c.tok""".stripMargin
}
