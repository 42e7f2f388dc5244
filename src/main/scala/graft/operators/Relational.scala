package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The generalized relational operator surface (SURVEY.md §2.2): scans,
  * filters, projection, joins, aggregation, windows, sorts/limits, set
  * ops — each a thin declarative DataFrame program so Catalyst does
  * pushdown/pruning/join-selection and Tungsten does codegen.
  *
  * Determinism contract with the DuckDB oracle: money aggregates are
  * summed as per-row-rounded integer cents (`cents`) — bit-exact in any
  * summation order, unlike summing raw doubles — and every output column
  * is explicitly aliased + typed to match the oracle SQL.
  */
object Relational {

  /** Per-row money → integer cents. round() is HALF_UP in Spark and
    * round-half-away-from-zero in DuckDB: identical on the same IEEE
    * double input, so the bigint is identical in both engines. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** q1: TPC-H Q1-style pricing summary — groupBy agg with partial
    * (map-side) aggregation; only 4 columns are read from the scan. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        sum(cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))))
          .as("revenue_cents"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2: filter + projection — predicate and column pruning must reach
    * the parquet scan (PushedFilters in explain). */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_discount") > lit(0.05) && col("l_quantity") < lit(25))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).as("price_cents"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q3: multi-way join + agg — revenue per nation. The dimension
    * chain (nation ⋈ customer) is tiny relative to fact tables, so
    * both dims are explicitly broadcast: the only shuffle left is the
    * lineitem⋈orders join + final agg. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))))
          .as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** q4: top-k — top 10 customers by order revenue (agg → sort →
    * limit; Spark plans TakeOrderedAndProject, no full sort). */
  def q4TopK(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("spend_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("spend_cents").desc, col("o_custkey").asc)
      .limit(10)
  }

  /** q5: window function — rank each customer's 3 biggest orders.
    * One shuffle on the window partition key. */
  def q5Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** q6: semi join — customers that have at least one 1995 order
    * (EXISTS). left_semi never widens rows, so no dedup needed. */
  def q6SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(year(col("o_orderdate")) === 1995)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q7: anti join — customers with no high-value order
    * (NOT EXISTS over a filtered fact side). */
  def q7AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q8: set ops — ((1995∩1996)\1997) ∪ (2001\1995) of active
    * customers; exercises intersect/except/union. */
  def q8SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def active(y: Int): DataFrame =
      o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey")).distinct()
    active(1995).intersect(active(1996))
      .except(active(1997))
      .union(active(2001).except(active(1995)))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  /** q9: grouped agg with HAVING + conditional aggregation. */
  def q9Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("n_finished"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .filter(col("n_orders") > 10)
      .orderBy(col("o_orderpriority"))

  /** q10: scalar functions — string/date expression zoo on part,
    * all codegen'd built-ins (no UDFs). */
  def q10Scalar(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        (col("p_size") % 7).as("size_mod"),
        abs(cents(col("p_retailprice")) - 100000L).as("price_dist_cents"))
      .orderBy(col("p_partkey"))

  /** q11: events tumbling-window aggregation (batch form of the
    * streaming query in graft.streaming): per-hour, per-type counts
    * and value sums. */
  def q11EventsWindow(s: SparkSession, dir: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    // read as a timestamp; Tables.load surfaces it as raw nanos and
    // bucket with integer arithmetic — output is epoch seconds
    // (bigint), which also sidesteps any ns-vs-µs comparison issue
    // with the DuckDB oracle.
    // integer `div`, not `/`: epoch-nanos (~1.7e18) exceeds double's
    // 53-bit mantissa, so float division would misbucket edge rows
    t(s, dir, "events")
      .groupBy((expr("ts div 3600000000000") * 3600L).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** q12: correlated-style aggregation — orders above their customer's
    * average order value (join against a pre-aggregated subquery). The
    * per-customer aggregate is computed once and re-joined; Catalyst
    * broadcasts it when small. */
  def q12AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val avgs = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("sum_cents"),
        count(lit(1)).as("n"))
    // price > 2*avg, in exact integer arithmetic: cents*n > 2*sum_cents
    // (a double avg would differ between engines in the last ulp)
    o.join(avgs, o("o_custkey") === avgs("ac_custkey"))
      .filter(cents(col("o_totalprice")) * col("n") >
        lit(2L) * col("sum_cents"))
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** q13: left outer join with an aggregated right side — parts and
    * their cheap-lineitem stats, null-preserved for parts with none. */
  def q13OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_bulk"),
        sum(col("l_quantity")).cast("long").as("bulk_qty"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_outer")
      .select(col("p_partkey"), col("p_brand"),
        coalesce(col("n_bulk"), lit(0L)).as("n_bulk"),
        col("bulk_qty")) // stays null when no bulk lineitems
      .orderBy(col("p_partkey"))
  }

  /** q14: rollup — nation/mktsegment customer counts with subtotal and
    * grand-total rows (multi-level aggregate in one pass). */
  def q14Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(cents(col("c_acctbal"))).as("acctbal_cents"))
      .orderBy(col("n_name").asc_nulls_first,
        col("c_mktsegment").asc_nulls_first)
  }

  /** q15: sorted string aggregation — per-region alphabetized nation
    * roster (collect_list is unordered by contract, so sort in-array
    * before joining: deterministic in any partitioning). */
  def q15StringAgg(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))
  }

  /** q16: correlated scalar subquery via the SQL entry point —
    * Catalyst decorrelates it into a join. */
  def q16SqlSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey
        |     AND o_totalprice > 200000) AS n_big_orders
        |FROM customer
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q17: full outer join of two yearly activity aggregates —
    * customers active in either 1995 or 2001. */
  def q17FullOuter(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def yearAgg(y: Int, cnt: String, key: String): DataFrame =
      o.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(key))
        .agg(count(lit(1)).as(cnt))
    val a = yearAgg(1995, "n_1995", "k95")
    val b = yearAgg(2001, "n_2001", "k01")
    a.join(b, a("k95") === b("k01"), "full_outer")
      .select(coalesce(col("k95"), col("k01")).as("o_custkey"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"),
        coalesce(col("n_2001"), lit(0L)).as("n_2001"))
      .orderBy(col("o_custkey"))
  }

  /** q18: exact percentiles — median/p90 order value per priority.
    * Inputs are integer cents, and both engines use the same type-7
    * linear interpolation, so the doubles are bit-identical. */
  def q18Percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile(cents(col("o_totalprice")), lit(0.5)).as("median_cents"),
        percentile(cents(col("o_totalprice")), lit(0.9)).as("p90_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** q20: skew-safe two-phase aggregation — per-user event totals
    * computed through an explicit salt: phase 1 aggregates
    * (user, salt) partials, phase 2 merges per user. On a skewed key
    * distribution the hot key's rows spread over `Salt` reducers in
    * phase 1 instead of one straggler. The oracle is the PLAIN
    * GROUP BY — the salted plan must be result-identical, which is
    * exactly the property that makes the technique safe to apply. */
  def q20SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val Salt = 8
    val partial = t(s, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(Salt)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(cents(col("value"))).as("pv"))
    partial.groupBy(col("user_id"))
      .agg(sum(col("pn")).cast("long").as("n_events"),
        sum(col("pv")).as("value_cents"))
      .orderBy(col("user_id"))
  }

  /** q23: window frames — per-customer running order total and moving
    * 3-order average (ROWS BETWEEN frames; integer cents keep the
    * running sums engine-exact, the moving average is one fp division
    * on identical operands). */
  def q23RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .withColumn("cents", cents(col("o_totalprice")))
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("cents"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_cents"),
        // explicit floor: DuckDB's double→bigint cast rounds while
        // Spark's truncates — floor() agrees bit-for-bit in both
        floor(sum(col("cents")).over(w.rowsBetween(-2, 0)).cast("double") /
          count(lit(1)).over(w.rowsBetween(-2, 0)))
          .cast("long").as("moving3_cents"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q24: window navigation — days since the customer's previous order
    * (lag), computed on epoch days so the arithmetic is integer-exact. */
  def q24Lag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("epoch_day", expr("unix_timestamp(o_orderdate) div 86400"))
      .select(col("o_custkey"), col("o_orderkey"),
        (col("epoch_day") - lag(col("epoch_day"), 1).over(w))
          .as("days_since_prev"))
      .filter(col("days_since_prev").isNotNull)
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q25: ranking-function family — rank, dense_rank, ntile,
    * percent_rank, cume_dist over per-nation account balances. All
    * integer-derived except percent_rank/cume_dist, which are single
    * exact divisions of identical integers in both engines. */
  def q25RankFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(cents(col("c_acctbal")).desc, col("c_custkey").asc)
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey"), col("c_nationkey").cast("int").as("nation"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prk"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_custkey"))
  }

  /** q26: array-function zoo over milli-quantized embeddings — size,
    * contains, element access, slice, min/max, sort head. */
  def q26ArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val v = Similarity.ivec(col("embedding"))
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 50)
      .select(
        col("vec_id"),
        size(v).cast("long").as("dim"),
        element_at(v, 1).as("first_milli"),
        array_max(v).as("max_milli"),
        array_min(v).as("min_milli"),
        array_contains(v, 0L).cast("int").as("has_zero"),
        aggregate(slice(v, 1, 8), lit(0L), (a, x) => a + x)
          .as("head8_sum"),
        element_at(array_sort(v), 32).as("median_lo_milli"))
      .orderBy(col("vec_id"))
  }

  /** q27: JSON functions — extract the `k` field from the events
    * `props` JSON strings and aggregate it. */
  def q27JsonFuncs(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** q28: per-group top-k via the typed `TopKAggregator` — the bounded
    * partial buffers shuffle O(groups×k) instead of O(rows). The
    * oracle is the window row_number formulation, so the custom
    * aggregator is itself correctness-gated against DuckDB. */
  def q28TopKAgg(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(3))
    t(s, dir, "orders")
      .withColumn("cents", cents(col("o_totalprice")))
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_orderkey"), col("cents")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("rk0", "s")))
      .select(col("o_custkey"), (col("rk0") + 1).cast("int").as("rk"),
        col("s.id").as("o_orderkey"), col("s.score").as("price_cents"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** q22: sketch aggregates — approximate distinct counts (HLL++) and
    * approximate quantiles per return flag, each paired with its exact
    * counterpart and an in-query error-bound assertion. The sketch
    * estimates themselves are engine-specific (and a quantile sketch's
    * merge order isn't even guaranteed stable run-to-run), so the
    * OUTPUT is the exact values plus 0/1 within-bound flags: fully
    * deterministic, hence hash-checkable against DuckDB — and if a
    * sketch ever violated its published error bound the flag would
    * flip and the oracle would catch it. Bounds: 3σ for the default
    * HLL++ rsd 0.05, 4σ for rsd 0.01, rank ±2% for the approximate
    * median (accuracy 1000 ⇒ rank error ≤ 0.1%). At 100 TB the
    * sketches are the forms that keep distinct-count state O(1) per
    * group.
    *
    * Plan shape: the exact distinct counts are a SEPARATE aggregation
    * from every sketch/percentile buffer, broadcast-joined on the
    * 3-row results. Fusing them is a scale-killer: Catalyst's
    * distinct-aggregate rewrite Expands every row once per distinct
    * group and keys the first aggregation stage on (l_returnflag ×
    * distinct value) — which instantiates the non-distinct aggregates'
    * buffers (a ~10 KB HLL++ sketch each, or an exact-percentile
    * value→count map) PER FINE-GRAINED GROUP: hundreds of thousands of
    * multi-KB buffers serialized through the shuffle (measured 15-50×
    * slower at sf0.1, O(distinct values × sketch size) state at
    * scale). Split, the Expand side carries only Long counters, and
    * all sketch/percentile buffers live in one no-Expand aggregation
    * with exactly one buffer per flag — the three exact quantiles
    * share a single buffer via the array form. */
  def q22Approx(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("pc", cents(col("l_extendedprice")))
    // both countDistincts ride ONE scan: the distinct rewrite's Expand
    // doubles rows through the shuffle, but Long counters are the only
    // per-group state (the q22 lesson bans multi-KB buffers here, not
    // counters) — measured equal to split single-distinct aggs
    // locally, and one scan beats two at 100 TB
    val counts = li
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
    val pcts = li
      .groupBy(col("l_returnflag").as("p_flag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("a_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("a_parts"),
        percentile_approx(col("pc"), lit(0.5), lit(1000)).as("a_median"),
        expr("percentile(pc, array(0.48, 0.5, 0.52))").as("pctl"),
        count(lit(1)).as("n"))
      .select(col("p_flag"), col("a_orders"), col("a_parts"),
        col("a_median"), col("n"),
        col("pctl").getItem(0).as("p48"),
        col("pctl").getItem(1).as("median_cents"),
        col("pctl").getItem(2).as("p52"))
    counts.join(broadcast(pcts), col("l_returnflag") === col("p_flag"))
      .select(col("l_returnflag"),
        col("exact_orders"), col("exact_parts"), col("median_cents"),
        col("n"),
        (abs(col("a_orders") - col("exact_orders"))
          <= col("exact_orders") * 0.15).cast("int").as("ok_orders"),
        (abs(col("a_parts") - col("exact_parts"))
          <= col("exact_parts") * 0.04).cast("int").as("ok_parts"),
        (col("a_median") >= floor(col("p48")) &&
          col("a_median") <= ceil(col("p52"))).cast("int").as("ok_median"))
      .orderBy(col("l_returnflag"))
  }

  val q22ApproxOracle: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)
      |    AS median_cents,
      |  count(*) AS n,
      |  1 AS ok_orders, 1 AS ok_parts, 1 AS ok_median
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q19: pivot — customer counts per nation × market segment, one
    * column per segment (conditional aggregation under the hood). */
  def q19Pivot(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .select(col("n_name") +: segs.map(g =>
        coalesce(col(g), lit(0L)).as(g.toLowerCase)): _*)
      .orderBy(col("n_name"))
  }
}
