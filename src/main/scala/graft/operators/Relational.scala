package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
