package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * One parquet file per table under an `sfDir` such as
  * `/root/testdata/sf0.01`. Loading is a plain `spark.read.parquet` so
  * Catalyst sees a relation it can push filters/projections into; no
  * caching here — callers decide (a 100 TB table must never be
  * `.cache()`d wholesale).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table; `events.ts` is normalized to epoch-NANOS BIGINT
    * regardless of the parquet physical type. The corpus has shipped
    * both TIMESTAMP(NANOS) (read as raw nanos via the legacy conf)
    * and TIMESTAMP(MICROS) (read as timestamp_ntz); every downstream
    * operator and every DuckDB oracle (`epoch_ns(ts)`) works in
    * integer nanos, so the type seam is closed HERE and nowhere
    * else. The cast is per-row codegen'd arithmetic under the UTC
    * session timezone — no data-scale cost, pushdown-neutral. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions
          .expr("unix_micros(cast(ts as timestamp)) * 1000"))
    else df
  }

  /** Spread a narrow scan across the session's cores before heavy
    * per-row work (hash kernels, shingling, explode, partial
    * aggregation). The bench corpora are single-row-group parquet
    * files, which Spark cannot split — every map-side stage otherwise
    * runs as ONE task regardless of `local[32]`. A real 100 TB corpus
    * has thousands of row groups, and then this is a NO-OP: the
    * exchange is only inserted when the planned scan has fewer input
    * partitions than the session's parallelism, so it never adds a
    * full-corpus shuffle at scale. Call it AFTER pushable filters so
    * predicate/column pushdown still reaches the scan below the
    * exchange. Do NOT spread a scan that feeds straight into a join
    * shuffle or a collapsing partial aggregate — there the only
    * below-shuffle work is decode+serialize, and the extra exchange
    * re-pays the full row volume for nothing (measured 2× slower on
    * the TPC-H aggregates). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register every table as a temp view (for spark.sql entry
    * points); events.ts arrives already normalized by [[load]]. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
  }
}
