package graft.storage

import org.apache.spark.sql.SparkSession

/** Canonical store: one directory per model, hash-bucketed by primary
  * key into `_bucket=N` subdirectories.
  *
  * Replaces gus's single-file JSON store (whole-file read + whole-file
  * rewrite per request, `json/mod.rs:45-80`) with a layout where a
  * point read touches exactly one bucket directory (no partition
  * discovery over the rest) and a point write rewrites one bucket
  * atomically (write-temp-then-swap). With B buckets, point ops are
  * O(|table|/B); at cluster scale B is sized so a bucket fits in one
  * executor's working set. Layout and atomicity live in
  * [[BucketedFileBackend]]; this binds the parquet format.
  */
final class ParquetBackend(spark: SparkSession, root: String,
    buckets: Int = 64)
  extends BucketedFileBackend(spark, root, buckets, "parquet", ".parquet")
