package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{ModelDefinition, PrimValue}

/** Backend SPI — the Spark-side equivalent of gus's `StorageHandler`
  * trait (`storage_handler.rs:49-54`), generalized from row ops to
  * DataFrame slices so implementations can bound the I/O of point
  * operations.
  *
  * A *slice* for pk value `v` is any DataFrame guaranteed to contain
  * the record with pk `v` iff it exists. A whole-table backend returns
  * the full table; a bucketed backend returns one hash bucket —
  * `O(table/buckets)` I/O per point op instead of `O(table)`, which is
  * the difference between usable and unusable at 100 TB.
  */
trait StorageBackend {
  /** Full table scan; empty DataFrame with the model schema if the
    * model has no data yet (`read_db` missing-file semantics,
    * `json/mod.rs:45-72`). */
  def table(model: ModelDefinition): DataFrame

  /** Minimal DataFrame guaranteed to contain pk=`v` if present. */
  def slice(model: ModelDefinition, v: PrimValue): DataFrame

  /** Replace the slice that `v` maps to with `df` (atomically). */
  def writeSlice(model: ModelDefinition, v: PrimValue, df: DataFrame): Unit

  /** Replace the whole table (used by bulk loads). */
  def overwrite(model: ModelDefinition, df: DataFrame): Unit
}

object StorageBackend {
  /** Deterministic pk → bucket hash, computable both driver-side (on a
    * typed literal) and executor-side (in a UDF). JVM value hashCodes
    * for Long/String/Boolean/Double are stable across JVMs. */
  def bucketOf(raw: Any, buckets: Int): Int = {
    val h = raw match {
      case l: Long => java.lang.Long.hashCode(l)
      case s: String => s.hashCode
      case b: Boolean => java.lang.Boolean.hashCode(b)
      case d: Double => java.lang.Double.hashCode(d)
      case i: Int => java.lang.Long.hashCode(i.toLong)
      case other => other.hashCode
    }
    Math.floorMod(h, buckets)
  }

  def empty(spark: SparkSession, model: ModelDefinition): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), model.schema)
}
