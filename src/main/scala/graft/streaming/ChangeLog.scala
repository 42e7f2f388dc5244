package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.core.ModelDefinition
import graft.crud.Records
import graft.crud.Records.Record

/** CRUD change-log: the storage-side half of GraphQL subscriptions.
  *
  * Every successful create/update/delete appends one row
  * (model, op, pk JSON, record JSON, seq) to an append-only parquet
  * directory; `subscribe(model)` is a Structured Streaming source over
  * it. This is the Spark realization of the subscription surface the
  * reference stubs out (`graphql.rs:193,251-253,353`): a changelog
  * topic per store, consumed with `readStream`.
  */
final class ChangeLog(spark: SparkSession, dir: String) {

  private val schema = StructType(Seq(
    StructField("model", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("pk", StringType, nullable = false),
    StructField("record", StringType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)
  Files.createDirectories(Paths.get(dir))

  /** Append one change event (called under the engine's per-model
    * write lock, so appends are ordered per model). */
  def append(m: ModelDefinition, op: String, rec: Record): Unit = {
    val pkJson = Records.valueJson(rec(m.primaryKey))
    val row = Row(m.modelName.pluralCamel, op, pkJson,
      Records.toJson(rec, m), seq.incrementAndGet())
    spark.createDataFrame(java.util.List.of(row), schema)
      .write.mode(SaveMode.Append).parquet(dir)
  }

  /** Streaming view of one model's changes. */
  def subscribe(m: ModelDefinition): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .filter(col("model") === m.modelName.pluralCamel)

  /** Batch view (for catch-up reads). */
  def all(): DataFrame = spark.read.schema(schema).parquet(dir)
}
