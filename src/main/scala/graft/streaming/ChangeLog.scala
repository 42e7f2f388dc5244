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

  Files.createDirectories(Paths.get(dir))

  // Resume the sequence from what a previous process persisted — a
  // fresh AtomicLong(0) would REUSE seq numbers after a restart, so a
  // client reconnecting with Last-Event-ID = n would silently skip
  // every post-restart event numbered ≤ n (ServerSpec pins the
  // restart/resume cycle).
  private val seq = new java.util.concurrent.atomic.AtomicLong({
    val m = all().agg(org.apache.spark.sql.functions.max(col("seq"))).head.get(0)
    if (m == null) 0L else m.asInstanceOf[Long]
  })

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

  // ---- poller snapshot cache ---------------------------------------
  // SSE subscribers poll every 500 ms; without a cache each poll of
  // each subscriber runs a full Spark collect() even when nothing
  // changed — many idle subscribers become continuous Spark jobs. The
  // in-memory `seq` counter already knows whether an append happened,
  // so idle polls compare two longs and touch Spark not at all; at
  // most ONE collect runs per sequence advance regardless of how many
  // subscribers are connected.
  @volatile private var cachedRows: Array[Row] = Array.empty
  @volatile private var cachedSeq: Long = -1L

  /** All events with seq > lastSeq, ascending — served from the cached
    * snapshot, which is refreshed only when an append has advanced the
    * sequence since the last collect. The initial refresh (cachedSeq
    * = -1) also loads any events persisted by a previous process, so
    * catch-up-from-0 semantics are unchanged. */
  def eventsSince(lastSeq: Long): Array[Row] = {
    val cur = seq.get()
    if (cur > cachedSeq) synchronized {
      if (cur > cachedSeq) {
        cachedRows = all().orderBy(col("seq")).collect()
        cachedSeq = cur
      }
    }
    cachedRows.filter(_.getAs[Long]("seq") > lastSeq)
  }
}
