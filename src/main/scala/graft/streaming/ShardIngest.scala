package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Shards

/** Streaming twin of the q171/q172 shard layout — [[DocIngest]]'s
  * at-ingest shape carried to the training-shard assignment: curated
  * documents land in batches and each batch extends the shard layout
  * WITHOUT touching any shipped shard. Carried state is ONE tail
  * tuple per bucket (cumulative tokens, open-shard seq, the open
  * shard's start offset and member count) — O([[Shards.ShardBuckets]])
  * longs forever, the mergeable-summary discipline of the other
  * streaming twins.
  *
  * Contract with the batch operator (ShardIngestSpec cross-gates
  * both): documents fed in q171's own deterministic order — by
  * (md5('shard:'||doc_id), doc_id) — produce BIT-IDENTICAL
  * (shard_id, position, doc_id, n_tokens, token_offset) rows to
  * `Shards.q171ShardLayout`, however the stream is cut into
  * micro-batches (batch boundaries never change an assignment:
  * the per-bucket running token count is the only coupling, and it
  * is exactly the carried state). Fed in ARRIVAL order instead, the
  * layout differs from the batch shuffle (an incremental assigner
  * cannot re-sort history — the standard trade) but every
  * conservation property still holds: each doc exactly once,
  * positions contiguous per shard, offsets the member-token prefix
  * sums, shards size-bounded by budget + one overflow doc.
  *
  * Restart safety (the PhashIngest recipe): assignment writes are
  * idempotent (each micro-batch overwrites its own `batch_id=`
  * partition) and the per-bucket tail state is rebuilt on start from
  * the durable assignments alone — cum = Σ n_tokens per bucket, the
  * open shard is the bucket's max seq, its member count is that
  * shard's max position + 1, and its start offset is cum minus the
  * open shard's own token span (all derivable from stored columns).
  *
  * Scale posture: per batch, one window pair on (bucket) then
  * (bucket, seq) over BATCH-grain rows plus a broadcast join of the
  * [[Shards.ShardBuckets]]-row state table; the per-bucket state
  * aggregate collected to the driver is buckets-bounded. Nothing
  * rescans prior batches; shipped shards are immutable. */
object ShardIngest {

  /** Landing-file schema: curated doc-grain rows (the q84 survivor
    * shape — id, language, token count; text never rides ingest). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_tokens", LongType)))

  /** Per-bucket tail: cumulative bucket tokens, the open shard's
    * seq (−1 = none yet), its first token's bucket offset, and its
    * current member count. */
  final case class BucketTail(cum: Long, seqOpen: Long,
      shardStart: Long, docsIn: Long)

  /** Assign one micro-batch against the carried state; returns the
    * assignment rows (shard_id, position, doc_id, lang, n_tokens,
    * token_offset) and the advanced state. Intra-batch order is
    * q171's own (md5 key, doc_id) — deterministic under retry. */
  private[graft] def assignBatch(spark: SparkSession,
      state: Map[Long, BucketTail], batch: DataFrame)
      : (DataFrame, Map[Long, BucketTail]) = {
    import spark.implicits._
    val st = state.toSeq
      .map { case (b, t) => (b, t.cum, t.seqOpen, t.shardStart, t.docsIn) }
      .toDF("bucket", "cum0", "seq_open", "shard_start0", "docs_in0")
    val keyed = batch
      .withColumn("k",
        md5(concat(lit("shard:"), col("doc_id").cast("string"))))
      .withColumn("bucket",
        expr(s"CAST(conv(substring(k, 1, 2), 16, 10) AS BIGINT)" +
          s" % ${Shards.ShardBuckets}"))
      .join(broadcast(st), Seq("bucket"), "left")
      .na.fill(0L, Seq("cum0", "shard_start0", "docs_in0"))
      .na.fill(-1L, Seq("seq_open"))
    val wCum = Window.partitionBy(col("bucket"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = keyed
      .withColumn("start",
        col("cum0") + sum(col("n_tokens")).over(wCum) - col("n_tokens"))
      .withColumn("seq", expr(s"start div ${Shards.ShardTokens}"))
    val wOrd = Window.partitionBy(col("bucket"), col("seq"))
      .orderBy(col("k"), col("doc_id"))
    val wShard = Window.partitionBy(col("bucket"), col("seq"))
    val asn = packed
      .withColumn("pos_intra", (row_number().over(wOrd) - 1).cast("long"))
      .withColumn("min_start", min(col("start")).over(wShard))
      // the batch's first group may CONTINUE the open shard: its
      // positions and offsets then carry the state's tail forward
      .withColumn("position",
        when(col("seq") === col("seq_open"),
          col("pos_intra") + col("docs_in0")).otherwise(col("pos_intra")))
      .withColumn("shard_start",
        when(col("seq") === col("seq_open"), col("shard_start0"))
          .otherwise(col("min_start")))
      .withColumn("token_offset", col("start") - col("shard_start"))
      .withColumn("shard_id",
        col("bucket") * lit(Shards.ShardIdBase) + col("seq"))
      .localCheckpoint(true) // read twice: output + the state fold
    val out = asn.select(col("shard_id"), col("position"), col("doc_id"),
      col("lang"), col("n_tokens"), col("token_offset"))
      .orderBy(col("shard_id"), col("position"))
    // advance the touched buckets' tails (buckets-bounded collect).
    // struct-max, not max_by: max_by's ordering key (seq) ties across
    // every row of the open shard, and its tie pick is unspecified —
    // the struct orders by (seq, position) and is exact
    val advanced = asn.groupBy(col("bucket"))
      .agg(max(col("start") + col("n_tokens")).as("cum"),
        max(struct(col("seq"), col("position"))).as("op"),
        max(struct(col("seq"), col("shard_start"))).as("os"))
      .select(col("bucket"), col("cum"), col("op.seq").as("seq_open"),
        col("os.shard_start").as("shard_start"),
        (col("op.position") + 1).as("docs_in"))
      .collect()
      .map(r => r.getLong(0) ->
        BucketTail(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    (out, state ++ advanced)
  }

  /** Rebuild the per-bucket tail state from durable assignments (the
    * restart path — see object scaladoc). */
  private[graft] def recoverState(assigned: DataFrame)
      : Map[Long, BucketTail] = {
    val wB = Window.partitionBy(col("bucket"))
    assigned
      .withColumn("bucket", expr(s"shard_id div ${Shards.ShardIdBase}"))
      .withColumn("seq", expr(s"shard_id % ${Shards.ShardIdBase}"))
      .withColumn("cum", sum(col("n_tokens")).over(wB))
      .withColumn("open", max(col("seq")).over(wB))
      .filter(col("seq") === col("open"))
      .groupBy(col("bucket"))
      .agg(max(col("cum")).as("cum"), max(col("seq")).as("seq_open"),
        (max(col("position")) + 1).as("docs_in"),
        max(col("token_offset") + col("n_tokens")).as("open_span"))
      .collect()
      .map(r => r.getLong(0) -> BucketTail(r.getLong(1), r.getLong(2),
        r.getLong(1) - r.getLong(4), r.getLong(3)))
      .toMap
  }

  /** Start the incremental shard-assignment stream over a landing
    * directory of curated-doc parquet batches; assignment rows
    * (+ batch_id) append to `outDir`. */
  def incrementalShardLayout(spark: SparkSession, landingDir: String,
      outDir: String, maxFilesPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    var state: Map[Long, BucketTail] =
      try recoverState(spark.read.parquet(outDir))
      catch { case _: Exception => Map.empty } // no assignments yet
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (asn, st) = assignBatch(spark, state, batch)
        asn.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outDir)
        state = st
        ()
      }
      .start()
  }
}
