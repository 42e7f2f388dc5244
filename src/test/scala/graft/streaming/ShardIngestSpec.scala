package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Shards

/** The incremental shard assigner must reproduce the batch q171
  * layout bit-for-bit when fed in the batch operator's own
  * deterministic order — however the stream is cut into batches —
  * must keep every conservation property under arbitrary arrival
  * order, and must recover state across restarts WITHOUT counting a
  * replayed batch's own durable rows (the crash window between the
  * parquet write and the checkpoint commit). */
class ShardIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val DocTokens = 60

  /** 200 survivor-grade docs (unique vocab, 60 tokens each). */
  private def docsDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("shing-docs")
    (0L until 200L).map { i =>
      val text = (0 until DocTokens).map(j => s"w${i}x$j").mkString(" ")
      (i, text, if (i % 3 == 0) "en" else "de", "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The survivor tuples in q171's own (md5 key, doc_id) order. */
  private val ordered: Seq[(Long, String, Long)] =
    (0L until 200L).map { i =>
      (i, if (i % 3 == 0) "en" else "de", DocTokens.toLong)
    }.sortBy { case (id, _, _) => (md5hex(s"shard:$id"), id) }

  private def docsDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "n_tokens")
  }

  private type Rows = Seq[(Long, Long, Long, Long, Long)]

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Rows =
    df.select(col("shard_id"), col("position"), col("doc_id"),
        col("n_tokens"), col("token_offset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  private lazy val batchLayout: Rows =
    rowsOf(Shards.q171ShardLayout(spark, docsDir()))

  test("one micro-batch in q171 order reproduces the batch layout " +
      "bit-for-bit") {
    val (asn, st) =
      ShardIngest.assignBatch(spark, Map.empty, docsDf(ordered))
    assert(rowsOf(asn) === batchLayout)
    assert(st.keySet.size <= Shards.PackGrains,
      "state must stay grains-bounded")
  }

  test("batch boundaries never change an assignment: a 3-way split " +
      "chains to the same layout") {
    val cuts = Seq(ordered.slice(0, 70), ordered.slice(70, 140),
      ordered.slice(140, 200))
    var state = Map.empty[Long, ShardIngest.GrainTail]
    val got = cuts.flatMap { c =>
      val (asn, st) = ShardIngest.assignBatch(spark, state, docsDf(c))
      state = st
      rowsOf(asn)
    }.sortBy(t => (t._1, t._2))
    assert(got === batchLayout)
  }

  /** Write `cuts` as order-preserving flat landing files (the file
    * source does not recurse into subdirectories). */
  private def writeLanding(cuts: Seq[Seq[(Long, String, Long)]])
      : String = {
    val landing = Files.createTempDirectory("shing-landing").toString
    cuts.zipWithIndex.foreach { case (c, i) =>
      val scratch = Files.createTempDirectory(s"shing-cut$i").toString
      docsDf(c).coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$landing/batch_$i.parquet"))
    }
    landing
  }

  test("end-to-end stream over landing files equals the batch " +
      "layout, and state recovers from the durable assignments") {
    val landing = writeLanding(Seq(ordered.slice(0, 70),
      ordered.slice(70, 140), ordered.slice(140, 200)))
    val out = Files.createTempDirectory("shing-out").toString
    val q = ShardIngest.incrementalShardLayout(spark, landing, out,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val stored = spark.read.parquet(out)
    assert(rowsOf(stored) === batchLayout)
    // recovery: the rebuilt tails equal the tails of a fresh chain
    val (_, direct) =
      ShardIngest.assignBatch(spark, Map.empty, docsDf(ordered))
    assert(ShardIngest.recoverState(stored) === direct)
  }

  test("crash-window replay is idempotent: a batch whose own " +
      "partition is already durable recovers the PRE-batch state and " +
      "re-derives identical rows") {
    val cuts = Seq(ordered.slice(0, 100), ordered.slice(100, 200))
    val landing = writeLanding(cuts)
    val out = Files.createTempDirectory("shing-crash").toString
    // complete run: both batch partitions durable, checkpoint ignored
    val q = ShardIngest.incrementalShardLayout(spark, landing, out,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val all = spark.read.parquet(out)
    // simulate the crash BETWEEN batch 1's parquet write and its
    // checkpoint commit: the restart replays batch 1 while the
    // batch_id=1 partition already exists. The recovered state must
    // exclude that partition's rows...
    val replayState = ShardIngest.recoverStateBefore(spark, out, 1L)
    val (_, afterBatch0) =
      ShardIngest.assignBatch(spark, Map.empty, docsDf(cuts(0)))
    assert(replayState === afterBatch0,
      "recovered state must equal the state the crashed run saw")
    // ...so the replayed assignment is bit-identical to the durable one
    val (replayAsn, _) =
      ShardIngest.assignBatch(spark, replayState, docsDf(cuts(1)))
    assert(rowsOf(replayAsn) ===
      rowsOf(all.filter(col("batch_id") === 1L)))
    // the OLD recipe (recover from ALL durable rows) would have
    // double-counted batch 1 — prove the distinction is real
    assert(ShardIngest.recoverState(all) !== afterBatch0)
  }

  test("recovery treats only a genuinely absent/empty output dir as " +
      "fresh; corrupt durable data raises instead of restarting at " +
      "zero") {
    val missing = Files.createTempDirectory("shing-miss")
      .resolve("never-written").toString
    assert(ShardIngest.recoverStateBefore(spark, missing, 0L) ===
      Map.empty[Long, ShardIngest.GrainTail])
    // dir with only the checkpoint subdir (no batch partitions) = fresh
    val onlyCkpt = Files.createTempDirectory("shing-ckpt").toString
    Files.createDirectory(java.nio.file.Paths.get(s"$onlyCkpt/_checkpoint"))
    assert(ShardIngest.recoverStateBefore(spark, onlyCkpt, 0L) ===
      Map.empty[Long, ShardIngest.GrainTail])
    // corrupt batch partition: NOT silently-empty — it must raise
    val corrupt = Files.createTempDirectory("shing-corrupt").toString
    val bdir = java.nio.file.Paths.get(s"$corrupt/batch_id=0")
    Files.createDirectory(bdir)
    Files.write(bdir.resolve("part-00000.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    intercept[Exception] {
      ShardIngest.recoverStateBefore(spark, corrupt, 1L)
    }
  }

  test("arrival-order ingest still conserves: each doc once, " +
      "contiguous positions, prefix-sum offsets, bounded shards") {
    var state = Map.empty[Long, ShardIngest.GrainTail]
    val byArrival = ordered.sortBy(_._1) // doc_id order ≠ md5 order
    val got = Seq(byArrival.slice(0, 100), byArrival.slice(100, 200))
      .flatMap { c =>
        val (asn, st) = ShardIngest.assignBatch(spark, state, docsDf(c))
        state = st
        rowsOf(asn)
      }
    assert(got.map(_._3).sorted === (0L until 200L).toSeq)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._2)
      assert(byPos.map(_._2) === byPos.indices.map(_.toLong))
      val offs = byPos.map(_._4).scanLeft(0L)(_ + _).init
      assert(byPos.map(_._5) === offs)
      assert(byPos.map(_._4).sum <= Shards.ShardTokens + DocTokens)
    }
  }

  test("the _shard_knobs sidecar pins a streaming dir's knobs: a " +
      "restart under different values raises instead of silently " +
      "mis-decoding the stored shard_ids") {
    val out = Files.createTempDirectory("shing-knobs").toString
    // first touch records the knobs; a same-knob restart validates
    ShardIngest.checkOrWriteKnobs(spark, out, 16L, 1024L, 8L)
    ShardIngest.checkOrWriteKnobs(spark, out, 16L, 1024L, 8L)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(out, "_shard_knobs")))
    // any single knob change raises loudly, naming both tuples
    for ((g, t, b) <- Seq((16L, 1024L, 5L), (32L, 1024L, 8L),
        (16L, 2048L, 8L))) {
      val e = intercept[IllegalArgumentException] {
        ShardIngest.checkOrWriteKnobs(spark, out, g, t, b)
      }
      assert(e.getMessage.contains("16,1024,8"))
      assert(e.getMessage.contains(s"($g,$t,$b)"))
    }
  }
}
