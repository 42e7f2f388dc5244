package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming drift monitor: the live histogram must equal the batch
  * twin of the union (mergeable contract), and the integer drift
  * fold must be exact on hand cases. */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming histogram equals the batch twin over two " +
      "micro-batches; drift vs first-half reference is positive") {
    import spark.implicits._
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val half = docs.count() / 2
    val lo = 0L
    val hi = docs.agg(org.apache.spark.sql.functions
      .max($"n_chars")).head.getLong(0) + 1

    val landing = Files.createTempDirectory("drift-landing")
    docs.filter($"doc_id" < half).coalesce(1).write
      .parquet(landing.resolve("b0").toString)
    docs.filter($"doc_id" >= half).coalesce(1).write
      .parquet(landing.resolve("b1").toString)
    val stage = Files.createTempDirectory("drift-stage")
    var n = 0
    for (sub <- Seq("b0", "b1");
         f <- new java.io.File(landing.resolve(sub).toString).listFiles()
        if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, stage.resolve(s"batch$n.parquet")); n += 1
    }

    val q = StreamDrift.histStream(spark, stage.toString, lo, hi,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val streamed = pairs(spark.table("drift_stream")).sorted
    val batch = pairs(
      StreamDrift.lengthHist(docs, lo, hi)).sorted
    assert(streamed === batch)
    assert(batch.size <= StreamDrift.DriftBuckets) // bounded state

    // live (union) vs reference (first half): a real corpus's halves
    // differ, so drift is positive but far from the 1e6 ceiling
    val ref = pairs(
      StreamDrift.lengthHist(docs.filter($"doc_id" < half), lo, hi))
    val (ks, l1) = StreamDrift.drift(streamed, ref)
    assert(ks > 0L && ks < 1000000L)
    assert(l1 >= ks)
  }

  test("drift fold is exact on hand histograms") {
    // live: bucket0=3, bucket1=1 (n=4); ref: bucket0=1, bucket1=3
    // (n=4). CDF diffs: b0 |3·4−1·4| = 8, b1 0 → ks = 8·1e6/16 =
    // 500000. L1 = (|3·4−1·4| + |1·4−3·4|)·1e6/16 = 1000000.
    val (ks, l1) = StreamDrift.drift(
      Seq((0L, 3L), (1L, 1L)), Seq((0L, 1L), (1L, 3L)))
    assert(ks === 500000L)
    assert(l1 === 1000000L)
    // identical histograms → zero drift
    assert(StreamDrift.drift(Seq((0L, 2L)), Seq((0L, 7L))) === ((0L, 0L)))
    // empty side guards
    assert(StreamDrift.drift(Nil, Seq((0L, 1L))) === ((0L, 0L)))
  }

  test("drift rejects out-of-range bucket ids loudly (they would " +
      "silently skew the CDF otherwise)") {
    intercept[IllegalArgumentException] {
      StreamDrift.drift(Seq((StreamDrift.DriftBuckets.toLong, 1L)),
        Seq((0L, 1L)))
    }
    intercept[IllegalArgumentException] {
      StreamDrift.drift(Seq((0L, 1L)), Seq((-1L, 1L)))
    }
  }
}
