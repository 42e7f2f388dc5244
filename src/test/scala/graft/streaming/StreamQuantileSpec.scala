package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming quantile sketch: the live histogram must equal the
  * batch twin of the union (mergeable contract), the rank rule must
  * match hand-computed cases exactly, and the reported enclosure
  * must bracket the true batch percentile. */
class StreamQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("quantiles: hand case — rank rule and enclosures are exact") {
    // 10 values of bit-length 3 (4..7) + 90 of bit-length 7 (64..127)
    val hist = Seq((3L, 10L), (7L, 90L))
    val got = StreamQuantile.quantiles(hist, Seq(5, 10, 50, 99))
    // n=100: rank(5%)=5 → bucket 3; rank(10%)=10 → bucket 3 (cum
    // exactly 10); rank(50%)=50 → bucket 7; rank(99%)=99 → bucket 7
    assert(got == Seq(
      (5, 100L, 3L, 4L, 7L),
      (10, 100L, 3L, 4L, 7L),
      (50, 100L, 7L, 64L, 127L),
      (99, 100L, 7L, 64L, 127L)), got.toString)
  }

  test("quantiles: empty histogram yields no rows; out-of-range " +
      "bucket is rejected loudly") {
    assert(StreamQuantile.quantiles(Seq.empty).isEmpty)
    intercept[IllegalArgumentException] {
      StreamQuantile.quantiles(Seq((0L, 5L)))
    }
    intercept[IllegalArgumentException] {
      StreamQuantile.quantiles(Seq((65L, 5L)))
    }
  }

  test("streaming histogram equals the batch twin over two " +
      "micro-batches; enclosure brackets the exact batch median") {
    import spark.implicits._
    val docs = spark.read.parquet(
      "/root/testdata/sf0.001/documents.parquet")
    val half = docs.count() / 2

    val landing = Files.createTempDirectory("quant-landing")
    docs.filter($"doc_id" < half).coalesce(1).write
      .parquet(landing.resolve("b0").toString)
    docs.filter($"doc_id" >= half).coalesce(1).write
      .parquet(landing.resolve("b1").toString)
    val stage = Files.createTempDirectory("quant-stage")
    var n = 0
    for (sub <- Seq("b0", "b1");
         f <- new java.io.File(landing.resolve(sub).toString).listFiles()
        if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, stage.resolve(s"batch$n.parquet")); n += 1
    }

    val q = StreamQuantile.histStream(spark, stage.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("quant_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val streamed = pairs(spark.table("quant_stream")).sorted
    val batch = pairs(StreamQuantile.log2Hist(docs)).sorted
    assert(streamed === batch)
    assert(batch.size <= StreamQuantile.QuantBuckets) // bounded state

    // the sketch enclosure must bracket the exact batch median
    val exactMedian = docs
      .selectExpr("CAST(percentile(n_chars, 0.5) AS BIGINT) AS m")
      .head().getLong(0)
    val (_, _, _, lo, hi) =
      StreamQuantile.quantiles(streamed).find(_._1 == 50).get
    assert(lo <= exactMedian && exactMedian <= hi,
      s"median $exactMedian outside sketch enclosure [$lo, $hi]")
  }
}
