package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming CUSUM monitor: the live per-day counter table must equal
  * the batch twin over micro-batches, and the driver fold must
  * reproduce the q149 BATCH QUERY's own answer on the same corpus —
  * stream ≡ batch as a cross-gate against independent code. */
class CusumStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming day counters equal the batch twin over two " +
      "micro-batches, and the fold reproduces q149's batch answer") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001/events.parquet"
    val events = EventsStream.readBatch(spark, src)
    val half = events.agg(org.apache.spark.sql.functions
      .expr("percentile_approx(event_id, 0.5)")).head.getLong(0)

    val stage = Files.createTempDirectory("cusum-stage")
    events.filter($"event_id" <= half).coalesce(1).write
      .parquet(stage.resolve("b0").toString)
    events.filter($"event_id" > half).coalesce(1).write
      .parquet(stage.resolve("b1").toString)
    val landing = Files.createTempDirectory("cusum-landing")
    var n = 0
    for (sub <- Seq("b0", "b1");
         f <- new java.io.File(stage.resolve(sub).toString).listFiles()
           if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, landing.resolve(s"batch$n.parquet")); n += 1
    }

    val q = StreamCusum.countsStream(spark, landing.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val streamed = rows(spark.table("cusum_stream"))
    val batch = rows(StreamCusum.dailyCounts(events))
    assert(streamed === batch)
    assert(streamed.size == events
      .select(org.apache.spark.sql.functions
        .expr("ts div 86400000000000")).distinct().count()) // bounded

    // cross-gate: the fold over the streamed counters must equal the
    // INDEPENDENT q149 batch query on the same corpus
    val folded = StreamCusum.changepoint(streamed).get
    val b = graft.operators.EventStats
      .q149CusumChangepoint(spark, "/root/testdata/sf0.001").head()
    assert(folded === (b.getLong(0), b.getLong(1), b.getLong(2),
      b.getLong(3), b.getLong(4), b.getLong(5)))
  }

  test("changepoint fold is exact on a hand series and dates the " +
      "earliest peak on ties") {
    // days 0..3 with counts 1,1,5,5: N=12, nDays=4.
    // k=1: |4*1-1*12| = 8; k=2: |4*2-2*12| = 16; k=3: |4*7-3*12| = 8.
    // peak at k=2 (day 1): means 2*1000/2=1000 and 10*1000/2=5000.
    val out = StreamCusum.changepoint(
      Seq((2L, 5L), (0L, 1L), (1L, 1L), (3L, 5L)))
    assert(out === Some((4L, 12L, 1L, 16L, 1000L, 5000L)))
    // a flat series still dates its max (all candidates equal) at the
    // earliest day
    val flat = StreamCusum.changepoint(Seq((0L, 2L), (1L, 2L), (2L, 2L)))
    assert(flat === Some((3L, 6L, 0L, 0L, 2000L, 2000L)))
    // degenerate tables date nothing
    assert(StreamCusum.changepoint(Seq((0L, 7L))) === None)
    assert(StreamCusum.changepoint(Nil) === None)
  }

  test("changepoint fold rejects negative counts loudly") {
    intercept[IllegalArgumentException] {
      StreamCusum.changepoint(Seq((0L, -1L), (1L, 2L)))
    }
  }
}
