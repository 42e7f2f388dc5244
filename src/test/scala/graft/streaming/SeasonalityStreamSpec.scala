package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming seasonality monitor: the live (type, hod) histogram
  * must equal the batch twin of the union across micro-batches
  * (mergeable contract), the report fold must equal the AUDITED
  * batch q147 query on the same corpus (cross-gate), and the fold's
  * tie/truncation arithmetic must be exact on hand cases. */
class SeasonalityStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming hod histogram equals the batch twin over two " +
      "micro-batches, state is bounded, and the fold reproduces the " +
      "batch q147 report") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001/events.parquet"
    val events = EventsStream.readBatch(spark, src)
    val half = events.agg(org.apache.spark.sql.functions
      .expr("percentile_approx(event_id, 0.5)")).head.getLong(0)

    val stage = Files.createTempDirectory("season-stage")
    var n = 0
    for (pred <- Seq($"event_id" <= half, $"event_id" > half)) {
      val part = Files.createTempDirectory("season-part")
      events.filter(pred).coalesce(1).write
        .mode("overwrite").parquet(part.toString)
      for (f <- new java.io.File(part.toString).listFiles()
             if f.getName.endsWith(".parquet")) {
        Files.copy(f.toPath, stage.resolve(s"batch$n.parquet")); n += 1
      }
    }

    val q = StreamSeasonality.countsStream(spark, stage.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("season_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    def rows(df: org.apache.spark.sql.DataFrame)
        : Seq[(String, Long, Long)] =
      df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val streamed = rows(spark.table("season_stream"))
    val batch = rows(StreamSeasonality.hodCounts(events))
    assert(streamed === batch)
    val nTypes = events.select($"event_type").distinct().count()
    assert(streamed.size <= 24 * nTypes) // bounded state

    // CROSS-GATE: the driver fold over the streamed histogram must
    // equal the audited batch q147 query on the same corpus
    val folded = StreamSeasonality.peaks(streamed)
    val q147 = graft.operators.EventStats
      .q147Seasonality(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(folded === q147)
  }

  test("peaks fold is exact on hand histograms (ties -> earliest " +
      "hour; truncating ppm)") {
    // type a: hods 3 and 7 tie at 5 -> peak hod 3; n = 13;
    //   share = 5e6 div 13 = 384615; lift = 5*24e6 div 13 = 9230769.
    // type b: single slot -> share 1e6, lift 24e6.
    val out = StreamSeasonality.peaks(Seq(
      ("a", 7L, 5L), ("a", 3L, 5L), ("a", 11L, 3L), ("b", 0L, 2L)))
    assert(out === Seq(
      ("a", 13L, 3L, 5L, 384615L, 9230769L),
      ("b", 2L, 0L, 2L, 1000000L, 24000000L)))
  }
}
