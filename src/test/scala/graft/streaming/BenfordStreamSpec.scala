package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming Benford monitor: the live digit histogram must equal
  * the batch twin of the union across micro-batches (mergeable
  * contract), the report fold must equal the AUDITED batch q115
  * query on the same corpus (cross-gate), and the fold arithmetic
  * must be exact on hand cases. */
class BenfordStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming digit histogram equals the batch twin over two " +
      "micro-batches and the fold reproduces the batch q115 report") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001/orders.parquet"
    val orders = spark.read.parquet(src)
    val half = orders.agg(org.apache.spark.sql.functions
      .expr("percentile_approx(o_orderkey, 0.5)")).head.getLong(0)

    val stage = Files.createTempDirectory("benford-stage")
    var n = 0
    for (pred <- Seq($"o_orderkey" <= half, $"o_orderkey" > half)) {
      val part = Files.createTempDirectory("benford-part")
      orders.filter(pred).coalesce(1).write
        .mode("overwrite").parquet(part.toString)
      for (f <- new java.io.File(part.toString).listFiles()
             if f.getName.endsWith(".parquet")) {
        Files.copy(f.toPath, stage.resolve(s"batch$n.parquet")); n += 1
      }
    }

    val q = StreamBenford.countsStream(spark, stage.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("benford_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val streamed = rows(spark.table("benford_stream"))
    val batch = rows(StreamBenford.digitCounts(orders))
    assert(streamed === batch)
    assert(streamed.size <= 9) // bounded state

    // CROSS-GATE: the driver fold over the streamed histogram must
    // equal the audited batch q115 query on the same corpus
    val folded = StreamBenford.report(streamed)
    val q115 = graft.operators.Quality
      .q115Benford(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(folded === q115)
  }

  test("report fold is exact on hand histograms and the nine " +
      "expectation constants sum to exactly one million") {
    assert(StreamBenford.ExpPpm.values.sum == 1000000L)
    // digits 1 and 2 at 3:1 over n=4: obs_ppm 750000/250000
    val out = StreamBenford.report(Seq((2L, 1L), (1L, 3L)))
    assert(out === Seq(
      (1L, 3L, 4L, 750000L, 301030L, 448970L),
      (2L, 1L, 4L, 250000L, 176091L, 73909L)))
  }
}
