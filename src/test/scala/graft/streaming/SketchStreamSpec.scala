package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Sketch

/** The mergeable-summary contract, tested: the streaming CMS over
  * two document micro-batches must equal, counter for counter, the
  * batch sketch over their union — same `tokenSketch` definition,
  * two execution modes. */
class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("streaming CMS counters equal the batch sketch of the union") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half = docs.count() / 2

    // stage the corpus as two landing files → two micro-batches
    val landing = Files.createTempDirectory("cms-landing")
    docs.filter($"doc_id" < half).coalesce(1).write
      .parquet(landing.resolve("b0").toString)
    docs.filter($"doc_id" >= half).coalesce(1).write
      .parquet(landing.resolve("b1").toString)
    val stage = Files.createTempDirectory("cms-stage")
    var n = 0
    for (sub <- Seq("b0", "b1");
         f <- new java.io.File(landing.resolve(sub).toString).listFiles()
        if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, stage.resolve(s"batch$n.parquet")); n += 1
    }

    val q = StreamSketch.cmsStream(spark, stage.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the reader option really split the files into separate triggers
    // — otherwise the state-merge path is never exercised
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    val streamed = spark.table("cms_stream")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val batch = Sketch.tokenSketch(docs)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(streamed === batch)
    assert(batch.size <= Sketch.Depth * Sketch.Width) // bounded state
    // and both agree with q91's exact-table-derived build: the total
    // mass per hash row is the corpus occurrence count either way
    val occ = docs.select(org.apache.spark.sql.functions.explode(
      graft.operators.TextAnalysis.tokens(
        org.apache.spark.sql.functions.col("text")))).count()
    (0 until Sketch.Depth).foreach { r =>
      assert(batch.collect { case ((`r`, _), c) => c }.sum === occ)
    }
  }

  test("streaming HLL registers equal the batch sketch of the union " +
      "and the elementwise max of the halves") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val half = docs.count() / 2
    val a = docs.filter($"doc_id" < half)
    val b = docs.filter($"doc_id" >= half)

    val stage = Files.createTempDirectory("hll-stage")
    a.coalesce(1).write.parquet(stage.resolve("s0").toString)
    b.coalesce(1).write.parquet(stage.resolve("s1").toString)
    val landing = Files.createTempDirectory("hll-landing")
    var n = 0
    for (sub <- Seq("s0", "s1");
         f <- new java.io.File(stage.resolve(sub).toString).listFiles()
        if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, landing.resolve(s"batch$n.parquet")); n += 1
    }

    val q = StreamSketch.hllStream(spark, landing.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "expected >= 2 non-empty micro-batches")

    def regs(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamed = regs(spark.table("hll_stream"))
    val batch = regs(Sketch.tokenHll(docs))
    assert(streamed === batch)
    assert(batch.size <= Sketch.Regs, "bounded state")
    // mergeability: union registers are the elementwise max of the
    // halves' registers — the property that lets per-shard HLLs
    // combine without rescanning anything
    val merged = (regs(Sketch.tokenHll(a)).toSeq ++
      regs(Sketch.tokenHll(b)).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(merged === batch)
  }
}
