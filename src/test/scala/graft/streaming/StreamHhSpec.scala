package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Sketch

/** Streaming Misra–Gries: the exact-count-gated candidate union must
  * equal batch q135's heavy-hitter set — across shards, micro-batch
  * boundaries, and candidate churn. */
class StreamHhSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("gated stream candidates equal the batch q135 heavy hitters " +
      "across three micro-batches") {
    import spark.implicits._
    // the q135 fixture, cut so the heavy token's mass spans batches:
    // 'the' 120, 'data' 60, 180 unique fillers -> N=360, gate cnt>5
    val words = Seq.fill(120)("the") ++ Seq.fill(60)("data") ++
      (1 to 180).map(i => s"u$i")
    val docs = words.grouped(120).zipWithIndex
      .map { case (w, i) => (i.toLong + 1L, w.mkString(" ")) }.toSeq
    val landing = Files.createTempDirectory("hh-landing")
    docs.zipWithIndex.foreach { case ((id, text), i) =>
      Seq((id, text, "en", "t", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(landing.resolve(s"b$i").toString)
    }
    val stage = Files.createTempDirectory("hh-stage")
    var n = 0
    for (i <- docs.indices;
         f <- new java.io.File(landing.resolve(s"b$i").toString)
           .listFiles() if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, stage.resolve(s"batch$n.parquet")); n += 1
    }

    val q = StreamHh.candidateStream(spark, stage.toString,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("hh_cands")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val candUnion = spark.table("hh_cands")
      .select(col("tok")).distinct()
    // the gate over the settled corpus (batch side), as q135 does
    val toks = docs.toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("tok"))
    val nTotal = toks.count()
    val gated = toks.join(candUnion, Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * Sketch.MgK > nTotal)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gated == Map("the" -> 120L, "data" -> 60L),
      s"gated stream candidates: $gated")
  }

  test("mgUpdate carries counts across calls and never exceeds k") {
    val m1 = StreamHh.mgUpdate(Map.empty,
      (Seq.fill(50)("hot") ++ (1 to 100).map(i => s"c$i")).iterator)
    val m2 = StreamHh.mgUpdate(m1,
      (Seq.fill(30)("hot") ++ (101 to 200).map(i => s"c$i")).iterator)
    assert(m2.contains("hot"), "heavy survivor evicted across batches")
    assert(m2("hot") >= 80L - (300L / Sketch.MgK.toLong),
      "MG undercount bound violated")
    assert(m2.size <= Sketch.MgK)
  }
}
