package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Dedup

class DocIngestSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def verdictSet(dir: String): Set[(Long, Long, Long)] =
    spark.read.parquet(dir)
      .select(col("doc_id"), col("dup_of"), col("n_matches"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("single-batch streaming ingest equals the q71 batch verdicts") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val landing = Files.createTempDirectory("doc-landing").toString
    val out = Files.createTempDirectory("doc-verdicts").toString
    // same corpus/batch split as q71: doc_id % NewMod == NewMod-1 is new
    docs.filter(col("doc_id") % Dedup.NewMod === Dedup.NewMod - 1)
      .coalesce(1).write.mode("overwrite").parquet(landing)
    val corpus = docs.filter(col("doc_id") % Dedup.NewMod =!= Dedup.NewMod - 1)
    val q = DocIngest.incrementalDedup(spark, corpus, landing, out)
    q.awaitTermination(120000)
    val batch = Dedup.q71IncrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(verdictSet(out) == batch,
      "stream verdicts match the oracle-gated batch query")
  }

  test("accepted docs join the index; rejected docs do not") {
    import spark.implicits._
    def doc(id: Long, text: String): (Long, String, String, String, Long) =
      (id, text, "en", "src0", text.length.toLong)
    val corpusText = "alpha beta gamma delta epsilon zeta"
    val novelText = "one two three four five six seven"
    val corpus = Seq(doc(1L, corpusText))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val landing = Files.createTempDirectory("doc-landing2").toString
    val out = Files.createTempDirectory("doc-verdicts2").toString
    // batch 1: 100 is novel (accepted), 101 duplicates the corpus
    Seq(doc(100L, novelText), doc(101L, corpusText))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b1")
    Thread.sleep(1200) // distinct mtimes => deterministic file order
    // batch 2: 200 duplicates the batch-1 ACCEPTED doc, 201 is novel,
    // 202 duplicates the corpus (now also duplicated by REJECTED 101,
    // which must not be in the index)
    Seq(doc(200L, novelText), doc(201L, "eight nine ten eleven twelve thirteen"),
        doc(202L, corpusText))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b2")
    val q = DocIngest.incrementalDedup(spark, corpus,
      s"$landing/*", out, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val got = verdictSet(out)
    assert(got == Set(
      (100L, -1L, 0L),  // novel, accepted
      (101L, 1L, 1L),   // dup of corpus
      (200L, 100L, 1L), // dup of the ACCEPTED batch-1 doc via the evolved index
      (201L, -1L, 0L),  // novel, accepted
      (202L, 1L, 1L)),  // dup of corpus only — rejected 101 never indexed
      s"unexpected verdicts: $got")
  }

  test("restart rebuilds the index: docs accepted before a restart " +
      "still veto their later duplicates") {
    import spark.implicits._
    def doc(id: Long, text: String): (Long, String, String, String, Long) =
      (id, text, "en", "src0", text.length.toLong)
    val corpus = Seq(doc(1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val landing = Files.createTempDirectory("doc-landing3").toString
    val out = Files.createTempDirectory("doc-verdicts3").toString
    val novelText = "one two three four five six seven"
    // run 1: doc 100 is accepted, then the stream STOPS (process death)
    Seq(doc(100L, novelText))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b1")
    DocIngest.incrementalDedup(spark, corpus, s"$landing/*", out)
      .awaitTermination(120000)
    Thread.sleep(1200) // distinct mtimes => deterministic file order
    // run 2: a FRESH stream over the same checkpoint sees only b2; doc
    // 200 duplicates the doc accepted in run 1, which is absent from
    // this process's memory — only the rebuilt index can flag it
    Seq(doc(200L, novelText), doc(201L, "eight nine ten eleven twelve"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b2")
    DocIngest.incrementalDedup(spark, corpus, s"$landing/*", out)
      .awaitTermination(120000)
    val got = verdictSet(out)
    assert(got == Set(
      (100L, -1L, 0L),  // accepted in run 1, written exactly once
      (200L, 100L, 1L), // flagged against the pre-restart accepted doc
      (201L, -1L, 0L)), // novel, accepted
      s"unexpected verdicts after restart: $got")
  }
}
