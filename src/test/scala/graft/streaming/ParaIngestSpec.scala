package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Dedup

/** The paragraph-dedup ingest twin must reproduce batch q177
  * byte-for-byte (doc-grain rollups incl. the rebuilt text) when fed
  * in doc_id order — however the stream is cut into batches — and
  * must recover both indexes (exact hash + near bands) across a
  * restart so paragraphs ingested before the restart still veto
  * their later duplicates. */
class ParaIngestSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def doc(id: Long, text: String): (Long, String, String, String, Long) =
    (id, text, "en", "src0", text.length.toLong)

  /** 16 tokens with a per-paragraph vocab tag; `mut` replaces the
    * final `mut` tokens with variants (a near-dup knob). */
  private def para(tag: String, mut: Int = 0): String =
    (0 until 16).map { i =>
      if (i >= 16 - mut) s"${tag}v$i" else s"$tag$i"
    }.mkString(" ")

  /** Planted docs exercising all three verdict paths cross-batch:
    * 900002 exactly repeats a 900001 paragraph, 900003 carries a
    * near-variant of another, 900004 repeats a paragraph in-doc. */
  private def planted = Seq(
    doc(900001L, s"${para("pa")} ${para("pb")}"),
    doc(900002L, s"${para("pa")} ${para("pc")}"),
    doc(900003L, s"${para("pb", mut = 1)} ${para("pd")}"),
    doc(900004L, s"${para("pe")} ${para("pe")}"))

  /** Full spec corpus: the sf0.001 documents plus the planted ids. */
  private def corpusDf: DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .unionByName(planted
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  /** Doc-grain rollup of a verdict dir over its corpus — the q177
    * output shape, rebuilt text included. */
  private def streamRollup(out: String, corpus: DataFrame): DataFrame = {
    val paras = Dedup.paragraphsOf(
      corpus.select(col("doc_id"), col("text")))
    val kept = spark.read.parquet(out)
      .filter(col("status") === "kept").select(col("pid"))
    val roll = paras.join(kept, Seq("pid"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("pidx"), col("ptext")))),
          e => e.getField("ptext")), " ").as("text_dedup"))
    paras.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"))
      .join(roll, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        (col("n_paras") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  private type Roll = Map[Long, (Long, Long, String)]

  private def rollMap(df: DataFrame): Roll =
    df.select(col("doc_id"), col("n_paras"), col("n_dropped"),
        md5(col("text_dedup")).as("th"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap

  /** Batch q177 over a temp dir holding the spec corpus. */
  private def batchRoll(corpus: DataFrame): Roll = {
    val dir = Files.createTempDirectory("para-sf").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    rollMap(Dedup.q177ParaDedup(spark, dir))
  }

  test("chained stream over landing batches in doc_id order equals " +
      "batch q177 byte-for-byte, splice included") {
    val corpus = corpusDf
    val landing = Files.createTempDirectory("para-landing").toString
    val out = Files.createTempDirectory("para-verdicts").toString
    // three landing files cut at doc boundaries, ascending doc_id
    val ids = corpus.select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted
    val cuts = Seq(ids.slice(0, ids.length / 3),
      ids.slice(ids.length / 3, 2 * ids.length / 3),
      ids.slice(2 * ids.length / 3, ids.length))
    cuts.zipWithIndex.foreach { case (c, i) =>
      corpus.filter(col("doc_id").isin(c: _*))
        .coalesce(1).write.mode("overwrite").parquet(s"$landing/b$i")
      Thread.sleep(1200) // distinct mtimes => deterministic order
    }
    val q = ParaIngest.incrementalParaDedup(spark, s"$landing/*", out,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(240000)
    // every paragraph exactly one verdict
    val v = spark.read.parquet(out)
    assert(v.groupBy(col("pid")).count().filter(col("count") > 1)
      .isEmpty, "one verdict per paragraph")
    // the planted paths all fired, cross-batch, with evidence
    val byPid = v.select(col("pid"), col("status"), col("partner_pid"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val B = Dedup.ParaIdBase
    assert(byPid(900002L * B) === ("exact", 900001L * B),
      "cross-batch exact duplicate names its keeper")
    assert(byPid(900004L * B + 1) === ("exact", 900004L * B),
      "in-doc exact duplicate drops against the earlier chunk")
    assert(byPid(900003L * B)._1 === "near",
      "planted near-variant paragraph takes the banded path")
    assert(byPid(900003L * B)._2 === 900001L * B + 1,
      "near drop names the original paragraph")
    // the cross-gate: stream rollup ≡ batch q177 on the same corpus
    assert(rollMap(streamRollup(out, corpus)) === batchRoll(corpus))
  }

  test("restart recovers both indexes: pre-restart paragraphs veto " +
      "their post-restart duplicates and the final state still " +
      "equals batch q177") {
    import spark.implicits._
    val pre = planted.take(2) // 900001, 900002
    val post = Seq(
      doc(900005L, s"${para("pa")} ${para("pf")}"), // exact vs 900001
      doc(900006L, s"${para("pc", mut = 1)} ${para("pg")}")) // near vs 900002
    val corpus = pre.++(post)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val landing = Files.createTempDirectory("para-landing2").toString
    val out = Files.createTempDirectory("para-verdicts2").toString
    pre.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b0")
    val q1 = ParaIngest.incrementalParaDedup(spark, s"$landing/*", out,
      maxFilesPerTrigger = Some(1))
    q1.awaitTermination(240000)
    Thread.sleep(1200)
    post.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$landing/b1")
    // RESTART: a fresh stream over the same dirs rebuilds the exact
    // and near indexes from the durable verdicts + landing files
    val q2 = ParaIngest.incrementalParaDedup(spark, s"$landing/*", out,
      maxFilesPerTrigger = Some(1))
    q2.awaitTermination(240000)
    val byPid = spark.read.parquet(out)
      .select(col("pid"), col("status"), col("partner_pid"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val B = Dedup.ParaIdBase
    assert(byPid(900005L * B) === ("exact", 900001L * B),
      "recovered exact index vetoes the post-restart duplicate")
    assert(byPid(900006L * B)._1 === "near",
      "recovered near index vetoes the post-restart near-variant")
    assert(rollMap(streamRollup(out, corpus)) === batchRoll(corpus))
  }
}
