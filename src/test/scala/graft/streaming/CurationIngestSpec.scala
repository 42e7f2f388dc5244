package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Shards

/** The composed curate→shard stream must (a) gate and dedup exactly
  * like its parts, and (b) produce a final shard layout BIT-IDENTICAL
  * to the batch `Shards.layoutOf` of precisely the docs it accepted —
  * the q84→q171 batch composition — when fed in the shard
  * permutation's own order, however the stream is cut into batches. */
class CurationIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val GoodTokens = 20

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def uniqueText(id: Long): String =
    (0 until GoodTokens).map(j => s"v${id}x$j").mkString(" ")

  private type Doc = (Long, String, String, String, Long)
  private def doc(id: Long, text: String): Doc =
    (id, text, if (id % 3 == 0) "en" else "de", "src", text.length.toLong)

  private def docsDf(rows: Seq[Doc]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  // landing content: 60 good docs, 2 quality rejects, 2 dup rejects
  private val good: Seq[Doc] = (100L until 160L).map(i =>
    doc(i, uniqueText(i)))
  private val rejects: Seq[Doc] = Seq(
    doc(300L, "too short doc"),
    doc(301L, Seq.fill(40)("word").mkString(" ")),
    doc(400L, uniqueText(1L)),   // dup of corpus doc 1
    // dup of accepted landing doc 130 — chosen because 130 carries
    // the EARLIEST shard key of the good docs, so 401 is guaranteed
    // to arrive after it (first-accepted-wins needs the original
    // already in the evolved index)
    doc(401L, uniqueText(130L)))
  // the full landing stream in the shard permutation's own order
  private val landingOrdered: Seq[Doc] = (good ++ rejects)
    .sortBy(d => (md5hex(s"shard:${d._1}"), d._1))

  test("chained stream: verdicts gate+dedup like the parts, and the " +
      "final assignments equal the batch layout of the accepted set") {
    val landing = Files.createTempDirectory("cur-landing").toString
    val verdicts = Files.createTempDirectory("cur-verdicts").toString
    val shards = Files.createTempDirectory("cur-shards").toString
    val cuts = Seq(landingOrdered.slice(0, 32),
      landingOrdered.slice(32, 64))
    cuts.zipWithIndex.foreach { case (c, i) =>
      val scratch = Files.createTempDirectory(s"cur-cut$i").toString
      docsDf(c).coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$landing/batch_$i.parquet"))
    }
    val corpus = docsDf(Seq(doc(1L, uniqueText(1L)),
      doc(2L, uniqueText(2L))))
    val q = CurationIngest.curateAndShard(spark, corpus, landing,
      verdicts, shards, maxFilesPerTrigger = Some(1))
    q.awaitTermination(180000)

    // verdicts: quality rejects never reach a verdict; dups flagged
    // against the corpus and the evolved accepted index; good accepted
    val vs = spark.read.parquet(verdicts)
      .select(col("doc_id"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!vs.contains(300L) && !vs.contains(301L),
      "quality-gated docs must not reach a verdict")
    assert(vs(400L) === 1L, "dup of the corpus doc")
    assert(vs(401L) === 130L, "dup of an accepted landing doc")
    assert(good.forall(d => vs(d._1) === -1L), "good docs accepted")

    // assignments ≡ batch layout of EXACTLY the accepted set
    val acceptedDf = docsDf(good)
      .select(col("doc_id"), col("lang"),
        lit(GoodTokens.toLong).as("n_tokens"))
    val batchLayout = Shards.layoutOf(acceptedDf, Shards.PackGrains,
        Shards.ShardTokens, Shards.ShardBuckets)
      .select(col("shard_id"), col("position"), col("doc_id"),
        col("n_tokens"), col("token_offset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    val streamed = spark.read.parquet(shards)
      .select(col("shard_id"), col("position"), col("doc_id"),
        col("n_tokens"), col("token_offset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed === batchLayout,
      "chained stream's layout must equal the batch q84→q171 " +
        "composition over the accepted set")

    // conservation: each accepted doc exactly once, nothing else
    assert(streamed.map(_._3).sorted === good.map(_._1).sorted)
  }

  test("restart: docs accepted before a restart still veto later " +
      "duplicates, and the layout continues from the durable tails") {
    val landing = Files.createTempDirectory("cur2-landing").toString
    val verdicts = Files.createTempDirectory("cur2-verdicts").toString
    val shards = Files.createTempDirectory("cur2-shards").toString
    val corpus = docsDf(Seq(doc(1L, uniqueText(1L))))
    // phase 1: docs 500..539 in shard-key order, all accepted
    val phase1 = (500L until 540L).map(i => doc(i, uniqueText(i)))
      .sortBy(d => (md5hex(s"shard:${d._1}"), d._1))
    val scratch1 = Files.createTempDirectory("cur2-s1").toString
    docsDf(phase1).coalesce(1).write.mode("overwrite").parquet(scratch1)
    val p1 = new java.io.File(scratch1).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(p1.toPath,
      java.nio.file.Paths.get(s"$landing/batch_a.parquet"))
    val q1 = CurationIngest.curateAndShard(spark, corpus, landing,
      verdicts, shards)
    q1.awaitTermination(180000)
    // phase 2 (after "restart"): a dup of an accepted phase-1 doc,
    // plus fresh docs whose keys all sort after phase 1's... not
    // required — the cross-gate below re-derives the batch layout of
    // the union in the COMBINED arrival order, so we only need the
    // dup verdict and conservation, not bit-order identity
    val dupOf = phase1.head._1 // earliest-keyed accepted doc
    val phase2 = Seq(doc(900L, uniqueText(dupOf)),
      doc(600L, uniqueText(600L)), doc(601L, uniqueText(601L)))
    val scratch2 = Files.createTempDirectory("cur2-s2").toString
    docsDf(phase2).coalesce(1).write.mode("overwrite").parquet(scratch2)
    val p2 = new java.io.File(scratch2).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(p2.toPath,
      java.nio.file.Paths.get(s"$landing/batch_b.parquet"))
    val q2 = CurationIngest.curateAndShard(spark, corpus, landing,
      verdicts, shards)
    q2.awaitTermination(180000)
    val vs = spark.read.parquet(verdicts)
      .select(col("doc_id"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vs(900L) === dupOf,
      "a doc accepted before the restart must veto its later dup")
    assert(vs(600L) === -1L && vs(601L) === -1L)
    // conservation across the restart: every accepted doc assigned
    // exactly once, the dup never
    val assigned = spark.read.parquet(shards)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(assigned.toSeq ===
      ((500L until 540L) ++ Seq(600L, 601L)).sorted)
    // positions stay contiguous and offsets prefix-sum per shard
    val rows = spark.read.parquet(shards)
      .select(col("shard_id"), col("position"), col("n_tokens"),
        col("token_offset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._2)
      assert(byPos.map(_._2).toSeq === byPos.indices.map(_.toLong))
      val offs = byPos.map(_._3).scanLeft(0L)(_ + _).init
      assert(byPos.map(_._4).toSeq === offs.toSeq)
    }
  }
}
