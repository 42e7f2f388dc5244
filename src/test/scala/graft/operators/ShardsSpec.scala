package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q171/q172 — conservation, packing bounds, manifest fingerprints,
  * the determinism/decorrelation properties of the shard shuffle, and
  * the provenance contract's relabel claim: ShardBuckets is a pure
  * relabel of the canonical (grain, seq) shard key, so member
  * sequences are invariant under a bucket-count change and
  * conservation holds at non-default counts. Corpus sized to force
  * multi-shard grains. */
class ShardsSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private val DocTokens = 60
  private val NDocs = 600L

  /** 600 unique-word docs (ttr 100%, n_tokens = 60 each) + one exact
    * duplicate of doc 0 (loses the survivor election) + one too-short
    * doc (quality-gated). Survivor set is exactly docs 0..599. */
  private def fixtureDir(): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shards-fix")
    val docs = (0L until NDocs).map { i =>
      val text = (0 until DocTokens).map(j => s"w${i}x$j").mkString(" ")
      (i, text, if (i % 3 == 0) "en" else "de", "src", text.length.toLong)
    } :+ {
      val dup = (0 until DocTokens).map(j => s"w0x$j").mkString(" ")
      (900000L, dup, "en", "src", dup.length.toLong)
    } :+ ((900001L, "too short", "en", "src", 9L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private lazy val dir = fixtureDir()
  private lazy val layout = Shards.q171ShardLayout(s, dir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getLong(4), r.getLong(5)))
  private lazy val manifest = Shards.q172ShardManifest(s, dir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getString(5), r.getLong(6), r.getLong(7)))

  test("conservation: every survivor appears exactly once, dup and " +
      "short docs never") {
    val ids = layout.map(_._3)
    assert(ids.sorted.toSeq === (0L until NDocs).toSeq)
  }

  test("positions are contiguous from 0 per shard, token offsets are " +
      "the member-token prefix sums, seqs contiguous per grain") {
    layout.groupBy(_._1).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._2)
      assert(byPos.map(_._2).toSeq === byPos.indices.map(_.toLong))
      val offsets = byPos.map(_._5).scanLeft(0L)(_ + _).init
      assert(byPos.map(_._6).toSeq === offsets.toSeq)
    }
    // (bucket, sub) = shard_id div ShardSubBase identifies the grain
    layout.groupBy(_._1 / Shards.ShardSubBase).foreach { case (_, rows) =>
      val seqs = rows.map(_._1 % Shards.ShardSubBase).distinct.sorted
      assert(seqs.toSeq === (0L until seqs.length).toSeq, "seq gap")
    }
  }

  test("packing is size-bounded: multi-shard grains exist and no " +
      "shard exceeds budget + one overflow doc") {
    val perShard = layout.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    assert(perShard.values.forall(_ <= Shards.ShardTokens + DocTokens))
    assert(layout.map(_._1 % Shards.ShardSubBase).max >= 1L,
      "fixture too small to force a second shard in any grain")
  }

  test("manifest totals, member fingerprints and endpoints agree " +
      "with the layout") {
    assert(manifest.map(_._2).sum === NDocs)
    assert(manifest.map(_._7).toSet === Set(NDocs))
    assert(manifest.map(_._8).toSet === Set(NDocs * DocTokens))
    assert(manifest.map(_._3).sum === NDocs * DocTokens)
    val byShard = layout.groupBy(_._1)
    manifest.foreach { case (sid, nDocs, nToks, first, last, md5Hex, _, _) =>
      val rows = byShard(sid).sortBy(_._2)
      assert(nDocs === rows.length.toLong && nToks === rows.map(_._5).sum)
      assert(first === rows.head._3 && last === rows.last._3)
      val joined = rows.map(_._3).mkString(",")
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(joined.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(md5Hex === dig)
    }
  }

  test("the permutation is deterministic across runs and actually " +
      "decorrelates input order") {
    val again = Shards.q171ShardLayout(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === layout.map(t => (t._1, t._2, t._3)).toSeq)
    // shuffled read order must not be monotone in doc_id
    val readOrder = layout.sortBy(t => (t._1, t._2)).map(_._3)
    assert(readOrder.zip(readOrder.tail).exists { case (a, b) => a > b })
  }

  /** The survivor table alone (doc_id, lang, n_tokens) for the
    * parameterized layoutOf gates below. */
  private def survDf() = {
    import s.implicits._
    (0L until NDocs).map(i =>
      (i, if (i % 3 == 0) "en" else "de", DocTokens.toLong))
      .toDF("doc_id", "lang", "n_tokens")
  }

  /** Canonical view of a layout run: (grain, seq) -> ordered member
    * (doc_id, position, token_offset) rows. */
  private def canonical(buckets: Long)
      : Map[(Long, Long), Seq[(Long, Long, Long)]] =
    Shards.layoutOf(survDf(), Shards.PackGrains, Shards.ShardTokens,
        buckets)
      .select(col("shard_id"), col("position"), col("doc_id"),
        col("token_offset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(t => Shards.grainSeqOf(t._1, buckets))
      .view.mapValues(_.sortBy(_._2).map(t => (t._3, t._2, t._4)).toSeq)
      .toMap

  test("ShardBuckets is a pure relabel: member sequences per " +
      "canonical (grain, seq) are invariant across bucket counts") {
    val b8 = canonical(8L)
    // 5 does not divide the grain count — the adversarial relabel
    val b5 = canonical(5L)
    val b1 = canonical(1L)
    assert(b5 === b8)
    assert(b1 === b8)
  }

  test("conservation holds at a non-default bucket count and ids " +
      "stay collision-free") {
    val rows = Shards.layoutOf(survDf(), Shards.PackGrains,
        Shards.ShardTokens, 5L)
      .select(col("shard_id"), col("position"), col("doc_id"),
        col("n_tokens"), col("token_offset"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._3).sorted.toSeq === (0L until NDocs).toSeq)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._2)
      assert(byPos.map(_._2).toSeq === byPos.indices.map(_.toLong))
      val offsets = byPos.map(_._4).scanLeft(0L)(_ + _).init
      assert(byPos.map(_._5).toSeq === offsets.toSeq)
      assert(rs.map(_._4).sum <= Shards.ShardTokens + DocTokens)
    }
    // distinct (grain, seq) count must equal distinct shard_id count
    val keys = rows.map(t => Shards.grainSeqOf(t._1, 5L)).distinct
    assert(keys.length === rows.map(_._1).distinct.length)
  }
}
