package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The multimodal decode path: real still-image payloads decode to
  * their true dimensions through the batched mapPartitions pipeline;
  * non-image payloads take the deterministic stub branch the oracle
  * states. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8800)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG/BMP payloads decode to true dimensions") {
    import s.implicits._
    val bmpOut = new ByteArrayOutputStream()
    ImageIO.write(new BufferedImage(7, 5, BufferedImage.TYPE_INT_RGB),
      "bmp", bmpOut)
    val rows = Multimodal.features(Seq(
      (1L, png(12, 34)),
      (2L, bmpOut.toByteArray),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")).orderBy("doc_id").collect()

    assert(rows(0).getAs[Int]("width") == 12)
    assert(rows(0).getAs[Int]("height") == 34)
    assert(rows(0).getAs[Long]("n_frames") == 1L)
    assert(rows(1).getAs[Int]("width") == 7)
    assert(rows(1).getAs[Int]("height") == 5)
    // stub branch: length-mod dimensions, md5 fingerprint
    val n = "not an image".length
    assert(rows(2).getAs[Int]("width") == n % 640)
    assert(rows(2).getAs[Int]("height") == n % 480)
    assert(rows(2).getAs[String]("fp").length == 32)
  }

  test("mm_phash: pixel-exact re-encodes collide at hamming 0 and " +
      "the banded join finds only same-pattern pairs") {
    val rows = Multimodal.mmPhashDedup(SparkSpec.spark, "unused")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.contains((1L, 3L, 0L)), "seed-10 exact copy pair")
    assert(rows.contains((6L, 7L, 0L)), "seed-30 exact copy pair")
    // the corner-block edit flips a few hash bits but stays inside
    // the Hamming ball — the case a byte-level md5 fingerprint
    // (mm_features) structurally misses
    assert(rows.exists { case (a, b, h) =>
      a == 1L && b == 2L && h > 0L && h <= Multimodal.PhashMaxHam
    }, "seed-10 near-dup pair with a small positive distance")
    // the deterministic corpus plants no cross-pattern collisions
    val seed = Multimodal.PhashImgs.map(t => t._1 -> t._2).toMap
    assert(rows.forall { case (a, b, _) => seed(a) == seed(b) })
  }

  test("mm_scene_cuts: real PNG decode reproduces the closed-form " +
      "hash stream, and the temporal logic dates the planted cuts") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.mmSceneCuts(SparkSpec.spark, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // expectation derived INDEPENDENTLY from the closed-form hashes
    val expected = Multimodal.sceneHashesClosedForm
      .groupBy(_._1).toSeq.flatMap { case (vid, fr) =>
        val sorted = fr.sortBy(_._2)
        var scene = 0L
        sorted.zipWithIndex.map { case ((_, f, h), i) =>
          val ham = if (i == 0) -1L
            else java.lang.Long.bitCount(sorted(i - 1)._3 ^ h).toLong
          val cut = if (ham > Multimodal.SceneCutHam) 1L else 0L
          scene += cut
          (vid, f.toLong) -> (ham, cut, scene)
        }
      }.toMap
    assert(got == expected)
    // the fixture plants exactly 1 + 0 + 2 scene changes
    val cutsPerVid = got.toSeq.groupBy(_._1._1)
      .map { case (v, rs) => v -> rs.map(_._2._2).sum }
    assert(cutsPerVid == Map(1L -> 1L, 2L -> 0L, 3L -> 2L), s"$cutsPerVid")
  }

  test("mm_frames emits exactly FrameCount bounded slices per payload") {
    import org.apache.spark.sql.functions._
    val f = Multimodal.mmFrames(SparkSpec.spark, "/root/testdata/sf0.001")
    val perDoc = f.groupBy("doc_id").count()
      .filter(col("count") =!= Multimodal.FrameCount).count()
    assert(perDoc == 0)
    assert(f.filter(col("frame_len") > Multimodal.FrameSize ||
      col("frame_len") < 0).count() == 0)
    assert(f.filter(length(col("frame_md5")) =!= 32).count() == 0)
  }
}
