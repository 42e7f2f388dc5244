package graft.operators

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, and run decode/feature-extraction as a
  * batched partition-local transform (`mapPartitions`) — the Scala
  * analogue of a pandas/Arrow batch UDF: one iterator per partition,
  * work done in fixed-size batches, no shuffle.
  *
  * The decode step is real for the formats the JVM ships codecs for
  * (PNG/BMP/GIF/JPEG via `javax.imageio`, no native deps); payloads
  * that aren't decodable images — e.g. the text-as-binary test corpus —
  * fall back to a clearly-marked deterministic STUB so the pipeline
  * stays testable end-to-end, and so the DuckDB oracle (which can't
  * decode images) remains exact on that corpus. Audio/video decode
  * would slot into the same branch point.
  */
object Multimodal {

  val BatchSize = 64

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("fp", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** Decode one payload → (fingerprint, width, height, n_frames).
    * Real path: `javax.imageio` still-image decode (n_frames = 1).
    * STUB fallback for undecodable bytes: deterministic fake features
    * derived from the raw bytes (length-mod dimensions). */
  private[operators] def decode(bytes: Array[Byte]): (String, Int, Int, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val fp = md.digest(bytes).map("%02x".format(_)).mkString
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img != null) (fp, img.getWidth, img.getHeight, 1L)
    else {
      // STUB: fake "decoded dimensions" and "sampled frame count"
      val n = bytes.length.toLong
      (fp, (n % 640).toInt, (n % 480).toInt, n / 100)
    }
  }

  /** Batched decode of any (doc_id, payload: binary) relation. */
  def features(bin: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    bin.mapPartitions { it =>
      // batched iteration — the shape a vectorized decoder needs
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          val (fp, w, h, frames) = decode(payload)
          Row(id, payload.length.toLong, fp, w, h, frames)
        }
      }
    }(enc)
  }

  /** mm_features: documents.text re-cast as an opaque binary payload
    * (the test corpus ships no real media; ImageSpec feeds `features`
    * a real PNG), then batch-decoded. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    features(Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      // media work is CPU-bound per item: spread batches evenly
      .repartition(col("doc_id")))
      .orderBy(col("doc_id"))

  /** The test-corpus payloads are not decodable images, so the stub
    * branch's md5/length-derived features state the oracle exactly. */
  val mmFeaturesOracle: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS fp,
      |  CAST(strlen(text) % 640 AS INT) AS width,
      |  CAST(strlen(text) % 480 AS INT) AS height,
      |  CAST(strlen(text) // 100 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin
}
