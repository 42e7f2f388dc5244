package graft.operators

import java.security.MessageDigest

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
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked STUB (`stubDecode`) producing deterministic fake
  * features from the bytes; everything Spark-side — binary schema,
  * partitioning, batch shape, output encoding — is real. Swapping
  * `stubDecode` for a JNI/codec call is the only change needed at
  * scale.
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

  /** STUB decoder: stands in for image/audio decode + resize +
    * frame-sampling. Deterministic fake features derived from the raw
    * bytes so the pipeline is testable end-to-end without codecs. */
  private def stubDecode(bytes: Array[Byte]): (String, Int, Int, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val fp = md.digest(bytes).map("%02x".format(_)).mkString
    val n = bytes.length.toLong
    // fake "decoded dimensions" and "sampled frame count"
    ((fp), (n % 640).toInt, (n % 480).toInt, n / 100)
  }

  /** mm_features: documents.text re-cast as an opaque binary payload
    * (the container ships no real media), then batch-"decoded". */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val bin = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      // media work is CPU-bound per item: spread batches evenly
      .repartition(col("doc_id"))
    val enc = Encoders.row(featureSchema)
    bin.mapPartitions { it =>
      // batched iteration — the shape a vectorized decoder needs
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          val (fp, w, h, frames) = stubDecode(payload)
          Row(id, payload.length.toLong, fp, w, h, frames)
        }
      }
    }(enc).orderBy(col("doc_id"))
  }

  /** The stub features are md5/length-derived, so the oracle can state
    * them in SQL exactly. */
  val mmFeaturesOracle: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS fp,
      |  CAST(strlen(text) % 640 AS INT) AS width,
      |  CAST(strlen(text) % 480 AS INT) AS height,
      |  CAST(strlen(text) // 100 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin
}
