package graft.operators

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  /** Container sniff before the decoder: PNG/JPEG/GIF/BMP magic bytes.
    * A production media pipeline never hands a payload to a decoder
    * without this — `ImageIO.read` runs a registered-reader scan per
    * call, and paying it for every non-image payload was a measurable
    * slice of the 100× corpus run. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M'))

  private[operators] def decode(bytes: Array[Byte]): (String, Int, Int, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val fp = md.digest(bytes).map("%02x".format(_)).mkString
    val img =
      if (!looksLikeImage(bytes)) null
      else try ImageIO.read(new ByteArrayInputStream(bytes))
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
    // media work is CPU-bound per item: spread ONLY when the scan has
    // fewer splits than cores (single-row-group bench corpora) — an
    // unconditional repartition shuffled the full payload bytes, a
    // ~1 GB round-trip at the 100× corpus that the splittable layout
    // never needed
    features(Tables.spread(Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))))
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

  val FrameCount = 4
  val FrameSize = 256

  /** mm_frames: video-style frame sampling — slice [[FrameCount]]
    * fixed-size windows at even strides from each opaque payload and
    * fingerprint each. The plumbing is the real thing a video pipeline
    * needs at 100 TB: a generator (posexplode) turns one payload row
    * into bounded frame rows INSIDE the projection (no shuffle), rows
    * stay narrow (offset + md5, never the frame bytes), and the slice
    * arithmetic is pure per-row — linear in input splits. A real
    * container format would swap the stride slicer for a keyframe
    * index; the partitioning/explode shape is identical. */
  def mmFrames(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n_bytes"))
      .withColumn("stride", expr(s"n_bytes div $FrameCount"))
      .select(col("doc_id"), col("text"), col("n_bytes"),
        posexplode(expr(s"array_repeat(stride, $FrameCount)"))
          .as(Seq("frame_idx", "st")))
      .select(col("doc_id"), col("text"), col("n_bytes"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx") * col("st") + 1).as("frame_off"))
      .withColumn("frame_md5",
        md5(expr(s"substring(text, frame_off, $FrameSize)")))
      .withColumn("frame_len",
        least(lit(FrameSize.toLong),
          greatest(col("n_bytes") - col("frame_off") + 1, lit(0L))))
      .select(col("doc_id"), col("frame_idx"), col("frame_off"),
        col("frame_len"), col("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val mmFramesOracle: String =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    CAST(strlen(text) AS BIGINT) AS n_bytes,
       |    CAST(strlen(text) // $FrameCount AS BIGINT) AS stride,
       |    unnest(range($FrameCount)) AS frame_idx
       |  FROM documents)
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  frame_idx * stride + 1 AS frame_off,
       |  least($FrameSize, greatest(n_bytes - (frame_idx * stride + 1) + 1, 0))
       |    AS frame_len,
       |  md5(substring(text, CAST(frame_idx * stride + 1 AS INT), $FrameSize))
       |    AS frame_md5
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  // ---- mm_decode: the REAL decode branch under the oracle ----------

  /** (img_id, width, height) of the deterministic PNG corpus. */
  val DecodeImgs: Seq[(Long, Int, Int)] = Seq(
    (1L, 31, 17), (2L, 64, 48), (3L, 5, 3), (4L, 128, 1),
    (5L, 16, 16), (6L, 7, 29))

  /** Deterministic undecodable payloads exercising the stub branch in
    * the same query (ids continue after the images). */
  val DecodeStubs: Seq[(Long, String)] = Seq(
    (7L, "definitely not a png payload"),
    (8L, "another opaque binary blob, 42 bytes long!?"))

  /** The per-pixel ground truth: RGB as a pure function of (img, x, y).
    * Both sides derive from this formula, through DIFFERENT paths — the
    * engine encodes it into real PNG bytes and must get the numbers
    * back through an actual `javax.imageio` decode; the oracle computes
    * them arithmetically (DuckDB cannot decode PNGs), so any decode
    * defect (wrong dims, channel swap, lossy round-trip) hash-fails. */
  private def pixelRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((x * 31 + y * 17 + id * 97) % 256).toInt
    val g = ((x * 13 + y * 41 + id * 53) % 256).toInt
    val b = ((x * 7 + y * 3 + id * 29) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  private def rgbStat(rgb: Int): Long = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    3L * r + 5L * g + 7L * b
  }

  /** Encode one deterministic image to real PNG bytes (lossless RGB888
    * round-trip; the encoder's exact byte stream is irrelevant — only
    * decoded pixels are compared). */
  private[operators] def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, pixelRgb(id, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val decodeSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pix_sum", LongType, nullable = false),
    StructField("real_decode", IntegerType, nullable = false)))

  /** mm_decode: the oracle-gated REAL image decode — payloads are
    * actual PNG byte streams (plus two stub blobs), features are
    * derived from DECODED PIXELS, not payload bytes. Same batched
    * mapPartitions shape as [[features]]; the tiny corpus is the
    * correctness probe, the plumbing (binary column → batch decode →
    * typed features) is the 100 TB path. */
  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    val rows = DecodeImgs.map { case (id, w, h) => (id, pngBytes(id, w, h)) } ++
      DecodeStubs.map { case (id, t) => (id, t.getBytes("UTF-8")) }
    val enc = Encoders.row(decodeSchema)
    import s.implicits._
    s.createDataset(rows).toDF("img_id", "payload")
      .repartition(col("img_id"))
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { row =>
            val id = row.getLong(0)
            val payload = row.getAs[Array[Byte]](1)
            val img =
              try ImageIO.read(new ByteArrayInputStream(payload))
              catch { case _: Exception => null }
            if (img != null) {
              var sum = 0L
              for (x <- 0 until img.getWidth; y <- 0 until img.getHeight)
                sum += rgbStat(img.getRGB(x, y) & 0xffffff)
              Row(id, img.getWidth, img.getHeight, sum, 1)
            } else {
              val n = payload.length
              val sum = payload.map(b => (b & 0xff).toLong).sum
              Row(id, n % 640, n % 480, sum, 0)
            }
          }
        }
      }(enc)
      .orderBy(col("img_id"))
  }

  /** Expected rows computed in closed form from [[pixelRgb]] / the stub
    * math — constants in SQL, real decode work in the engine. */
  val mmDecodeOracle: String = {
    val imgRows = DecodeImgs.map { case (id, w, h) =>
      var sum = 0L
      for (x <- 0 until w; y <- 0 until h) sum += rgbStat(pixelRgb(id, x, y))
      s"($id, $w, $h, $sum, 1)"
    }
    val stubRows = DecodeStubs.map { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val sum = bytes.map(b => (b & 0xff).toLong).sum
      s"($id, ${bytes.length % 640}, ${bytes.length % 480}, $sum, 0)"
    }
    s"""SELECT CAST(img_id AS BIGINT) AS img_id, CAST(width AS INT) AS width,
       |  CAST(height AS INT) AS height, CAST(pix_sum AS BIGINT) AS pix_sum,
       |  CAST(real_decode AS INT) AS real_decode
       |FROM (VALUES ${(imgRows ++ stubRows).mkString(",\n  ")})
       |  AS t(img_id, width, height, pix_sum, real_decode)
       |ORDER BY img_id""".stripMargin
  }

  // ---- mm_phash_dedup: perceptual-hash image near-dup detection ----

  /** Average-hash grid: 8×8 block means → 64 bits. */
  val PhashGrid = 8
  /** Image side for the deterministic phash corpus (4×4-px blocks). */
  val PhashSide = 32
  /** Bands for the Hamming-ball candidate join: 4 × 16 bits. By the
    * pigeonhole principle every pair within Hamming distance ≤ 3
    * shares at least one exact band; larger distances are caught
    * with decreasing probability — the SimHash/MinHash banding
    * trade, here over a 64-bit perceptual fingerprint. */
  val PhashBands = 4
  /** Confirm threshold on the exact Hamming distance of banded
    * candidates. */
  val PhashMaxHam = 6

  /** The deterministic phash corpus: (img_id, pattern_seed, variant).
    * variant 0 = the base pattern, 1 = the base with one corner
    * block brightened (a small edit — the near-dup case a
    * cryptographic fingerprint like mm_features' md5 structurally
    * misses), 2 = a pixel-exact re-encode of the base (the re-saved
    * copy). Distinct seeds are unrelated patterns. */
  val PhashImgs: Seq[(Long, Long, Int)] = Seq(
    (1L, 10L, 0), (2L, 10L, 1), (3L, 10L, 2),
    (4L, 20L, 0), (5L, 20L, 1),
    (6L, 30L, 0), (7L, 30L, 2),
    (8L, 40L, 0), (9L, 50L, 0))

  /** Pixel formula of the phash corpus — [[pixelRgb]] per seed, with
    * variant 1 brightening the top-left [[PhashSide]]/8-px block. */
  private def phashPixel(seed: Long, variant: Int, x: Int, y: Int): Int = {
    val base = pixelRgb(seed, x, y)
    if (variant == 1 && x < PhashSide / PhashGrid &&
        y < PhashSide / PhashGrid) {
      val r = math.min(((base >> 16) & 0xff) + 96, 255)
      val g = math.min(((base >> 8) & 0xff) + 96, 255)
      val b = math.min((base & 0xff) + 96, 255)
      (r << 16) | (g << 8) | b
    } else base
  }

  /** Average-hash of a [[PhashSide]]² image given a pixel getter:
    * integer gray = (r+g+b) div 3, 8×8 block means (integer div),
    * bit k set iff block k ≥ the mean of the 64 block means. Pure
    * integer arithmetic — the engine computes it from DECODED PNG
    * pixels, the oracle from [[phashPixel]] directly, so any decode
    * or hash defect diverges the two. */
  private[operators] def aHash(rgbAt: (Int, Int) => Int): Long = {
    val bs = PhashSide / PhashGrid
    val blocks = Array.tabulate(PhashGrid * PhashGrid) { k =>
      val bx = k % PhashGrid; val by = k / PhashGrid
      var s = 0L
      for (x <- bx * bs until (bx + 1) * bs;
           y <- by * bs until (by + 1) * bs) {
        val p = rgbAt(x, y)
        s += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      }
      s / (bs * bs)
    }
    val mean = blocks.sum / blocks.length
    blocks.zipWithIndex.foldLeft(0L) { case (acc, (b, k)) =>
      if (b >= mean) acc | (1L << k) else acc
    }
  }

  private val phashSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** mm_phash_dedup: perceptual near-duplicate image detection —
    * decode each PNG payload, compute the 64-bit average hash from
    * its PIXELS, band the hash [[PhashBands]]×16 bits, equi-join on
    * (band_idx, band_value) for Hamming-ball candidates (the
    * SimHash band pattern from `Dedup` applied to image space), and
    * confirm candidates by exact Hamming distance ≤ [[PhashMaxHam]]
    * via codegen'd `bit_count(xor)`. Returns (img_a, img_b,
    * hamming), both orders normalized a < b.
    *
    * 100 TB posture: decode+hash is the batched `mapPartitions`
    * kernel (map-only, one pass over payload splits; payload bytes
    * never ride a shuffle — only the 8-byte hash does); candidates
    * come from a BANDED EQUI-JOIN, never all-pairs; the confirm step
    * is one integer xor/popcount per candidate. This is [[features]]'
    * plumbing carried to the operator a media pipeline actually
    * ships: md5 fingerprints catch byte-identical copies only —
    * the re-encoded or slightly-edited duplicate needs exactly this
    * pixel-space hash + banded join. */
  /** Decode PNG payloads and compute the 64-bit average hash — the
    * batched `mapPartitions` kernel, shared by the batch operator
    * and the streaming ingest twin ([[graft.streaming.PhashIngest]]).
    * Input (img_id, payload binary) → (img_id, phash). */
  private[graft] def phashOf(df: DataFrame): DataFrame = {
    val enc = Encoders.row(phashSchema)
    df.toDF("img_id", "payload")
      .repartition(col("img_id"))
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { row =>
            val img = ImageIO.read(
              new ByteArrayInputStream(row.getAs[Array[Byte]](1)))
            Row(row.getLong(0), aHash((x, y) => img.getRGB(x, y) & 0xffffff))
          }
        }
      }(enc)
  }

  /** Band explode of a (img_id, phash, ...) frame: [[PhashBands]]
    * 16-bit windows as (img_id, phash, band, bv).
    * UNSIGNED shift: bit 63 (block 63 ≥ mean) is routinely set, and
    * a signed div/mod would sign-extend the top band. */
  private[graft] def phashBands(hashes: DataFrame): DataFrame =
    hashes.select(col("*"),
      posexplode(expr(s"transform(sequence(0, ${PhashBands - 1})," +
        " j -> shiftrightunsigned(phash, CAST(16 * j AS INT))" +
        " & CAST(65535 AS BIGINT))"))
        .as(Seq("band", "bv")))

  /** The deterministic phash-corpus payloads (img_id, png bytes). */
  private[graft] def phashPayloads(s: SparkSession): DataFrame = {
    val rows = PhashImgs.map { case (id, seed, variant) =>
      (id, phashPngBytes(seed, variant))
    }
    import s.implicits._
    s.createDataset(rows).toDF("img_id", "payload")
  }

  def mmPhashDedup(s: SparkSession, dir: String): DataFrame = {
    val hashes = phashOf(phashPayloads(s))
      .localCheckpoint(false) // band explode + 2 hash-lookup joins
    val bands = phashBands(hashes)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("img_a"), col("b.img_id").as("img_b"),
        col("a.phash").as("ha"), col("b.phash").as("hb"))
      .distinct() // pairs sharing several bands collapse to one
      .withColumn("hamming",
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= PhashMaxHam)
      .select(col("img_a"), col("img_b"), col("hamming"))
      .orderBy(col("img_a"), col("img_b"))
  }

  /** PNG bytes of one phash-corpus image (the [[pngBytes]] shape,
    * [[phashPixel]] formula). */
  private[graft] def phashPngBytes(seed: Long, variant: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(PhashSide, PhashSide,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until PhashSide; y <- 0 until PhashSide)
      img.setRGB(x, y, phashPixel(seed, variant, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The expected phash pair set in closed form — hashes from
    * [[phashPixel]] (no PNG in the loop), the same band + Hamming
    * logic as the engine. Shared by the mm_phash_dedup and q155
    * oracles. */
  /** Closed-form average hashes of the phash corpus — [[phashPixel]]
    * directly, no PNG decode (the independent arithmetic path the
    * oracles and the streaming-twin spec compare the engine
    * against). */
  private[graft] lazy val phashHashesClosedForm: Seq[(Long, Long)] =
    PhashImgs.map { case (id, seed, variant) =>
      id -> aHash((x, y) => phashPixel(seed, variant, x, y))
    }

  private[operators] lazy val phashPairsClosedForm: Seq[(Long, Long, Int)] = {
    val hs = phashHashesClosedForm
    val pairs = for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib
      if (0 until PhashBands).exists(j =>
        ((ha >>> (16 * j)) & 0xffffL) == ((hb >>> (16 * j)) & 0xffffL))
      ham = java.lang.Long.bitCount(ha ^ hb)
      if ham <= PhashMaxHam
    } yield (ia, ib, ham)
    require(pairs.nonEmpty, "phash corpus must plant near-dup pairs")
    pairs
  }

  /** Constants in SQL, real decode work in the engine (the mm_decode
    * oracle discipline). */
  val mmPhashDedupOracle: String = {
    val rows = phashPairsClosedForm
      .map { case (a, b, h) => s"($a, $b, $h)" }
    s"""SELECT CAST(img_a AS BIGINT) AS img_a,
       |  CAST(img_b AS BIGINT) AS img_b,
       |  CAST(hamming AS BIGINT) AS hamming
       |FROM (VALUES ${rows.mkString(",\n  ")})
       |  AS t(img_a, img_b, hamming)
       |ORDER BY img_a, img_b""".stripMargin
  }

  // ---- q155: cross-modal (image ⊕ caption) duplicate triage --------

  /** Caption assignment of the phash corpus: (img_id, caption source
    * doc_id, kept token fraction %). Captions are deterministic
    * prefix truncations of REAL corpus documents (the q153/q154
    * planting trick), arranged so every cross-modal case occurs:
    * same image + same caption (re-post), same image + fresh caption
    * (re-captioned), different image + same caption
    * (re-illustrated). */
  val CaptionDefs: Seq[(Long, Long, Long)] = Seq(
    (1L, 10L, 100L), // base of the edited-image family
    (2L, 10L, 100L), // small image edit, caption kept → both-dup
    (3L, 10L, 40L),  // re-encode, caption rewritten (40% ≈ J<0.5) → image-only
    (4L, 20L, 100L),
    (5L, 11L, 100L), // near-dup image, unrelated caption → image-only
    (6L, 30L, 100L),
    (7L, 30L, 70L),  // re-encode, caption trimmed (70% ≈ J≥0.5) → both-dup
    (8L, 40L, 100L),
    (9L, 40L, 100L)) // unrelated image, identical caption → caption-only

  /** q155: cross-modal duplicate triage over (image, caption) pairs —
    * the curation decision an image+caption training-data pipeline
    * ships: a pair of items is actionable when its IMAGES are
    * perceptual near-dups (banded 64-bit average-hash, Hamming ≤
    * [[PhashMaxHam]] — [[mmPhashDedup]]'s stream) or its CAPTIONS
    * are near-dups (exact shingle Jaccard ≥ 0.5, the `Dedup`
    * threshold), and the ACTION depends on which modality matched:
    * both → `drop_duplicate_pair` (a true re-post, safe to dedup);
    * image only → `review_recaptioned` (same picture, new text — the
    * caption diversity you may want to KEEP for contrastive
    * training); caption only → `review_reillustrated` (same text,
    * new picture). Neither modality alone makes that call — exactly
    * why cross-modal dedup is its own operator and not a union of
    * the two unimodal ones.
    *
    * Plan shape: the image side is [[mmPhashDedup]]'s banded
    * equi-join (pixel decode in the engine); the caption side joins
    * the 9-row caption map against `documents` (broadcast, pruned
    * scan), truncates tokens, and runs one shingle-posting equi-join
    * — never all-pairs on either modality; the combine is ONE
    * full-outer join on the pair key. 100 TB posture: both pair
    * streams are banded/blocked candidate generators with exact
    * confirms, and the full-outer combine is keyed by (a, b) — the
    * same shape at 10⁹ items. */
  def q155CrossmodalDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis.tokens
    val imgPairs = mmPhashDedup(s, dir)
      .select(col("img_a"), col("img_b"), col("hamming"))
    import s.implicits._
    val capMap = s.createDataset(CaptionDefs).toDF("img_id", "cap_doc", "frac")
    val caps = capMap
      .join(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text")), col("cap_doc") === col("doc_id"))
      .select(col("img_id"), tokens(col("text")).as("toks"), col("frac"))
      .select(col("img_id"), concat_ws(" ",
        slice(col("toks"), lit(1),
          expr("greatest(1, CAST((size(toks) * frac + 99) div 100 AS INT))")))
        .as("text"))
    val posts = caps
      .select(col("img_id"), Dedup.shingles(col("text")).as("sh"))
      .select(col("img_id"), size(col("sh")).cast("long").as("sz"),
        explode(col("sh")).as("g"))
    val capPairs = posts
      .select(col("img_id").as("ia"), col("sz").as("sza"), col("g"))
      .join(posts.select(col("img_id").as("ib"), col("sz").as("szb"),
        col("g")), Seq("g"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("sza"), col("ib"), col("szb"))
      .agg(count(lit(1)).as("n_inter"))
      .filter(col("n_inter") * 2 >= col("sza") + col("szb") - col("n_inter"))
      .select(col("ia").as("img_a"), col("ib").as("img_b"),
        expr("n_inter * 1000000 div (sza + szb - n_inter)")
          .as("jacc_e6"))
    imgPairs.as("i")
      .join(capPairs.as("c"), Seq("img_a", "img_b"), "full_outer")
      .select(col("img_a"), col("img_b"),
        when(col("hamming").isNotNull, 1L).otherwise(0L).as("img_dup"),
        when(col("jacc_e6").isNotNull, 1L).otherwise(0L).as("cap_dup"),
        coalesce(col("hamming"), lit(-1L)).as("hamming"),
        coalesce(col("jacc_e6"), lit(-1L)).as("jacc_e6"))
      .withColumn("action",
        when(col("img_dup") === 1L && col("cap_dup") === 1L,
          lit("drop_duplicate_pair"))
          .when(col("img_dup") === 1L, lit("review_recaptioned"))
          .otherwise(lit("review_reillustrated")))
      .orderBy(col("img_a"), col("img_b"))
  }

  val q155CrossmodalDedupOracle: String = {
    import graft.operators.TextAnalysis.tokensSql
    val imgRows = phashPairsClosedForm
      .map { case (a, b, h) => s"($a, $b, $h)" }.mkString(",\n    ")
    val capRows = CaptionDefs
      .map { case (i, d, f) => s"($i, $d, $f)" }.mkString(",\n    ")
    s"""WITH img_pairs AS (
       |  SELECT CAST(img_a AS BIGINT) AS img_a,
       |    CAST(img_b AS BIGINT) AS img_b,
       |    CAST(hamming AS BIGINT) AS hamming
       |  FROM (VALUES $imgRows) t(img_a, img_b, hamming)),
       |caps AS (
       |  SELECT CAST(t.img_id AS BIGINT) AS img_id,
       |    array_to_string(d.toks[1 : greatest(1,
       |      (len(d.toks) * t.frac + 99) // 100)], ' ') AS text
       |  FROM (VALUES $capRows) t(img_id, cap_doc, frac)
       |  JOIN (SELECT doc_id, $tokensSql AS toks FROM documents) d
       |    ON d.doc_id = t.cap_doc),
       |shs AS (
       |  SELECT img_id, ${Dedup.shinglesSql} AS sh FROM caps),
       |posts AS (
       |  SELECT img_id, CAST(len(sh) AS BIGINT) AS sz, unnest(sh) AS g
       |  FROM shs),
       |cap_pairs AS (
       |  SELECT a.img_id AS img_a, b.img_id AS img_b,
       |    CAST(count(*) * 1000000 // (a.sz + b.sz - count(*))
       |      AS BIGINT) AS jacc_e6
       |  FROM posts a JOIN posts b
       |    ON a.g = b.g AND a.img_id < b.img_id
       |  GROUP BY a.img_id, a.sz, b.img_id, b.sz
       |  HAVING count(*) * 2 >= a.sz + b.sz - count(*))
       |SELECT coalesce(i.img_a, c.img_a) AS img_a,
       |  coalesce(i.img_b, c.img_b) AS img_b,
       |  CAST(CASE WHEN i.img_a IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS img_dup,
       |  CAST(CASE WHEN c.img_a IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS cap_dup,
       |  coalesce(i.hamming, -1) AS hamming,
       |  coalesce(c.jacc_e6, -1) AS jacc_e6,
       |  CASE WHEN i.img_a IS NOT NULL AND c.img_a IS NOT NULL
       |    THEN 'drop_duplicate_pair'
       |    WHEN i.img_a IS NOT NULL THEN 'review_recaptioned'
       |    ELSE 'review_reillustrated' END AS action
       |FROM img_pairs i FULL OUTER JOIN cap_pairs c
       |  ON i.img_a = c.img_a AND i.img_b = c.img_b
       |ORDER BY img_a, img_b""".stripMargin
  }

  // ---- mm_scene_cuts: temporal segmentation of a frame stream ------

  /** Hamming threshold separating within-scene jitter from a scene
    * change: consecutive frames of one scene differ by a small moving
    * highlight (≤ a few hash bits); a scene change swaps the whole
    * base pattern (tens of bits). */
  val SceneCutHam = 16

  /** The deterministic frame corpus: (video_id, scenes as (pattern
    * seed, frame count)). Distinct seeds are unrelated patterns —
    * video 1 has one cut, video 2 none, video 3 two. */
  val SceneVids: Seq[(Long, Seq[(Long, Int)])] = Seq(
    (1L, Seq((60L, 4), (61L, 3))),
    (2L, Seq((70L, 5))),
    (3L, Seq((80L, 2), (81L, 2), (82L, 3))))

  /** Per-frame pixels: the scene's base pattern ([[pixelRgb]] per
    * seed) with ONE brightened [[PhashGrid]]-block whose position
    * walks with the global frame index — the intra-scene motion that
    * makes consecutive same-scene hashes near-but-not-equal. */
  private def scenePixel(seed: Long, f: Int, x: Int, y: Int): Int = {
    val base = pixelRgb(seed, x, y)
    val bs = PhashSide / PhashGrid
    val bx = ((f * 3) % PhashGrid) * bs
    val by = ((f * 5) % PhashGrid) * bs
    if (x >= bx && x < bx + bs && y >= by && y < by + bs) {
      val r = math.min(((base >> 16) & 0xff) + 96, 255)
      val g = math.min(((base >> 8) & 0xff) + 96, 255)
      val b = math.min((base & 0xff) + 96, 255)
      (r << 16) | (g << 8) | b
    } else base
  }

  /** (video_id, frame_idx, seed) of every frame, flattened. */
  private lazy val sceneFrames: Seq[(Long, Int, Long)] =
    SceneVids.flatMap { case (vid, scenes) =>
      scenes.flatMap { case (seed, n) => Seq.fill(n)(seed) }
        .zipWithIndex.map { case (seed, f) => (vid, f, seed) }
    }

  /** Closed-form frame hashes — [[scenePixel]] directly, no PNG (the
    * independent arithmetic path the oracle compares the engine's
    * real decode against). Build-time sanity: the corpus must
    * exercise BOTH branches of the cut predicate. */
  private[operators] lazy val sceneHashesClosedForm: Seq[(Long, Int, Long)] = {
    val hs = sceneFrames.map { case (vid, f, seed) =>
      (vid, f, aHash((x, y) => scenePixel(seed, f, x, y)))
    }
    val hams = hs.groupBy(_._1).values.flatMap { fr =>
      fr.sortBy(_._2).sliding(2).collect {
        case Seq((_, _, a), (_, _, b)) => java.lang.Long.bitCount(a ^ b)
      }
    }.toSeq
    require(hams.exists(_ > SceneCutHam) && hams.exists(_ <= SceneCutHam),
      s"scene corpus must plant both cuts and non-cuts; hams=$hams")
    hs
  }

  private val sceneHashSchema: StructType = StructType(Seq(
    StructField("video_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** mm_scene_cuts: shot-boundary detection over a decoded frame
    * stream — decode every frame PNG, hash its PIXELS ([[aHash]]),
    * and date the scene changes: a frame opens a new scene when its
    * perceptual hash is more than [[SceneCutHam]] bits from its
    * predecessor (the Hamming-on-perceptual-hash shot detector —
    * the classic pairwise-dissimilarity formulation of shot-boundary
    * detection, e.g. Boreczky & Rowe 1996, with the frame comparison
    * collapsed to a 64-bit fingerprint). One row per frame:
    * (video_id, frame_idx, hamming, is_cut, scene_idx); frame 0
    * reports hamming = −1 and opens scene 0.
    *
    * 100 TB posture: decode+hash is the batched `mapPartitions`
    * kernel shared with [[mmPhashDedup]] — map-only over frame
    * splits, only the 8-byte hash rides the shuffle; the temporal
    * logic is ONE video-partitioned window (lag + running cut count),
    * never a self-join, so per-video state is O(1) and videos
    * parallelize freely. The oracle holds the closed-form hashes
    * (DuckDB cannot decode PNGs — the mm_decode discipline) but runs
    * the ENTIRE temporal pipeline (lag, xor popcount, cut flag,
    * running scene index) independently in SQL. */
  def mmSceneCuts(s: SparkSession, dir: String): DataFrame = {
    val rows = sceneFrames.map { case (vid, f, seed) =>
      (vid, f.toLong, scenePngBytes(seed, f))
    }
    import s.implicits._
    val enc = Encoders.row(sceneHashSchema)
    val hashes = s.createDataset(rows)
      .toDF("video_id", "frame_idx", "payload")
      .repartition(col("video_id"))
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { row =>
            val img = ImageIO.read(
              new ByteArrayInputStream(row.getAs[Array[Byte]](2)))
            Row(row.getLong(0), row.getLong(1),
              aHash((x, y) => img.getRGB(x, y) & 0xffffff))
          }
        }
      }(enc)
    val byVid = Window.partitionBy(col("video_id"))
      .orderBy(col("frame_idx").asc)
    hashes
      .withColumn("prev", lag(col("phash"), 1).over(byVid))
      .withColumn("hamming",
        when(col("prev").isNull, lit(-1L))
          .otherwise(expr("CAST(bit_count(phash ^ prev) AS BIGINT)")))
      .withColumn("is_cut",
        when(col("hamming") > SceneCutHam, lit(1L)).otherwise(lit(0L)))
      .withColumn("scene_idx", sum(col("is_cut"))
        .over(byVid.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("video_id"), col("frame_idx"), col("hamming"),
        col("is_cut"), col("scene_idx"))
      .orderBy(col("video_id"), col("frame_idx"))
  }

  /** PNG bytes of one scene frame ([[scenePixel]] formula). */
  private[graft] def scenePngBytes(seed: Long, f: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(PhashSide, PhashSide,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until PhashSide; y <- 0 until PhashSide)
      img.setRGB(x, y, scenePixel(seed, f, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Hash constants in SQL, the temporal pipeline re-derived in SQL
    * (decode work stays in the engine). */
  val mmSceneCutsOracle: String = {
    val rows = sceneHashesClosedForm
      .map { case (vid, f, h) => s"($vid, $f, CAST($h AS BIGINT))" }
    s"""WITH h AS (
       |  SELECT CAST(video_id AS BIGINT) AS video_id,
       |    CAST(frame_idx AS BIGINT) AS frame_idx, phash
       |  FROM (VALUES ${rows.mkString(",\n  ")})
       |    t(video_id, frame_idx, phash)),
       |l AS (
       |  SELECT video_id, frame_idx, phash,
       |    lag(phash) OVER (PARTITION BY video_id ORDER BY frame_idx)
       |      AS prev
       |  FROM h),
       |f AS (
       |  SELECT video_id, frame_idx,
       |    CASE WHEN prev IS NULL THEN CAST(-1 AS BIGINT)
       |      ELSE CAST(bit_count(xor(phash, prev)) AS BIGINT) END
       |      AS hamming
       |  FROM l),
       |c AS (
       |  SELECT video_id, frame_idx, hamming,
       |    CASE WHEN hamming > $SceneCutHam THEN CAST(1 AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS is_cut
       |  FROM f)
       |SELECT video_id, frame_idx, hamming, is_cut,
       |  CAST(sum(is_cut) OVER (PARTITION BY video_id ORDER BY frame_idx
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene_idx
       |FROM c
       |ORDER BY video_id, frame_idx""".stripMargin
  }
}
