package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Audio as the third modality — mm_* covers image (phash) and video
  * (scene cuts); this is the chromaprint-style acoustic fingerprint
  * + near-duplicate detection that completes the pillar (the shape
  * of Chromaprint/AcoustID: spectral band energies per overlapping
  * frame → per-frame bit codes from energy gradients → match by
  * Hamming distance over the code sequence).
  *
  * Deterministic integer pipeline (no FFT floats — every engine-
  * visible number is exact):
  *  - PCM decode: payloads are 16-bit little-endian mono PCM blobs;
  *    the engine PARSES THE BYTES in a batched `mapPartitions`
  *    kernel (the real decode surface — the oracle never sees the
  *    bytes, so a parse defect diverges the two, the mm_decode
  *    discipline);
  *  - frames of [[FrameLen]] samples at hop [[FrameHop]] (50%
  *    overlap, the standard acoustic framing);
  *  - the "integer DCT": a WALSH–HADAMARD transform per frame (pure
  *    adds/subtracts — the canonical exact stand-in for a spectral
  *    transform), coefficients grouped into [[Bands]] bands, band
  *    energy = Σ|coefficient|;
  *  - 32-bit frame code, chromaprint-style gradient signs: bit b =
  *    [e(b) > e(b+1 mod 16)] (spectral gradient), bit 16+b =
  *    [e(b) > e_prev(b)] (temporal gradient; frame 0 compares
  *    against zeros);
  *  - dedup: candidates = clip pairs sharing an EXACT code at the
  *    same frame index (the phash banded-equi-join idea with the
  *    frame code as the band), confirmed by total Hamming distance
  *    over aligned frame codes ≤ [[AudioMaxHam]].
  *
  * The synthetic corpus ([[AudioClips]]) plants the three cases a
  * byte fingerprint cannot triage: variant 1 = audible small edit
  * (near-dup, measured Hamming 6–9 here), variant 2 = +1 DC offset
  * (byte-different, fingerprint near-identical — measured Hamming
  * 0–1, the "re-encoded copy"), distinct seeds = unrelated clips
  * (no candidate band collision, no output pair).
  *
  * 100 TB posture: decode+fingerprint is map-only over payload
  * splits (PCM bytes never ride a shuffle — only 8-byte codes do);
  * candidates come from an equi-join on (frame_idx, code), never
  * all-pairs; confirm is one xor/popcount per aligned frame. The
  * oracle holds the closed-form frame codes as constants (computed
  * from the synthesis formula WITHOUT the byte round-trip) and
  * re-derives the full candidate/confirm pipeline in SQL. */
object Audio {

  val FrameLen = 256
  val FrameHop = 128
  val ClipSamples = 1024 // → 7 frames
  val Bands = 16
  val AudioMaxHam = 12

  /** (clip_id, synth seed, variant): 0 = base, 1 = small audible
    * edit, 2 = +1 DC offset (inaudible, byte-different). */
  val AudioClips: Seq[(Long, Long, Int)] = Seq(
    (1L, 10L, 0), (2L, 10L, 1), (3L, 10L, 2),
    (4L, 20L, 0), (5L, 20L, 1),
    (6L, 30L, 0), (7L, 30L, 2),
    (8L, 40L, 0), (9L, 50L, 0))

  /** Integer synth: two square waves (seed-dependent periods and
    * amplitudes) plus a hash-noise floor; variant 1 adds a +40 pulse
    * every 7th sample (audible), variant 2 a +1 DC offset. */
  private[operators] def sample(seed: Long, variant: Int, i: Int): Int = {
    def square(period: Int, amp: Int): Int =
      if ((i / period) % 2 == 0) amp else -amp
    val noise = (((seed * 2654435761L + i.toLong * 40503L) >>> 3)
      & 0xffL).toInt - 128
    val base = square(2 + (seed % 5).toInt, 600) +
      square(8 + (seed % 11).toInt, 1200) + noise
    base + (if (variant == 1 && i % 7 == 0) 40 else 0) +
      (if (variant == 2) 1 else 0)
  }

  /** In-place integer Walsh–Hadamard transform (adds/subs only). */
  private[operators] def wht(a: Array[Long]): Unit = {
    var h = 1
    while (h < a.length) {
      var i = 0
      while (i < a.length) {
        var j = i
        while (j < i + h) {
          val x = a(j); val y = a(j + h)
          a(j) = x + y; a(j + h) = x - y
          j += 1
        }
        i += 2 * h
      }
      h *= 2
    }
  }

  /** Frame codes of one sample array — the shared arithmetic path:
    * the engine feeds it parsed PCM, the oracle the synth output. */
  private[operators] def frameCodes(samples: Array[Int]): Seq[Long] = {
    val nFrames = (samples.length - FrameLen) / FrameHop + 1
    val coefsPerBand = FrameLen / Bands
    var prev = Array.fill(Bands)(0L)
    (0 until nFrames).map { f =>
      val buf = Array.tabulate(FrameLen)(k =>
        samples(f * FrameHop + k).toLong)
      wht(buf)
      val e = Array.tabulate(Bands) { b =>
        var s = 0L
        for (k <- b * coefsPerBand until (b + 1) * coefsPerBand)
          s += math.abs(buf(k))
        s
      }
      var code = 0L
      for (b <- 0 until Bands) {
        if (e(b) > e((b + 1) % Bands)) code |= 1L << b
        if (e(b) > prev(b)) code |= 1L << (16 + b)
      }
      prev = e
      code
    }
  }

  /** 16-bit little-endian PCM encode of one clip. The synth must
    * stay inside the 16-bit range OUTRIGHT — [[codesClosedForm]] (and
    * therefore the DuckDB oracle constants) consumes the unencoded
    * sample() output, so a silent clamp here would desynchronize the
    * engine and oracle arms the moment an amplitude bump pushed a
    * sample past the range (it would look like a decode bug). The
    * invariant is enforced, not incidental: an out-of-range synth
    * fails loudly at payload build. */
  private[graft] def pcmBytes(seed: Long, variant: Int): Array[Byte] = {
    val out = new Array[Byte](ClipSamples * 2)
    for (i <- 0 until ClipSamples) {
      val v = sample(seed, variant, i)
      require(v >= Short.MinValue && v <= Short.MaxValue,
        s"synth sample out of 16-bit range: $v (seed=$seed, " +
          s"variant=$variant, i=$i) — pcm encode and codesClosedForm " +
          "would diverge")
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    out
  }

  /** The synthetic clip payloads (clip_id, pcm binary). */
  private[graft] def audioPayloads(s: SparkSession): DataFrame = {
    val rows = AudioClips.map { case (id, seed, variant) =>
      (id, pcmBytes(seed, variant))
    }
    import s.implicits._
    s.createDataset(rows).toDF("clip_id", "payload")
  }

  private val codeSchema: StructType = StructType(Seq(
    StructField("clip_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("code", LongType, nullable = false)))

  /** The decode+fingerprint kernel: parse 16-bit LE PCM from the
    * payload bytes, emit one (clip_id, frame_idx, code) row per
    * frame — batched mapPartitions, the [[Multimodal.features]]
    * plumbing. */
  private[graft] def fingerprint(bin: DataFrame): DataFrame = {
    val enc = Encoders.row(codeSchema)
    bin.toDF("clip_id", "payload")
      .repartition(col("clip_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BatchSize).flatMap { batch =>
          batch.flatMap { row =>
            val bytes = row.getAs[Array[Byte]](1)
            val samples = Array.tabulate(bytes.length / 2) { i =>
              ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            }
            frameCodes(samples).zipWithIndex.map { case (c, f) =>
              Row(row.getLong(0), f.toLong, c)
            }
          }
        }
      }(enc)
  }

  /** mm_audio_dedup: fingerprint every clip, find pairs sharing an
    * exact frame code at the same index, confirm by total Hamming
    * over the aligned code sequence; returns
    * (clip_a, clip_b, n_frames, hamming). */
  def mmAudioDedup(s: SparkSession, dir: String): DataFrame = {
    val codes = fingerprint(audioPayloads(s))
      .localCheckpoint(false) // candidate join + both confirm sides
    val cands = codes.alias("a")
      .join(codes.alias("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
          col("a.code") === col("b.code") &&
          col("a.clip_id") < col("b.clip_id"))
      .select(col("a.clip_id").as("clip_a"),
        col("b.clip_id").as("clip_b"))
      .distinct()
    cands
      .join(codes.alias("ca"), col("clip_a") === col("ca.clip_id"))
      .join(codes.alias("cb"),
        col("clip_b") === col("cb.clip_id") &&
          col("ca.frame_idx") === col("cb.frame_idx"))
      .groupBy(col("clip_a"), col("clip_b"))
      .agg(count(lit(1)).as("n_frames"),
        sum(expr("CAST(bit_count(ca.code ^ cb.code) AS BIGINT)"))
          .as("hamming"))
      .filter(col("hamming") <= AudioMaxHam)
      .select(col("clip_a"), col("clip_b"), col("n_frames"),
        col("hamming"))
      .orderBy(col("clip_a"), col("clip_b"))
  }

  /** Closed-form frame codes — [[sample]]→[[frameCodes]] directly,
    * no PCM byte round-trip: the independent arithmetic path. */
  private[operators] lazy val codesClosedForm: Seq[(Long, Long, Long)] =
    AudioClips.flatMap { case (id, seed, variant) =>
      val samples = Array.tabulate(ClipSamples)(sample(seed, variant, _))
      frameCodes(samples).zipWithIndex.map { case (c, f) =>
        (id, f.toLong, c)
      }
    }

  /** Code constants in SQL, the TEMPORAL pipeline re-derived in SQL
    * (the mm_scene_cuts discipline: DuckDB cannot decode PCM, so the
    * oracle holds per-frame constants and recomputes candidates +
    * Hamming confirm from scratch). */
  lazy val mmAudioDedupOracle: String = {
    val rows = codesClosedForm
      .map { case (id, f, c) => s"($id, $f, $c)" }
    s"""WITH codes(clip_id, frame_idx, code) AS (VALUES
       |  ${rows.mkString(",\n  ")}),
       |cand AS (
       |  SELECT DISTINCT a.clip_id AS clip_a, b.clip_id AS clip_b
       |  FROM codes a JOIN codes b
       |    ON a.frame_idx = b.frame_idx AND a.code = b.code
       |      AND a.clip_id < b.clip_id),
       |ham AS (
       |  SELECT clip_a, clip_b, CAST(count(*) AS BIGINT) AS n_frames,
       |    CAST(sum(bit_count(xor(x.code, y.code))) AS BIGINT)
       |      AS hamming
       |  FROM cand
       |  JOIN codes x ON x.clip_id = clip_a
       |  JOIN codes y ON y.clip_id = clip_b
       |    AND y.frame_idx = x.frame_idx
       |  GROUP BY 1, 2)
       |SELECT CAST(clip_a AS BIGINT) AS clip_a,
       |  CAST(clip_b AS BIGINT) AS clip_b, n_frames, hamming
       |FROM ham WHERE hamming <= $AudioMaxHam
       |ORDER BY clip_a, clip_b""".stripMargin
  }
}
