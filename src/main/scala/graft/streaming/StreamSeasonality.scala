package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live hour-of-day seasonality monitoring over an events landing
  * directory — the streaming twin of q147
  * ([[graft.operators.EventStats.q147Seasonality]]): the 24-slot UTC
  * profile a traffic-shape dashboard watches as events land, without
  * waiting for the batch audit.
  *
  * The mergeable-summary contract (the StreamSketch/StreamSrm
  * pattern): [[hodCounts]] is ONE declarative aggregation that runs
  * unchanged over a batch events frame or the file stream — counts
  * per (event_type, hour-of-day) are a streaming aggregation whose
  * state is AT MOST 24 × |types| counter rows, bounded by the type
  * vocabulary forever, and `complete` output IS the histogram. hod
  * is the same pure-integer `(ts div 3600e9) % 24` as the batch
  * query — no timezone/calendar function on either path.
  *
  * [[peaks]] is the exact q147 report fold over that table (peak
  * slot with ties to the earliest hour, share and uniform-lift in
  * truncating ppm — BigInt so the ×10⁶ products cannot wrap) — a
  * driver-side fold over ≤ 24·|types| rows, the one place a collect
  * is the right plan. SeasonalityStreamSpec CROSS-GATES the fold
  * against the batch query's own output on the same corpus, so the
  * stream can never drift from the audited batch semantics. */
object StreamSeasonality {

  /** Per-(type, hour-of-day) event counts: (event_type, hod, cnt).
    * Input must carry the normalized epoch-nanos BIGINT `ts` (use
    * [[EventsStream.readStream]]/[[EventsStream.readBatch]]). Works
    * on batch and streaming frames alike. */
  def hodCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      expr("(ts div 3600000000000) % 24").as("hod"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("cnt"))

  /** The live histogram over event batches landing in `landingDir`.
    * Returns the unstarted streaming DataFrame of (event_type, hod,
    * cnt); callers pick sink/trigger/output mode (`complete` — the
    * result IS the histogram). */
  def countsStream(spark: SparkSession, landingDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    hodCounts(EventsStream.readStream(spark, landingDir,
      maxFilesPerTrigger))

  /** The q147 report over a histogram table: per type (event_type,
    * n_events, peak_hod, peak_count, peak_share_ppm,
    * uniform_lift_ppm), sorted by type — identical arithmetic to the
    * batch query (peak by (cnt desc, hod asc); truncating ppm
    * division). */
  def peaks(counts: Seq[(String, Long, Long)])
      : Seq[(String, Long, Long, Long, Long, Long)] =
    counts.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      require(rows.forall(r => r._2 >= 0 && r._2 < 24 && r._3 >= 0),
        s"malformed histogram row for $t")
      val n = rows.map(_._3).sum
      val (_, peakHod, peakCnt) =
        rows.minBy { case (_, hod, cnt) => (-cnt, hod) }
      // all-zero histogram (allowed by the require): report 0 share
      // and 0 lift rather than dividing by zero — the
      // StreamBenford.report convention
      val share =
        if (n == 0) 0L else (BigInt(peakCnt) * 1000000 / BigInt(n)).toLong
      val lift =
        if (n == 0) 0L else (BigInt(peakCnt) * 24000000 / BigInt(n)).toLong
      (t, n, peakHod, peakCnt, share, lift)
    }
}
