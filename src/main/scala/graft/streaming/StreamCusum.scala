package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live level-shift dating over an events landing directory — the
  * streaming twin of q149's CUSUM changepoint. The batch statistic
  * needs every day's count, but the counts are a MERGEABLE summary
  * (per-day sums), so the stream keeps exactly one counter row per
  * day — state bounded by the CALENDAR SPAN, which grows with time,
  * never with event volume — and the exact integer CUSUM scan runs
  * driver-side over that ≤|days|-row table on every read, the same
  * place q149 pays a |days|-row prefix scan.
  *
  * The mergeable-summary contract (the StreamSketch pattern):
  * [[dailyCounts]] is ONE declarative aggregation that runs unchanged
  * over a batch events frame or the file stream (`complete` output IS
  * the counter table), and [[changepoint]] reproduces q149's
  * arithmetic token-for-token — CusumStreamSpec gates the fold
  * against the batch query's own output, so stream ≡ batch is a
  * cross-gate, not a re-derivation. */
object StreamCusum {

  /** Per-day event counts (day = epoch-nanos ts div 86400e9, the
    * q149 bucketing): (day, n). A streaming aggregation with one
    * counter row per day; works on batch and streaming frames
    * alike. */
  def dailyCounts(events: DataFrame): DataFrame =
    events.select(expr("ts div 86400000000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))

  /** The live counter table over event batches landing in
    * `landingDir` (schema detected from a footer; `EventsStream`
    * normalizes ts to epoch nanos for either physical shape).
    * Returns the unstarted streaming DataFrame of (day, n); callers
    * pick sink/trigger/output mode (`complete`). */
  def countsStream(spark: SparkSession, landingDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    dailyCounts(EventsStream.readStream(spark, landingDir,
      maxFilesPerTrigger))

  /** q149's exact integer CUSUM scan over a (day, n) counter table:
    * Some(n_days, n_events, cp_day, cusum_peak, mean_before_e3,
    * mean_after_e3) at the peak of |n_days·S_k − k·N| (ties → the
    * earliest day; candidates need a non-empty tail, so a 0- or
    * 1-day table dates no shift and returns None). BigInt internals
    * — the q114 widening rule, same as the query's DECIMAL(38,0). */
  def changepoint(counts: Seq[(Long, Long)])
      : Option[(Long, Long, Long, Long, Long, Long)] = {
    counts.foreach { case (d, n) =>
      require(n >= 0, s"negative day count for day $d") }
    val sorted = counts.sortBy(_._1)
    val nDays = sorted.size.toLong
    val nEvents = sorted.map(_._2).sum
    if (nDays < 2) return None
    var cum = 0L
    var best: Option[(BigInt, Long, Long, Long)] = None // stat, day, k, s
    for (((day, n), i) <- sorted.zipWithIndex if i < sorted.size - 1) {
      cum += n
      val k = i + 1L
      val stat = (BigInt(nDays) * cum - BigInt(k) * nEvents).abs
      if (best.forall { case (b, bd, _, _) =>
          stat > b || (stat == b && day < bd) })
        best = Some((stat, day, k, cum))
    }
    best.map { case (stat, day, k, s) =>
      (nDays, nEvents, day, stat.toLong,
        (BigInt(s) * 1000 / k).toLong,
        (BigInt(nEvents - s) * 1000 / (nDays - k)).toLong)
    }
  }
}
