package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based user sessionization over the
  * events stream via `flatMapGroupsWithState` — the
  * `KeyValueGroupedDataset` custom-state surface (SURVEY §7.1
  * phase 2) that windowed aggregation can't express (sessions have
  * data-dependent extents).
  *
  * State per user = the open session; an event within `gapMinutes` of
  * the last one extends it, otherwise the old session is emitted and a
  * new one opens. Event-time timeouts flush sessions whose gap has
  * passed the watermark, so state is bounded.
  */
object Sessionize {

  // event_time carries the watermark (the column must survive the
  // projection for event-time timeouts to be legal)
  case class Ev(user_id: Long, ts_ms: Long, value: Double,
      event_time: java.sql.Timestamp)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, value_cents: Long)

  def sessions(spark: SparkSession, dir: String, gapMinutes: Int = 30)
      : DataFrame = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val events = EventsStream.readStream(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "1 hour")
      .select(col("user_id"), (expr("ts div 1000000")).as("ts_ms"),
        col("value"), col("event_time"))
      .as[Ev]

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[Session]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // gap passed the watermark: close and emit the session
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts_ms, e.value))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val cents = Math.round(e.value * 100)
              open match {
                case Some(s) if e.ts_ms - s.end_ms <= gapMs =>
                  open = Some(s.copy(end_ms = Math.max(s.end_ms, e.ts_ms),
                    n_events = s.n_events + 1,
                    value_cents = s.value_cents + cents))
                case Some(s) =>
                  closed += s
                  open = Some(Session(userId, e.ts_ms, e.ts_ms, 1, cents))
                case None =>
                  open = Some(Session(userId, e.ts_ms, e.ts_ms, 1, cents))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_ms + gapMs)
            }
            closed.result().iterator
          }
      }.toDF()
  }
}
