package graft

import org.apache.spark.sql.SparkSession

/** Session-build-time defaults shared by every graft entry point
  * (Bench/Verify/Main/tools/specs).
  *
  * - UTC session timezone: the oracle comparison depends on it.
  * - `nanosAsLong`: the testdata's events.ts is parquet
  *   TIMESTAMP(NANOS), which Spark 4 reads only as raw nanos via this
  *   legacy conf. Declared once here so operator functions stay free of
  *   session-conf side effects (a query must never mutate a shared
  *   SparkSession).
  */
object Sessions {
  def defaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
