package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming sessionization over the events table — the
  * streaming-native equivalent of [[graft.ops.Sessionize.byTimeout]]
  * (the reference is batch-only; SURVEY §2b marks this as the
  * streaming extension). Uses `session_window` (event-time gap
  * sessionization) over a file stream; for custom state machines the
  * alternative is `flatMapGroupsWithState`.
  *
  * Semantics note: `session_window` windows are half-open, so a gap
  * of EXACTLY the timeout starts a new session (batch `byTimeout`
  * uses strict `>`); with microsecond timestamps the difference is
  * measure-zero.
  */
object StreamingSessionize {

  /** Run the stream to completion over the (static) events parquet and
    * return per-session counts: (user_id, start_us, n_events).
    */
  def sessionCounts(spark: SparkSession, sfDir: String,
      gapSeconds: Long = 3600): DataFrame = {
    val stream = graft.Tables.loadStream(spark, sfDir, "events")
    val withTs = stream
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
    val agg = withTs
      .groupBy(session_window(col("ets"), s"$gapSeconds seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    StreamConf.runToTable(spark, agg, "graft_stream_sessions", "complete")
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")
  }
}
