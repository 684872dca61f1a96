package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization as pure window expressions.
  *
  * The reference implements sessionization as hand-written
  * per-partition kernels after a manual shuffle+sort
  * (`gpu_bdb/bdb_tools/sessionization.py:54-97`: sort by (user, ts),
  * flag a boundary on user-change or `ts.diff() > timeout`, then
  * repeat-fill incrementing ids). In Spark the whole pattern is
  * `Window.partitionBy(user).orderBy(ts)`: the required hash exchange
  * + in-partition sort are planned automatically, whole-stage codegen
  * applies, and AQE can split a skewed heavy-hitter user shuffle.
  *
  * Timestamps are integral (epoch nanos) so all arithmetic is exact.
  *
  * 100 TB note: one shuffle by `user`, then every derived column
  * (session ids, boundary timestamps, lookbacks) reuses the same
  * partitioning/sort — no second exchange. That matches the
  * reference's single `DISTRIBUTE BY` discipline
  * (`queries/q02/gpu_bdb_query_02_dask_sql.py:46`).
  */
object Sessionize {

  /** Timeout sessionization (reference S2,
    * `bdb_tools/sessionization.py:62-67`): a new session starts at the
    * first event of a user or when the gap since the previous event
    * exceeds `timeout` (same units as `ts`). Adds `session_seq`, a
    * 1-based per-user session index.
    */
  def byTimeout(df: DataFrame, user: String, ts: String, tie: String,
      timeout: Long): DataFrame = {
    val clash = Seq("_prev_ts", "_new_s", "session_seq")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"byTimeout: input collides with reserved/output names: $clash")
    val w = Window.partitionBy(user).orderBy(ts, tie)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prev_ts", lag(col(ts), 1).over(w))
      .withColumn("_new_s",
        when(col("_prev_ts").isNull ||
          col(ts) - col("_prev_ts") > timeout, 1).otherwise(0))
      .withColumn("session_seq", sum(col("_new_s")).over(run))
      .drop("_prev_ts", "_new_s")
  }

  /** Event-boundary sessionization (reference S5,
    * `bdb_tools/q08_utils.py:92-160`): the session id is the timestamp
    * of the most recent boundary event (e.g. a "review" page view).
    * Adds `boundary_ts` (null until the user's first boundary event).
    */
  def byBoundaryEvent(df: DataFrame, user: String, ts: String, tie: String,
      isBoundary: Column): DataFrame = {
    require(!df.columns.contains("boundary_ts"),
      "byBoundaryEvent: input already has the output column boundary_ts")
    val run = Window.partitionBy(user).orderBy(ts, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("boundary_ts",
      max(when(isBoundary, col(ts))).over(run))
  }

  /** Session-scoped pair generation (reference S4,
    * `bdb_tools/sessionization.py:112-128`): distinct values of `item`
    * per (user, session), all ordered pairs `item_1 < item_2`.
    *
    * Implemented as ONE aggregation pass — `collect_set` per session,
    * then the [[graft.expressions.ArrayPairs]] Generator expands the
    * sorted set into its ordered index pairs — instead of the
    * textbook distinct + self-join. The self-join form plans the
    * sessionized input twice (two window sorts off a reused exchange)
    * plus a join exchange; this form reuses the sessionization's
    * hash(user) partitioning for the groupBy (no new shuffle:
    * ClusteredDistribution(user, session) is satisfied by
    * HashPartitioning(user)) and the pair expansion is pure per-row
    * compute with no intermediate arrays (the composed
    * flatten/transform/slice form evaluates interpreted lambdas —
    * ~2x slower on the pair stage at BDB sf30). Per-session
    * distinct-item counts are small (categories / event types), so
    * the collected sets stay tiny; the quadratic pair output is
    * identical to the self-join's.
    */
  def sessionPairs(sessionized: DataFrame, user: String, session: String,
      item: String): DataFrame =
    sessionized
      .groupBy(col(user), col(session))
      .agg(sort_array(collect_set(col(item))).as("_items"))
      .select(graft.expressions.ArrayPairs.array_pairs(col("_items"))
        .as(Seq("item_1", "item_2")))
}
