package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset state-machine form of
  * [[graft.ops.Sessionize.byTimeout]] (for session logic
  * `session_window` can't express: custom eviction, per-session
  * payloads, side outputs).
  *
  * State per user = the open session (start, last ts, event count).
  * Each micro-batch folds its (sorted) events into the state, emits
  * every session it closes, and carries the still-open session
  * forward. Uses event-time order within the batch; across batches
  * relies on source ordering or a watermark-driven re-sort upstream.
  * State boundedness: a CONTINUOUS deployment must run the fold with
  * ProcessingTimeTimeout and evict=true — users silent for the
  * session gap are then evicted by a timeout that closes and emits
  * their open session; without it every user ever seen holds state
  * forever. The drain-once runner below keeps NoTimeout because armed
  * timers block processAllAvailable (and a fully-drained bounded
  * input needs no eviction).
  *
  * The still-open session is ALSO emitted (closed=false) at the end
  * of every micro-batch so a finite input yields the complete session
  * set — which means a multi-batch run appends superseded open-session
  * snapshots. A session's identity is (user_id, start_us) and its
  * (end_us, n_events, closed) columns only ever grow, so consumers
  * collapse snapshots with a groupBy+max — see [[latestSessions]],
  * which [[sessions]] applies before returning.
  */
object StatefulSessionize {

  case class Ev(user_id: Long, tsu: Long)
  case class Open(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, closed: Boolean)

  /** @param evict arm the processing-time eviction timeout (requires
    *              the query to run with ProcessingTimeTimeout; false
    *              only for NoTimeout harnesses testing carry
    *              semantics in isolation). */
  def fold(timeoutUs: Long, evict: Boolean = true)(
      user: Long, events: Iterator[Ev],
      state: GroupState[Open]): Iterator[SessionOut] = {
    // processing-time eviction: a user silent for the session gap can
    // never extend their open session, so close+emit+remove — without
    // this, every user that EVER appeared keeps an Open record
    // forever and state grows without bound on a long-running stream
    if (state.hasTimedOut) {
      val o = state.get
      state.remove()
      return Iterator(SessionOut(user, o.start, o.last, o.n, closed = true))
    }
    val sorted = events.toSeq.sortBy(_.tsu)
    var open = state.getOption
    val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
    sorted.foreach { e =>
      open match {
        case Some(o) if e.tsu - o.last <= timeoutUs =>
          open = Some(o.copy(last = e.tsu, n = o.n + 1))
        case Some(o) =>
          out += SessionOut(user, o.start, o.last, o.n, closed = true)
          open = Some(Open(e.tsu, e.tsu, 1))
        case None =>
          open = Some(Open(e.tsu, e.tsu, 1))
      }
    }
    open match {
      case Some(o) =>
        state.update(o)
        // arm eviction: processing-time stand-in for the event-time
        // gap (assumes bounded arrival lag — the standard trade; an
        // event-time timeout needs a watermark the drain-once runner
        // doesn't define). In the one-batch bench drain the query
        // stops before any timeout batch fires, so results match the
        // batch sessionizer exactly.
        if (evict) state.setTimeoutDuration(math.max(timeoutUs / 1000L, 1L))
        // emit the still-open session too (marked) so a finite input
        // yields the complete session set
        out += SessionOut(user, o.start, o.last, o.n, closed = false)
      case None => state.remove()
    }
    out.iterator
  }

  /** Run over the (static) events parquet as a one-batch stream and
    * return all sessions (closed + final open ones).
    */
  def sessions(spark: SparkSession, sfDir: String,
      timeoutSec: Long = 3600): DataFrame = {
    import spark.implicits._
    val stream = graft.Tables.loadStream(spark, sfDir, "events")
    val evs: Dataset[Ev] = stream
      .select(col("user_id"), expr("ts div 1000").as("tsu"))
      .as[Ev]
    // drain-once runner: NoTimeout/evict=false. Arming processing-
    // time timers makes processAllAvailable BLOCK (measured: the
    // verify drain parks in StreamExecution.processAllAvailable until
    // the earliest timer could fire) — and eviction is pointless on a
    // bounded input that is fully drained and stopped. A continuous
    // deployment runs the SAME fold with ProcessingTimeTimeout and
    // evict=true (unit-tested in StreamingSpec) to bound state.
    val out = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        fold(timeoutSec * 1000000L, evict = false))
    latestSessions(StreamConf.runToTable(spark, out.toDF(),
        "graft_stateful_sessions", "append"))
      .orderBy("user_id", "start_us")
  }

  /** Collapse the append-mode snapshot stream to one row per session:
    * group on the session identity (user_id, start_us) and take the
    * max of each monotone column. A later snapshot of the same session
    * dominates in all three simultaneously, so max == latest state.
    */
  def latestSessions(snapshots: DataFrame): DataFrame =
    snapshots.groupBy("user_id", "start_us")
      .agg(max("end_us").as("end_us"),
        max("n_events").as("n_events"),
        max("closed").as("closed"))
}
