package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as an EXPLICIT state machine over
  * `flatMapGroupsWithState` — the custom-state streaming path the built-in
  * `session_window` (EventWindows.sessions / s03) cannot express when the
  * per-session statistic needs ordered iteration over the events. One step
  * function drives BOTH modes:
  *
  *  - batch: each user's whole history arrives in one invocation with empty
  *    state — the function sorts, walks, and emits every closed session;
  *  - streaming: micro-batches arrive in event-time order per user, state
  *    carries the open session across batches, closed sessions emit as the
  *    gap that closes them arrives.
  *
  * End-of-input is signalled by a SENTINEL event at ts = Long.MaxValue per
  * user: its arrival forces the real last session closed (the sentinel's own
  * 1-event "session" stays open in state and is never emitted). Batch and
  * streaming runs over the same events + sentinels therefore emit the SAME
  * session multiset — StreamingSpec asserts it, the s12 catalog entry
  * hash-checks the batch side against a gaps-and-islands oracle.
  *
  * Scale posture: state per key is ONE OpenSession (3 longs) regardless of
  * history length — the at-100 TB dimension is distinct users, not events.
  * The sort inside a step is over one user's events in one batch (bounded by
  * per-user per-batch volume, the same boundedness `session_window` needs
  * for its own per-key merge).
  */
object Sessionize {

  /** Session gap: a pause of ≥ this closes the session (same convention as
    * `session_window` / s03: the window spans [ts, ts+gap)). */
  val GapUs: Long = 30L * 60 * 1000000

  val SentinelTs: Long = Long.MaxValue

  case class EvRow(user_id: Long, tu: Long, event_id: Long)
  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Int)
  case class SessionOut(user_id: Long, n_events: Int, span_min: Long)

  /** One state-machine step: merge this batch's (sorted) events into the
    * open session, emit sessions closed by observed gaps. */
  def step(uid: Long, events: Iterator[EvRow],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toArray.sortBy(e => (e.tu, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    var open: OpenSession = if (state.exists) state.get else null
    sorted.foreach { e =>
      if (open == null) {
        open = OpenSession(e.tu, e.tu, 1)
      } else if (e.tu - open.lastUs >= GapUs) {
        out += SessionOut(uid, open.nEvents,
          (open.lastUs - open.startUs) / 60000000L)
        open = OpenSession(e.tu, e.tu, 1)
      } else {
        // max guard: a late event straddling micro-batches (e.tu <
        // open.lastUs — sorted within a batch, but batch N+1 can deliver
        // an event older than batch N's frontier) must not move the
        // session frontier BACKWARDS, or a later in-order event could see
        // a fabricated >= GapUs gap and split one real session in two.
        // The late event still counts into the open session (it is within
        // gap range of the frontier by the branch condition).
        open = OpenSession(open.startUs, math.max(open.lastUs, e.tu),
          open.nEvents + 1)
      }
    }
    if (open != null) state.update(open)
    out.iterator
  }

  /** Apply the state machine (batch or streaming Dataset alike). Callers
    * append the per-user sentinel first — see [[withSentinels]]. */
  def sessions(events: Dataset[EvRow]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Events + one end-of-input sentinel per user (batch side). */
  def withSentinels(spark: SparkSession, events: Dataset[EvRow]): Dataset[EvRow] = {
    import spark.implicits._
    events.unionByName(
      events.map(_.user_id).distinct()
        .map(u => EvRow(u, SentinelTs, Long.MaxValue)))
  }
}
