package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (SURVEY.md §2.6), as
  * `flatMapGroupsWithState` over a typed event stream — the Spark analogue
  * of the reference's keyed ValueState / CEP machinery.
  *
  * Event order: within one micro-batch the group iterator is unordered, so
  * every operator sorts its batch slice by (ts, event_id) before applying
  * its state machine. Across micro-batches, Kafka per-partition order plus
  * the event-time timeouts give the same guarantees the reference gets from
  * Flink's keyed streams + watermarks.
  *
  * Scale: state is O(1) per key (a flag, a date, one pending event) — the
  * shapes that survive hundreds of millions of keys under RocksDB state
  * stores. The shuffle is the groupByKey hash exchange, identical to the
  * reference's keyBy.
  */
object StatefulStreams {

  case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class FlaggedEvent(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String, is_new: Int)

  case class DatedEvent(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String, dt: String)

  private[streaming] def toEvents(df: DataFrame): Dataset[Event] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("event_id", "ts", "user_id", "event_type", "value", "props").as[Event]
  }

  /** Microsecond event time (Timestamp.getTime floors to ms — comparing in
    * ms would disagree with the µs-exact batch oracle on sub-ms gaps). */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def sorted(it: Iterator[Event]): Seq[Event] =
    it.toSeq.sortBy(e => (micros(e.ts), e.event_id))

  /** T1 (dwd/BaseLogApp.java:66-95): first-ever event per key is flagged
    * is_new=1; every later event is rewritten to 0. State: one boolean. */
  def newOldFlag(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    toEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[Boolean]) =>
          val evs = sorted(it)
          val out = evs.zipWithIndex.map { case (e, i) =>
            val isFirstEver = !state.exists && i == 0
            FlaggedEvent(e.event_id, e.ts, e.user_id, e.event_type, e.value,
              e.props, if (isFirstEver) 1 else 0)
          }
          if (evs.nonEmpty) state.update(true)
          out.iterator
      }
      .toDF()
  }

  /** T2 (dwm/UniqueVisitApp.java:50-92): emit the first event per key per
    * calendar day. State: last visit date string, exactly the reference's
    * ValueState<String>; its 24h TTL falls out of the calendar-day
    * comparison (a new day always differs from the stored date). */
  def uvDedup(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    toEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[String]) =>
          var last = state.getOption.getOrElse("")
          val out = scala.collection.mutable.ArrayBuffer.empty[DatedEvent]
          sorted(it).foreach { e =>
            val dt = e.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            if (dt != last) {
              out += DatedEvent(e.event_id, e.ts, e.user_id, e.event_type,
                e.value, e.props, dt)
              last = dt
            }
          }
          if (last.nonEmpty) state.update(last)
          out.iterator
      }
      .toDF()
  }

  /** T3 (dwm/UserJumpDetailApp.java:56-96): bounce detection — the CEP
    * "entry page followed by another entry within N seconds, or timeout"
    * pattern. Spark has no CEP; the same machine is one pending-event state
    * plus an event-time timeout:
    *
    *  - on events (sorted): consecutive gap > gapSec ⇒ the earlier event
    *    was a bounce (the CEP *matched* branch);
    *  - on watermark passing pending.ts + gapSec with no successor ⇒ bounce
    *    (the CEP *timed-out* side output, unioned at :96).
    *
    * Requires `withWatermark` on ts upstream. Emission timing differs from
    * batch only for keys whose last event is within gapSec of the final
    * watermark — those stay pending (exactly Flink's unfinished-window
    * behavior on a live stream). */
  def bounces(events: DataFrame, gapSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    toEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[Event], state: GroupState[Event]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val pending = state.get
            state.remove()
            Iterator.single(pending)
          } else {
            val evs = sorted(it)
            val out = scala.collection.mutable.ArrayBuffer.empty[Event]
            var pending = state.getOption
            evs.foreach { e =>
              pending.foreach { p =>
                if (micros(e.ts) - micros(p.ts) > gapUs) out += p
              }
              pending = Some(e)
            }
            pending.foreach { p =>
              state.update(p)
              // timeouts are ms-granular; floor keeps "fires once the
              // watermark (= floor(max event µs / 1000) - delay) passes"
              // aligned with the µs-exact oracle for whole-second gaps
              state.setTimeoutTimestamp((micros(p.ts) + gapUs) / 1000L)
            }
            out.iterator
          }
      }
      .toDF()
  }
}
