package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generalized CEP — the Flink CEP surface the reference programs against
  * (`Pattern.begin(..).next(..).within(..)` + timed-out-partials side
  * output, dwm/UserJumpDetailApp.java:65-96) as one keyed DFA over
  * `flatMapGroupsWithState`, so a user with a pattern the reference never
  * shipped (different steps, more of them, relaxed contiguity) doesn't
  * have to hand-write a new state machine.
  *
  * Semantics (matching Flink CEP):
  *  - `next` = strict contiguity: the immediately-following event must
  *    match the step or the partial dies silently.
  *  - `followedBy` = relaxed contiguity: non-matching events are skipped.
  *  - `within` = the last step must land within `withinSec` of the first
  *    event; a partial that can no longer complete is emitted on the
  *    timed-out side (`matched = false`, like Flink's timeout output).
  *  - No after-match skip: every event may start a new partial (Flink's
  *    default noSkip strategy).
  *
  * Scale: state per key is the list of live partials, each O(1). Strict
  * steps bound that list at O(pattern length); relaxed patterns are
  * bounded by `maxPartials` (oldest partials force-expire onto the
  * timeout side — the state-blowup guard for hot keys). One shuffle (the
  * groupByKey), event-time timeouts prune state by watermark — the same
  * cost model as the hand-written bounce machine.
  *
  * Batch/stream parity: both [[run]] and [[runBatch]] drive the SAME
  * [[advance]] DFA, so the batch twin is the oracle for the streaming
  * path by construction (CepSpec pins it; the bounce pattern reproduces
  * StatefulStreams.bounces exactly).
  */
object Cep {
  import StatefulStreams.{micros, sorted, toEvents, Event}

  sealed trait Contiguity extends Serializable
  case object Strict extends Contiguity
  case object Relaxed extends Contiguity

  case class Step(name: String, pred: Event => Boolean, contiguity: Contiguity)

  case class Pattern(steps: Vector[Step], withinSec: Long = 0L,
      maxPartials: Int = 128) {
    def next(name: String)(pred: Event => Boolean): Pattern =
      copy(steps = steps :+ Step(name, pred, Strict))
    def followedBy(name: String)(pred: Event => Boolean): Pattern =
      copy(steps = steps :+ Step(name, pred, Relaxed))
    /** Flink's `times(n)` quantifier: the LAST step must occur n times
      * (under its own contiguity — strict repeats for `next`/`begin`
      * steps, gap-tolerant for `followedBy`). Pure expansion sugar: the
      * DFA sees n copies of the step, so state stays O(pattern). */
    def times(n: Int): Pattern = {
      require(steps.nonEmpty, "times() needs a preceding step")
      require(n >= 1, "times(n) needs n >= 1")
      val last = steps.last
      copy(steps = steps ++ Vector.tabulate(n - 1)(i =>
        last.copy(name = s"${last.name}#${i + 2}")))
    }
    def within(sec: Long): Pattern = copy(withinSec = sec)
    private[Cep] def withinUs: Long = withinSec * 1000000L
  }

  object Pattern {
    def begin(name: String)(pred: Event => Boolean): Pattern =
      Pattern(Vector(Step(name, pred, Strict)))
  }

  /** One emission: a completed match (`matched = true`, all steps) or a
    * timed-out partial (`matched = false`, `steps_matched` < pattern
    * length — Flink's timeout side output). */
  case class CepMatch(user_id: Long, first_event_id: Long, last_event_id: Long,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp,
      steps_matched: Int, matched: Boolean)

  /** A live partial match (the keyed state element). */
  case class Partial(firstId: Long, startUs: Long, startTs: java.sql.Timestamp,
      lastId: Long, lastTs: java.sql.Timestamp, nMatched: Int)

  private def timeoutOf(p: Partial, uid: Long): CepMatch =
    CepMatch(uid, p.firstId, p.lastId, p.startTs, p.lastTs, p.nMatched, matched = false)

  private def matchOf(p: Partial, uid: Long): CepMatch =
    CepMatch(uid, p.firstId, p.lastId, p.startTs, p.lastTs, p.nMatched, matched = true)

  /** Advance the DFA over one SORTED slice of a key's events. A partial
    * whose window has closed times out; otherwise the awaited step either
    * consumes the event (completing the match on the last step), ignores
    * it (relaxed), or kills the partial (strict). Every event may then
    * open a new partial. Returns (emissions, surviving partials). */
  private[streaming] def advance(pattern: Pattern, partials0: List[Partial],
      evs: Seq[Event]): (List[CepMatch], List[Partial]) = {
    val withinUs = pattern.withinUs
    val k = pattern.steps.length
    val out = scala.collection.mutable.ListBuffer.empty[CepMatch]
    var partials = partials0
    evs.foreach { e =>
      val us = micros(e.ts)
      val (expired, alive) = partials.partition(p => us - p.startUs > withinUs)
      expired.foreach(p => out += timeoutOf(p, e.user_id))
      partials = alive.flatMap { p =>
        val step = pattern.steps(p.nMatched)
        if (step.pred(e)) {
          val np = p.copy(lastId = e.event_id, lastTs = e.ts, nMatched = p.nMatched + 1)
          if (np.nMatched == k) { out += matchOf(np, e.user_id); None }
          else Some(np)
        } else step.contiguity match {
          case Strict  => None
          case Relaxed => Some(p)
        }
      }
      if (pattern.steps(0).pred(e)) {
        val p0 = Partial(e.event_id, us, e.ts, e.event_id, e.ts, 1)
        if (k == 1) out += matchOf(p0, e.user_id) else partials = partials :+ p0
      }
      if (partials.length > pattern.maxPartials) {
        val drop = partials.length - pattern.maxPartials
        partials.take(drop).foreach(p => out += timeoutOf(p, e.user_id))
        partials = partials.drop(drop)
      }
    }
    (out.toList, partials)
  }

  /** Streaming CEP: requires `withWatermark` on ts upstream (the timeout
    * side fires off the event-time watermark, exactly like
    * StatefulStreams.bounces). Keys whose partials' windows are still
    * open at the final watermark stay pending — live-stream semantics. */
  def run(events: DataFrame, pattern: Pattern): DataFrame = {
    require(pattern.withinSec > 0, "pattern needs .within(sec)")
    require(pattern.steps.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    val withinUs = pattern.withinUs
    toEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[List[Partial]]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val wmMs = state.getCurrentWatermarkMs()
            val (expired, alive) = state.get
              .partition(p => (p.startUs + withinUs) / 1000L < wmMs)
            if (alive.isEmpty) state.remove()
            else {
              state.update(alive)
              state.setTimeoutTimestamp(alive.map(p => (p.startUs + withinUs) / 1000L).min)
            }
            expired.map(timeoutOf(_, uid)).iterator
          } else {
            val (out, partials) =
              advance(pattern, state.getOption.getOrElse(Nil), sorted(it))
            if (partials.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(partials)
              state.setTimeoutTimestamp(partials.map(p => (p.startUs + withinUs) / 1000L).min)
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** Batch twin: the same DFA over each key's full history. End-of-data
    * handling for still-open partials: with `cutoffMs = None` (batch
    * truth) every unfinished partial times out; with `Some(wm)` (stream
    * parity) only partials whose deadline the final watermark passed —
    * the same rule every stream_* gate oracle applies. */
  def runBatch(events: DataFrame, pattern: Pattern,
      cutoffMs: Option[Long] = None): DataFrame = {
    require(pattern.withinSec > 0, "pattern needs .within(sec)")
    val spark = events.sparkSession
    import spark.implicits._
    val withinUs = pattern.withinUs
    toEvents(events)
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[Event]) =>
        val (out, partials) = advance(pattern, Nil, sorted(it))
        val tails = partials
          .filter(p => cutoffMs.forall(wm => (p.startUs + withinUs) / 1000L < wm))
          .map(timeoutOf(_, uid))
        (out ++ tails).iterator
      }
      .toDF()
  }
}
