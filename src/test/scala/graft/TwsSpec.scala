package graft

import java.time.Duration

import graft.streaming.{StatefulStreams, TwsStreams}
import graft.streaming.StatefulStreams.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** transformWithState twins (TwsStreams): the modern arbitrary-state API
  * must agree bit-for-bit with the FMGWS originals across micro-batch
  * boundaries, and the one capability FMGWS cannot express — per-state
  * TTL — must actually expire state. All queries here run under the
  * RocksDB provider (transformWithState requires it) with explicit stops
  * (TTL's ProcessingTime mode never self-terminates under AvailableNow —
  * see TwsStreams' scaladoc). */
class TwsSpec extends SparkSpec {

  private def ts(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  private def ev(id: Long, user: Long, sec: Long, typ: String = "view"): Event =
    Event(id, ts(sec), user, typ, 1.0, "{}")

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Feed `batches` through a MemoryStream one micro-batch each, with an
    * optional wall-clock pause between them (the TTL test's knob).
    *
    * `awaitCounts` (cumulative output rows per batch) switches the
    * per-batch barrier from `processAllAvailable()` to polling the memory
    * sink. REQUIRED for ProcessingTime-mode tws: there
    * `shouldRunAnotherBatch` is unconditionally true (decompiled
    * TransformWithStateExecBase — TTL state may newly be evictable
    * whenever the wall clock advances), so `noNewData` never latches and
    * `processAllAvailable()` blocks forever while the trigger spins
    * no-data micro-batches. EventTime-mode queries keep the exact
    * `processAllAvailable` barrier. */
  private def runBatches(batches: Seq[Seq[Event]], pauseMs: Long = 0L,
      awaitCounts: Seq[Long] = Nil, triggerMs: Long = 0L)(
      f: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val name = s"tws_${System.nanoTime()}"
    val q = f(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft-test-$name")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
    val barriers: Seq[Long] =
      if (awaitCounts.isEmpty) batches.map(_ => -1L) else awaitCounts
    try batches.zip(barriers).foreach { case (b, c) =>
      if (pauseMs > 0) Thread.sleep(pauseMs)
      ms.addData(b)
      if (c < 0) q.processAllAvailable()
      else {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (spark.table(name).count() < c) {
          if (System.nanoTime() > deadline)
            fail(s"timed out waiting for $c rows in $name")
          Thread.sleep(50L)
        }
      }
    } finally q.stop()
    spark.table(name)
  }

  // a key that revisits across days and batches, plus a single-visit key
  private val day = 86400L
  private val fixture: Seq[Seq[Event]] = Seq(
    Seq(ev(1, 10, 100), ev(2, 10, 200), ev(3, 20, 150)),
    Seq(ev(4, 10, day + 50), ev(5, 20, 300)),
    Seq(ev(6, 10, day + 90), ev(7, 30, 2 * day)))

  test("tws uvDedup == FMGWS uvDedup across batch boundaries") {
    withRocksDb {
      val tws = runBatches(fixture)(TwsStreams.uvDedup)
        .select("user_id", "dt", "event_id")
      val fmgws = runBatches(fixture)(StatefulStreams.uvDedup)
        .select("user_id", "dt", "event_id")
      val t = tws.collect().map(_.toSeq).toSet
      val f = fmgws.collect().map(_.toSeq).toSet
      assert(t == f)
      // first event per (user, day): 10@d0, 20@d0 (batch-2 revisit dropped),
      // 10@d1 (batch-3 revisit dropped), 30@d2
      assert(t == Set(Seq(10L, "1970-01-01", 1L), Seq(20L, "1970-01-01", 3L),
        Seq(10L, "1970-01-02", 4L), Seq(30L, "1970-01-03", 7L)))
    }
  }

  test("tws bounces == FMGWS bounces: data-path AND timer-path arms") {
    // gap 60s; key 40: id1→id3 100s apart (data-path bounce on id1), then
    // id3's deadline (260) is crossed by the watermark mid-stream (timer
    // path); key 50: one event, deadline 170 crossed by batch 2's
    // watermark advance (timer path); key 60 and the sentinel: deadlines
    // 460/519 never crossed — stay pending in BOTH APIs.
    //
    // The sentinel batch (key 99 @ 459s) makes the timer firings
    // DETERMINISTIC: timeouts/timers are evaluated during data batches
    // against the previous batch's watermark (id3's deadline 260 < 400 ⇒
    // fires inside batch 4), whereas the post-final-batch no-data flush
    // that a bare 3-batch run would need is racy under
    // processAllAvailable+stop — the flush batch is scheduled by
    // shouldRunAnotherBatch AFTER noNewData may have latched. 459 is
    // chosen so the final watermark crosses NO remaining deadline, making
    // the race unobservable.
    val b: Seq[Seq[Event]] = Seq(
      Seq(ev(1, 40, 100), ev(2, 50, 110)),
      Seq(ev(3, 40, 200)),
      Seq(ev(4, 60, 400)),
      Seq(ev(99, 99, 459)))
    withRocksDb {
      def wm(df: DataFrame) = df.withWatermark("ts", "0 seconds")
      val tws = runBatches(b)(d => TwsStreams.bounces(wm(d), gapSec = 60L))
        .select("event_id", "user_id")
      val fmgws = runBatches(b)(
          d => StatefulStreams.bounces(wm(d), gapSec = 60L))
        .select("event_id", "user_id")
      val t = tws.collect().map(_.toSeq).toSet
      val f = fmgws.collect().map(_.toSeq).toSet
      assert(t == f)
      assert(t == Set(Seq(1L, 40L), Seq(2L, 50L), Seq(3L, 40L)))
    }
  }

  test("tws sessionStats == session_window sessionStats across batches") {
    // gap 60s; key 10: two events 30s apart (one session, n=2), then a
    // revisit 120s later (second session, n=1); key 20: one event; the
    // two sentinel batches (99@700, 98@705) stage the watermark so every
    // closed session's timer fires inside a DATA batch (end 190/310 <
    // wm 500 by batch 3, end 560 < wm 700 by batch 4) while no sentinel's
    // own deadline (760/765) is ever crossed — the same determinism
    // argument as the bounce test.
    val b: Seq[Seq[Event]] = Seq(
      Seq(ev(1, 10, 100), ev(2, 10, 130)),
      Seq(ev(3, 10, 250), ev(4, 20, 500)),
      Seq(ev(5, 99, 700)),
      Seq(ev(6, 98, 705)))
    withRocksDb {
      def wm(df: DataFrame) = df.withWatermark("ts", "0 seconds")
      val tws = runBatches(b)(
          d => TwsStreams.sessionStats(wm(d), gapSec = 60L))
        .select("user_id", "stt_us", "n_events")
      val sw = runBatches(b)(
          d => graft.streaming.WindowedStreams.sessionStats(d, gapSec = 60L))
        .select("user_id", "stt_us", "n_events")
      val t = tws.collect().map(_.toSeq).toSet
      val s = sw.collect().map(_.toSeq).toSet
      assert(t == s)
      assert(t == Set(Seq(10L, 100000000L, 2L), Seq(10L, 250000000L, 1L),
        Seq(20L, 500000000L, 1L)))
    }
  }

  test("TTL state actually expires (the FMGWS-inexpressible capability)") {
    withRocksDb {
      // same key in 3 batches; 300ms TTL, ~1s pause between batches —
      // state set in batch k is expired by batch k+1, so no row ever
      // sees prior state. Then the control: no pause, wide TTL — later
      // batches DO see it. (Within one batch the 2nd row sees the 1st
      // row's fresh update either way.)
      val batches = Seq(Seq(ev(1, 70, 100)), Seq(ev(2, 70, 200)),
        Seq(ev(3, 70, 300), ev(4, 70, 400)))
      // ProcessingTime mode: count-barriers, not processAllAvailable
      // (see runBatches' scaladoc), and a throttled trigger so the
      // unavoidable always-another-batch spin doesn't burn RocksDB
      // commits at full speed during the TTL pauses.
      val expired = runBatches(batches, pauseMs = 1000L,
          awaitCounts = Seq(1L, 2L, 4L), triggerMs = 100L)(
          d => TwsStreams.ttlProbe(d, Duration.ofMillis(300)))
        .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
      assert(expired == Map(1L -> false, 2L -> false, 3L -> false,
        4L -> true))
      val kept = runBatches(batches,
          awaitCounts = Seq(1L, 2L, 4L), triggerMs = 100L)(
          d => TwsStreams.ttlProbe(d, Duration.ofHours(1)))
        .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
      assert(kept == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    }
  }
}
