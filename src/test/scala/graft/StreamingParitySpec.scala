package graft

import graft.operators.Sessionize
import graft.streaming.StatefulStreams
import graft.streaming.StatefulStreams.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** The property the correctness gate cannot check: stateful operators must
  * give the same answer when events arrive split across micro-batches —
  * state carries across batch boundaries exactly like the reference's
  * Flink keyed state across checkpoints.
  */
class StreamingParitySpec extends SparkSpec {

  private def ts(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000L)

  private def ev(id: Long, user: Long, sec: Long, typ: String = "view"): Event =
    Event(id, ts(sec), user, typ, 1.0, "{}")

  /** Run a stateful transform over a MemoryStream fed in `batches`,
    * one micro-batch each, returning the accumulated sink. */
  private def runBatches(
      batches: Seq[Seq[Event]])(f: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Event]
    val name = s"parity_${System.nanoTime()}"
    val q = f(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft-test-$name")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("T1 new/old flag: only the first-ever event is new, across batches") {
    val out = runBatches(Seq(
      Seq(ev(1, 100, 10), ev(2, 100, 20)),
      Seq(ev(3, 100, 30), ev(4, 200, 40))))(StatefulStreams.newOldFlag)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("is_new"))).toMap
    assert(out === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("T2 uv dedup: first event per user-day survives, state spans batches") {
    val day = 86400L
    val out = runBatches(Seq(
      Seq(ev(1, 100, 10), ev(2, 100, 20)),            // day 0: keep 1
      Seq(ev(3, 100, 30)),                            // day 0 again: drop
      Seq(ev(4, 100, day + 5), ev(5, 200, day + 6)))  // day 1: keep both
    )(StatefulStreams.uvDedup)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(out === Set(1L, 4L, 5L))
  }

  test("T3 bounce: successor-gap match emits; watermark timeout emits; pending stays") {
    val out = runBatches(Seq(
      Seq(ev(1, 100, 0), ev(2, 100, 10)),   // gap 10s < 60: ev1 not a bounce
      Seq(ev(3, 100, 200)),                 // gap 190s > 60: ev2 bounces on arrival
      Seq(ev(4, 200, 500)),                 // watermark -> 500: ev3 times out (200+60<500)
      Seq(ev(5, 300, 501))))(df =>
      StatefulStreams.bounces(df.withWatermark("ts", "0 seconds"), gapSec = 60L))
      .collect().map(_.getAs[Long]("event_id")).toSet
    // ev4 (ts 500) + 60 > watermark 501 and ev5 is trailing: both stay pending
    assert(out === Set(2L, 3L))
  }

  test("stateful ops run under the RocksDB state store (the big-state path)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val out = runBatches(Seq(
        Seq(ev(1, 100, 10), ev(2, 100, 20)),
        Seq(ev(3, 100, 30), ev(4, 200, 40))))(StatefulStreams.newOldFlag)
        .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("is_new"))).toMap
      assert(out === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("T2 parity: streaming over shuffled batches == batch operator") {
    import spark.implicits._
    val events = Seq(
      ev(1, 1, 100), ev(2, 1, 200), ev(3, 1, 86400 + 100),
      ev(4, 2, 50), ev(5, 2, 60), ev(6, 3, 999))
    val streamed = runBatches(events.grouped(2).toSeq)(StatefulStreams.uvDedup)
      .select("event_id").as[Long].collect().toSet
    val batch = Sessionize.uvDedup(events.toDF())
      .select("event_id").as[Long].collect().toSet
    assert(streamed === batch)
  }
}
