package graft

import graft.operators.Scd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog compaction contract (VERDICT r9 task 7): below a true low
  * watermark, only version-opening rows matter — compaction must preserve
  * the SCD2 history under every admissible future, and the bound must be
  * TIGHT (compacting past a still-possible late arrival corrupts).
  */
class ScdCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // changelog rows: (key, event_id/tie, ts, attr)
  private def log(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toSeq.map { case (k, id, sec, a) => (k, id, ts(sec), a) }
      .toDF("user_id", "event_id", "ts", "event_type")

  private def hist(df: DataFrame): Set[String] =
    Scd.scd2(df, "user_id", "ts", "event_id", Seq("event_type"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("effective_from")), unix_micros(col("effective_to")),
        col("is_current"))
      .collect().map(_.toString).toSet

  private def compact(df: DataFrame, lwSec: Long): DataFrame =
    Scd.compactChangelog(df, "user_id", "ts", "event_id",
      Seq("event_type"), lit(ts(lwSec)))

  // the out-of-order shape: A opens at 10, unchanged at 30; a late row at
  // 20 with a DIFFERENT attr makes the 30 row significant again
  private val prefix = log(
    (1L, 100L, 10L, "view"), (1L, 101L, 30L, "view"),
    (1L, 102L, 40L, "click"), (1L, 103L, 55L, "click"),
    (2L, 200L, 15L, "view"))

  test("compaction drops only insignificant rows and preserves the " +
    "history under every admissible future batch") {
    val lw = 50L
    val compacted = compact(prefix, lw)
    // the unchanged rows strictly below the watermark are gone, the rest
    // survive: A@30 (unchanged, 30 < 50) is retired; A@55 (unchanged but
    // 55 >= 50 — still mutable territory) is kept
    assert(compacted.count() === 4)
    assert(compacted.filter(col("event_id") === 101L).count() === 0)
    assert(compacted.filter(col("event_id") === 103L).count() === 1)
    // identical history right now...
    assert(hist(compacted) === hist(prefix))
    // ...and under admissible futures: on-watermark arrival, a change row,
    // and a late-but-legal row landing between 50 and 55 that RE-OPENS a
    // version out of the kept unchanged row A@55
    val futures = Seq(
      log((1L, 110L, 50L, "purchase")),
      log((2L, 210L, 60L, "click"), (2L, 211L, 70L, "view")),
      log((1L, 112L, 52L, "view")))
    futures.foreach { fut =>
      assert(hist(compacted.unionByName(fut)) === hist(prefix.unionByName(fut)))
    }
  }

  test("the bound is tight: compacting ABOVE a still-possible late row " +
    "loses a version (why the trigger must be the true low watermark)") {
    // pretend the low watermark were 35 although a row at 20 can still
    // arrive: A@30 is retired, then late A@20/'click' lands — the raw log
    // re-opens a 'view' version at 30, the compacted one cannot
    val tooHigh = compact(prefix, 35L)
    val late = log((1L, 99L, 20L, "click"))
    assert(hist(tooHigh.unionByName(late)) !== hist(prefix.unionByName(late)))
  }

  test("compaction is idempotent and composes across advancing watermarks") {
    val once = compact(prefix, 50L)
    assert(compact(once, 50L).collect().toSet === once.collect().toSet)
    // advancing the watermark past 55 retires the (now stable) A@55 too
    val more = compact(once, 60L)
    assert(more.filter(col("event_id") === 103L).count() === 0)
    assert(hist(more) === hist(prefix))
  }
}
