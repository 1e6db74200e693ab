package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key rate limiting — the quota/throttle operator (API quotas,
  * per-tenant ingest caps, abuse throttling): a token bucket of
  * `capacity` tokens refilled `refillPerTick` per `tickSeconds`-sized
  * event-time tick, charged 1 token per event, evaluated in strict
  * (event-time µs, tie) order per key.
  *
  * The fold is a non-linear recurrence (the `min` cap), so it cannot be
  * a window function; per key it runs as an `aggregate` HOF over the
  * key's time-sorted event array — all integer arithmetic
  * (tok' = min(C, tok + Δtick·R); accept ⇔ tok' ≥ 1), so an oracle can
  * replay it row-for-row with a recursive CTE.
  *
  * Ordering is by FULL event-time microseconds (tie-broken by `tieCol`),
  * not by tick — the same total order the ts-contiguous streaming source
  * preserves across micro-batches, which is what lets the streaming twin
  * ([[graft.streaming.TwsStreams.rateLimit]]) share this operator's
  * oracle verbatim.
  *
  * Scale contract: state is per KEY (tenant/user-grained — millions of
  * modest groups, one shuffle), and a key's events are collected to one
  * array, so per-key volume must fit a task — the batch-audit shape.
  * The unbounded-per-key path is the streaming twin: the same integer
  * recurrence with one (tok, lastTick) pair per key in a keyed state
  * store. */
object Quota {

  /** Per-key admission summary: n, n_acc, n_rej, and acc_sum / rej_sum
    * (id checksums of the accepted/rejected sets — order-insensitive, so
    * the oracle can pin the exact admitted SET without per-event rows). */
  def tokenBucket(df: DataFrame, keyCol: Column, tsCol: String,
      tieCol: String, valueIdCol: String, capacity: Int,
      refillPerTick: Int, tickSeconds: Long = 1L): DataFrame = {
    require(capacity >= 1 && refillPerTick >= 1 && tickSeconds >= 1)
    val evs = df.select(keyCol.as("k"),
      unix_micros(col(tsCol).cast("timestamp")).as("us"),
      floor(unix_seconds(col(tsCol).cast("timestamp")) / tickSeconds)
        .cast("long").as("tick"),
      col(tieCol).as("tie"), col(valueIdCol).as("vid"))
    val arr = evs.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("us"), col("tie"),
        col("tick"), col("vid")))).as("a"))
    // state: (tok, last, n_acc, acc_sum, rej_sum); the first event sees a
    // full bucket (last initialized to its own tick → Δ = 0, no refill)
    val folded = arr.withColumn("s", aggregate(
      col("a"),
      struct(lit(capacity.toLong).as("tok"),
        element_at(col("a"), 1).getField("tick").as("last"),
        lit(0L).as("n_acc"), lit(0L).as("acc_sum"), lit(0L).as("rej_sum")),
      (s, x) => {
        val refilled = least(lit(capacity.toLong),
          s.getField("tok") + (x.getField("tick") - s.getField("last")) *
            refillPerTick)
        val ok = refilled >= 1
        struct(
          when(ok, refilled - 1).otherwise(refilled).as("tok"),
          x.getField("tick").as("last"),
          (s.getField("n_acc") + when(ok, 1L).otherwise(0L)).as("n_acc"),
          (s.getField("acc_sum") +
            when(ok, x.getField("vid")).otherwise(0L)).as("acc_sum"),
          (s.getField("rej_sum") +
            when(ok, 0L).otherwise(x.getField("vid"))).as("rej_sum"))
      }))
    folded.select(col("k"), size(col("a")).cast("long").as("n"),
      col("s.n_acc").as("n_acc"),
      (size(col("a")).cast("long") - col("s.n_acc")).as("n_rej"),
      col("s.acc_sum").as("acc_sum"), col("s.rej_sum").as("rej_sum"))
  }
}
