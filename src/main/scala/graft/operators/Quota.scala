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

  /** Bounded-state tier of [[tokenBucket]]: identical recurrence and
    * output, but per-key state is O(1) instead of O(key's events).
    *
    * Where [[tokenBucket]] materializes each key's full event array
    * (`collect_list` → HOF fold — fine for tenant-grained keys, the
    * batch-audit shape), this tier repartitions by key, secondary-sorts
    * each partition by (key, time µs, tie), and folds the recurrence in
    * ONE lazy pass over the sorted iterator — the classic
    * repartition+sortWithinPartitions+mapPartitions pattern for
    * sequential per-key folds. A key whose events dwarf task memory
    * (one hot tenant with 10⁹ events) streams through instead of
    * allocating an array, so this is the 100 TB ingest-audit posture;
    * both tiers share one oracle (same recurrence, same output schema).
    */
  def tokenBucketSorted(df: DataFrame, keyCol: Column, tsCol: String,
      tieCol: String, valueIdCol: String, capacity: Int,
      refillPerTick: Int, tickSeconds: Long = 1L): DataFrame = {
    require(capacity >= 1 && refillPerTick >= 1 && tickSeconds >= 1)
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val evs = df.select(keyCol.as("k"),
      unix_micros(col(tsCol).cast("timestamp")).as("us"),
      floor(unix_seconds(col(tsCol).cast("timestamp")) / tickSeconds)
        .cast("long").as("tick"),
      // tie keeps its ORIGINAL type: it exists only for the sort, and a
      // long cast would re-order string ties differently from the array
      // tier's struct sort
      col(tieCol).as("tie"),
      col(valueIdCol).cast("long").as("vid"))
    val keyType = evs.schema("k").dataType
    val outSchema = StructType(Seq(
      StructField("k", keyType), StructField("n", LongType, nullable = false),
      StructField("n_acc", LongType, nullable = false),
      StructField("n_rej", LongType, nullable = false),
      StructField("acc_sum", LongType, nullable = false),
      StructField("rej_sum", LongType, nullable = false)))
    val cap = capacity.toLong
    val refill = refillPerTick.toLong
    val sorted = evs.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("us"), col("tie"))
    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private var pending: Row = null // summary ready to emit
        private var cur: Row = null     // first row of the next key group
        private def summarize(): Unit = {
          // folds ONE key's run of rows starting at `cur`; O(1) state
          val key = cur.get(0)
          var tok = cap
          var last = cur.getLong(2) // first event: Δ = 0, full bucket
          var n = 0L; var nAcc = 0L; var accSum = 0L; var rejSum = 0L
          var row = cur
          while (row != null) {
            val tick = row.getLong(2); val vid = row.getLong(4)
            tok = math.min(cap, tok + (tick - last) * refill)
            last = tick
            if (tok >= 1L) { tok -= 1L; nAcc += 1L; accSum += vid }
            else rejSum += vid
            n += 1L
            row = if (it.hasNext) {
              val nx = it.next()
              if (java.util.Objects.equals(nx.get(0), key)) nx
              else { cur = nx; null }
            } else { cur = null; null }
          }
          pending = Row(key, n, nAcc, n - nAcc, accSum, rejSum)
        }
        override def hasNext: Boolean = {
          if (pending == null) {
            if (cur == null && it.hasNext) cur = it.next()
            if (cur != null) summarize()
          }
          pending != null
        }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }(Encoders.row(outSchema))
  }
}
