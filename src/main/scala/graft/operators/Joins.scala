package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join surface of the reference (SURVEY.md §2.4), batch shapes.
  *
  *  - J1/J2 interval joins (dwm/OrderWideApp.java:87-97,
  *    dwm/PaymentWideApp.java:86-96): equi key + event-time band. In batch
  *    the band is a residual predicate on a hash join (equi key carries the
  *    shuffle); in streaming (graft.streaming) the same expression runs as a
  *    watermarked stream-stream join.
  *  - J3 dimension enrichment (func/DimAsyncFunction.java + call sites):
  *    the reference's per-record async Phoenix/Redis lookups collapse into
  *    broadcast hash joins — no network round-trips, no cache, and the fact
  *    table never shuffles.
  *  - J4 union (dws/ProductStatsApp.java:188-191): unionByName.
  *  - J5 config-driven routing (dwd/BaseDBApp.java:75-84,
  *    func/TableProcessFunction.java:48-69): broadcast join against a tiny
  *    config table; sinkColumns pruning applied per route.
  */
object Joins {

  /** J1: equi + symmetric time band [-lower, +upper] around the left ts. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame =
    left.join(
      right,
      left(leftKey) === right(rightKey) &&
        right(rightTs) >= left(leftTs) - expr(s"INTERVAL $lowerSec SECONDS") &&
        right(rightTs) <= left(leftTs) + expr(s"INTERVAL $upperSec SECONDS"))

  /** J3: broadcast-enrich a fact with several small dims (left joins —
    * the reference's lookup-failure drop is a bug, not a spec). */
  def enrich(fact: DataFrame, dims: Seq[(DataFrame, Seq[String])]): DataFrame =
    dims.foldLeft(fact) { case (df, (dim, keys)) =>
      df.join(broadcast(dim), keys, "left")
    }

  /** J5: route rows by a config table (sourceTable/operateType →
    * sinkTable); unmatched rows are dropped exactly like the reference's
    * "no config" branch (TableProcessFunction.java:64-68). */
  def configRoute(facts: DataFrame, config: DataFrame,
      factTable: String, factType: String): DataFrame =
    facts.join(
      broadcast(config),
      facts(factTable) === config("source_table") && facts(factType) === config("operate_type"))

  /** As-of join (left): attach to each left row the payload of the LATEST
    * right row at-or-before (`strict=false`) / strictly-before
    * (`strict=true`) the left row's time, per key. Lefts without a match
    * keep a null payload.
    *
    * Spark has no built-in ASOF join. The equi-join-then-max_by shape
    * multiplies the fact side by the per-key version count before pruning;
    * a theta-join is a cartesian band. This is the union trick instead: tag
    * both sides, sort within key by (ts, side), and carry the last-seen
    * right payload forward with a running window — ONE shuffle on the key,
    * O(|left|+|right|) rows, no join operator at all. The same recipe backs
    * point-in-time feature lookups (train-data joins) at any scale; skew =
    * hot keys, same guards as any keyed shuffle.
    *
    * Rights that tie on (key, ts) are first reduced to their struct-max
    * payload so the result is deterministic under any partitioning (the
    * same tie policy an engine-native ASOF leaves unspecified). */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String],
      asCol: String = "asof",
      strict: Boolean = false): DataFrame = {
    // dedup rights per (key, ts): lexicographic struct max — deterministic.
    // Null-key/null-ts rights are dropped: SQL join semantics (null never
    // matches), where a window partition would lump nulls together.
    val r0 = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .groupBy(col(rightKey).as("__k"), col(rightTs).as("__ts"))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
    // at equal ts: side 0 sorts before the left row (inclusive semantics),
    // side 2 after it (strict excludes equal-ts rights from the frame)
    val rSide = if (strict) 2 else 0
    val r = r0.withColumn("__side", lit(rSide))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asCol, last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__ts", "__side", "__p")
  }

  /** Salted equi-join for skewed keys, when the small side is too big to
    * broadcast and AQE's skew splitting isn't enough: the skewed (left)
    * side gets a random salt in [0, buckets), the right side is replicated
    * once per salt value, and the join key becomes (key, salt) — a hot key
    * spreads over `buckets` reducers instead of one straggler.
    *
    * Replication cost is |right| × buckets, so use a modest bucket count
    * and reserve this for the handful of keys AQE can't split (the classic
    * targeted-salting recipe; at 100 TB you'd salt only rows whose key is
    * in a precomputed hot-key set and union the rest unsalted). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filter pre-join: build a Bloom filter over the build side's
    * join keys (one aggregated pass), ship the few-MB sketch to every
    * fact-scan task, and drop fact rows that cannot match BEFORE the join
    * shuffle. At 100 TB the dominant join cost is shuffling rows that a
    * selective build side will discard anyway; with fpp=1% the filter
    * removes ~99% of them for megabytes of broadcast. False positives
    * pass the filter and are eliminated by the EXACT join that follows,
    * so the result is bit-identical to the plain join — the filter is
    * pure shuffle-volume reduction, never a correctness dependency.
    *
    * This is the explicit form of Spark's own runtime bloom filter
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which injects
    * the same shape when a selective build side is detected); the
    * explicit operator is for pipelines that KNOW the build side is
    * selective — no reliance on optimizer heuristics, and the filter
    * survives plan shapes the injection rule declines.
    *
    * `expectedKeys` sizes the filter (bits ∝ keys·ln(1/fpp)); oversizing
    * is a few MB of slack, undersizing degrades fpp, never correctness.
    * Long and string keys supported (the sketch hashes both natively).
    * The build side is computed twice (sketch pass + join); persist it
    * first when its lineage is expensive — for the intended use (a
    * selective dim) both passes are cheap relative to the fact scan
    * they save. */
  def bloomPreFilteredJoin(fact: DataFrame, build: DataFrame,
      factKey: String, buildKey: String,
      expectedKeys: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    val bf = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val isLong = fact.schema(factKey).dataType ==
      org.apache.spark.sql.types.LongType
    val might =
      if (isLong) udf((k: java.lang.Long) =>
        k != null && bcast.value.mightContainLong(k))
      else udf((k: String) => k != null && bcast.value.mightContainString(k))
    val filtered = fact.filter(might(col(factKey)))
    filtered.join(build, filtered(factKey) === build(buildKey))
  }
}
