package graft.operators

import org.apache.spark.sql.DataFrame
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
}
