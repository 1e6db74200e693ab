package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: derive a changelog from two full table snapshots.
  *
  * The inverse of the CDC ingestion path (streaming/Sources.cdcDecode
  * consumes a changelog; this PRODUCES one when upstream only hands you
  * periodic full dumps — the classic nightly-snapshot reality). One
  * co-partitioned full-outer join on the key:
  *
  *   - key only in new       → insert
  *   - key only in old       → delete
  *   - both, payload differs → update
  *   - both, payload equal   → dropped (no-op rows never enter the log)
  *
  * Change detection is the null-safe struct comparison `<=>` over the
  * compared columns — EXACT, column-order-deterministic, and null-aware
  * (a column going value→null is an update, null→null is not). At
  * 100 TB both snapshots shuffle once on the key — or ZERO times when
  * they are stored bucketed on it ([[Bucketing]]), the right posture
  * for a recurring diff job. For very wide rows the shuffle can be
  * narrowed by persisting a row-hash column at write time and diffing
  * on that (xxhash64; trades a ~2⁻⁶⁴ per-key false-equal for carrying
  * 8 bytes instead of the old payload) — this operator keeps the exact
  * form so its answer is the definition, not an approximation of it.
  *
  * Output: key, change_type ('insert'|'update'|'delete'), and the
  * compared columns from the NEW snapshot (null for deletes) — exactly
  * the `after` image a downstream [[graft.streaming.Sinks.dimUpsert]]
  * or SCD2 builder expects.
  */
object Snapshot {

  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(col(key).as(s"__k_$tag"),
        struct(compareCols.map(col): _*).as(s"__p_$tag"))
    val o = packed(oldSnap, "o")
    val n = packed(newSnap, "n")
    val changeType = when(col("__k_o").isNull, lit("insert"))
      .when(col("__k_n").isNull, lit("delete"))
      .when(!(col("__p_o") <=> col("__p_n")), lit("update"))
    val payload: Seq[Column] =
      compareCols.map(c => col(s"__p_n.$c").as(c))
    o.join(n, o("__k_o") === n("__k_n"), "full_outer")
      .withColumn("change_type", changeType)
      .filter(col("change_type").isNotNull)
      .select(Seq(coalesce(col("__k_n"), col("__k_o")).as(key),
        col("change_type")) ++ payload: _*)
  }
}
