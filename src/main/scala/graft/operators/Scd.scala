package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history builds. The reference keeps dims as
  * latest-row-wins upserts (K4, sink/DimSinkFunction.java via
  * streaming/Sinks.dimUpsert — SCD type 1); a serving layer that needs
  * "what did this dim look like when the fact happened" needs type 2
  * validity intervals instead, which pair with [[Joins.asOfJoin]] for
  * time-travel enrichment.
  */
object Scd {

  /** Build SCD2 validity intervals from a changelog: consecutive rows per
    * key whose tracked attributes did not change are compacted away, each
    * surviving change opens a version effective [its ts, next change's
    * ts), and the last version per key is open-ended (`is_current = 1`).
    *
    * Plan: both the change-detect lag and the interval lead run over the
    * SAME (key) x (ts, tie) window, so Catalyst plans ONE exchange + sort
    * and the second Window reuses it — one shuffle total, no join. At
    * 100 TB this is the map-side-compact shape: the change filter drops
    * unchanged rows BEFORE anything else consumes them, and state per key
    * is zero (pure window, no accumulation).
    */
  def scd2(changelog: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // null-safe change detect: the first row per key (lag = null) always
    // opens a version; later rows only when some attribute moved
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    changelog
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        col("effective_to").isNull.cast("int"))
      .drop("__chg")
  }

  /** Bound the accumulating changelog store behind streaming SCD2
    * maintenance (StreamRunner.foldBatches / `stream_k7_scd2`): retire the
    * rows no late arrival can ever make significant again.
    *
    * The raw changelog is kept (not the compacted dim) because an
    * out-of-order row can RE-OPEN a version: an unchanged row u is
    * significant iff some row with a different attribute lands strictly
    * between u's predecessor and u. Once a low watermark guarantees no
    * future arrival has ts < `lowWatermark`, that interleaving is
    * impossible for any u below it — so below the watermark only the
    * rows that OPEN a version (attribute changed vs the predecessor, the
    * same null-safe test scd2 applies) need to survive; everything at or
    * above the watermark stays raw. `scd2(compact(log)) == scd2(log)`
    * extended by ANY admissible future batch — ScdCompactionSpec proves
    * both the equality and that the bound is tight (compacting above a
    * still-possible late row corrupts).
    *
    * Store growth without compaction is O(all change rows ever + all
    * unchanged duplicates); with it, O(version count + rows younger than
    * the watermark) — the former is what SCALE.md flags, the latter is
    * the steady state a long-running dim maintainer needs. Trigger it
    * from the source's watermark (event-time low watermark minus the
    * allowed lateness), every N batches or on a store-size threshold —
    * compaction is idempotent and always safe at or below the true low
    * watermark.
    *
    * One shuffle (the same key×(ts,tie) window sort scd2 itself needs);
    * no join, no state. */
  def compactChangelog(changelog: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String], lowWatermark: Column): DataFrame = {
    require(attrCols.nonEmpty,
      "compactChangelog needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    changelog
      .withColumn("__keep", col(tsCol) >= lowWatermark || changed)
      .filter(col("__keep"))
      .drop("__keep")
  }
}
