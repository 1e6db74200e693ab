package graft.operators

import org.apache.spark.sql.DataFrame
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
}
