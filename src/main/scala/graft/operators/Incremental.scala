package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance — the batch "don't
  * rescan history" pattern (the batch twin of the reference's serving
  * re-aggregation path, gmall-publisher's sum-on-read over pre-bucketed
  * rows, and of this repo's streaming k3_serving_reagg): an aggregate
  * over an append-only 100 TB fact table is kept as a SMALL table of
  * mergeable partials; when a new partition of facts lands, only the
  * delta is scanned and folded in. Refresh cost = O(delta + |groups|),
  * independent of history size.
  *
  * Partials are chosen to be associative/commutative (count, sum, min,
  * max — sums in exact decimal so the fold is bit-stable under any merge
  * order); non-mergeable finals (avg) are DERIVED at read time from the
  * partials. This is the same partial/final split Spark's own
  * HashAggregate uses across its shuffle, lifted to table granularity —
  * and the reason the state table stays re-mergeable across arbitrary
  * re-groupings of deltas (day → month compaction of states works with
  * the SAME merge).
  */
object Incremental {

  /** Mergeable per-key partials for `df`: `cnt`, `sum_<c>` (decimal) per
    * sum column, `min_<c>`/`max_<c>` per min-max column. One keyed
    * aggregation — Catalyst plans map-side partials, so the shuffle
    * carries one row per (partition, key). */
  def state(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      sumCols.map(c => sum(col(c).cast("decimal(18,2)")).as(s"sum_$c")) ++
        minMaxCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), aggs: _*)
  }

  /** Fold any number of state tables into one: union, then re-aggregate
    * the partials (sum of counts/sums, min of mins, max of maxes).
    * Associativity makes this the ONLY merge needed — two days, a day
    * into a year, or a backfill slice into the live table are all the
    * same call. The shuffle is |groups|-sized: state tables, not fact
    * tables, move. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "Incremental.merge: no states to merge")
    val unioned = states.reduce(_ unionByName _)
    val partialCols = unioned.columns.filterNot(keys.contains)
    val aggs: Seq[Column] = partialCols.map { c =>
      if (c == "cnt" || c.startsWith("sum_")) sum(col(c)).as(c)
      else if (c.startsWith("min_")) min(col(c)).as(c)
      else if (c.startsWith("max_")) max(col(c)).as(c)
      else throw new IllegalArgumentException(
        s"Incremental.merge: non-mergeable state column $c")
    }
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time finals: derive `avg_<c>` = sum_<c>/cnt for each sum
    * partial — ONE IEEE division of two exact values (the state table
    * never stores a non-mergeable column), so the result is
    * bit-identical no matter how many merges produced the state. */
  def finalizeState(state: DataFrame): DataFrame =
    state.columns.filter(_.startsWith("sum_")).foldLeft(state) { (df, c) =>
      df.withColumn("avg_" + c.stripPrefix("sum_"),
        col(c).cast("double") / col("cnt"))
    }
}
