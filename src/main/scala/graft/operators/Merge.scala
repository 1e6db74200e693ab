package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE INTO over a partitioned parquet store — the
  * general lakehouse write: one source batch carrying updates, deletes,
  * and inserts lands transactionally-shaped against an at-rest table
  * (reference analogue: the dim layer's key-addressed upsert/invalidate
  * pair — gmall-realtime's DimSinkFunction insert + DimUtil delete —
  * generalized to one statement; on Delta/Iceberg this slot is MERGE
  * INTO, which does the same file-scoped rewrite under a log).
  *
  * At 100 TB the defining property is what is NOT touched: the affected
  * partition set is computable from the source alone (its distinct
  * `partCol` values — the caller derives the partition with the SAME
  * function the store was laid out with), the store scan is
  * partition-pruned to that slice, the anti-join shuffles slice + source
  * only, and untouched partitions' files are never listed, read, or
  * replaced. Cost = churned partitions — the k8-backfill / k10-erasure
  * economics applied to general writes.
  */
object Merge {

  /** Apply `source` to the store at `storeDir`:
    *   - `opCol` = "D": WHEN MATCHED DELETE (no-op when the key is absent)
    *   - any other op: WHEN MATCHED UPDATE SET * / WHEN NOT MATCHED
    *     INSERT * (the source row replaces or becomes the stored row)
    *
    * `source` must carry the store's payload columns plus `opCol`; keys
    * must be unique per source batch (two versions of one key in one
    * batch is a sequencing bug upstream — resolve with a max-ts argmax
    * before calling). Returns the affected partition values.
    */
  def into(spark: SparkSession, storeDir: String, partCol: String,
      keyCol: String, source: DataFrame, opCol: String = "op"): Seq[Any] = {
    // a NULL partition value cannot be routed to a directory — fail
    // loudly rather than silently dropping the write (same contract as
    // Erasure.deleteKeys)
    require(source.filter(col(partCol).isNull).isEmpty,
      s"Merge.into: source carries NULL $partCol values — fix the " +
        "partition derivation upstream")
    val affected = source.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.nonEmpty) {
      val slice = spark.read.parquet(storeDir)
        .filter(col(partCol).isin(affected.map(lit): _*))
      // every sourced key leaves the slice; upsert rows come back as the
      // source's version — one anti-join implements all three MERGE arms
      val kept = slice.join(
        source.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      val upserts = source.filter(col(opCol) =!= "D").drop(opCol)
      val out = kept.unionByName(upserts.select(kept.columns.map(col): _*))
        .localCheckpoint(true) // the rewrite overwrites its own input files
      graft.streaming.Sinks.overwritePartitions(out, storeDir, partCol)
      // a partition whose every row was deleted writes nothing under
      // dynamic overwrite — sweep its directory so deletes are durable
      val remainingStr = out
        .select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      val goneStr = affected.map(String.valueOf).toSet -- remainingStr
      Erasure.sweepEmptiedPartitions(spark, storeDir, partCol, goneStr)
      out.unpersist()
      ()
    }
    affected
  }
}
