package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted deletion over an append-only parquet store — the
  * right-to-be-forgotten maintenance pass. At 100 TB you cannot rewrite
  * the table to delete one user's rows; you rewrite exactly the
  * partitions that can contain the target keys and leave every other
  * file untouched (cost = churned partitions, the k8 backfill economics
  * applied to deletes).
  *
  * The store must be partitioned by a key-derived column (e.g.
  * `bucket = pmod(user_id, N)`) — then the affected-partition set is
  * computable from the target keys alone, the read is partition-pruned,
  * and the delete is an anti-join inside the affected slice only.
  * (Reference analogue: the dim store's key-addressed upserts/deletes —
  * `DimUtil`/`DimSinkFunction` invalidation — generalized to fact-scale
  * stores; on Delta/Iceberg this slot is DELETE WHERE, which does the
  * same file-scoped rewrite under a transaction log.)
  */
object Erasure {

  /** Delete all rows whose `keyCol` appears in `targets` from the store
    * at `storeDir`, rewriting ONLY the partitions named by the targets'
    * `partCol` values. `targets` must carry both `keyCol` and `partCol`
    * (the caller derives the partition value with the SAME function the
    * store was laid out with). Returns the affected partition values.
    *
    * The `partCol IN affected` filter is partition pruning on the store
    * scan (directory-level, no data read outside the slice); the
    * rewrite goes through dynamic partition overwrite, so untouched
    * partitions' files are never listed, read, or replaced. The
    * affected-value collect is bounded by the partition count.
    */
  def deleteKeys(spark: SparkSession, storeDir: String, partCol: String,
      keyCol: String, targets: DataFrame): Seq[Any] = {
    val affected = targets.select(col(partCol)).distinct()
      .collect().map(_.get(0)).toSeq
    if (affected.nonEmpty) {
      val affectedLits: Seq[Column] = affected.map(lit)
      val slice = spark.read.parquet(storeDir)
        .filter(col(partCol).isin(affectedLits: _*))
      val kept = slice.join(
        targets.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        .localCheckpoint(true) // the rewrite overwrites its own input files
      graft.streaming.Sinks.overwritePartitions(kept, storeDir, partCol)
      // dynamic overwrite only replaces partitions PRESENT in the new
      // data: a partition whose every row was deleted writes nothing and
      // would silently keep its old files — the one failure mode an
      // erasure pass must not have. Sweep those directories explicitly.
      val remaining = kept.select(col(partCol)).distinct()
        .collect().map(_.get(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(storeDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      affected.filterNot(remaining).foreach { v =>
        val dir = new org.apache.hadoop.fs.Path(storeDir, s"$partCol=$v")
        if (fs.exists(dir)) { fs.delete(dir, true); () }
      }
      kept.unpersist()
      ()
    }
    affected
  }
}
