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
    // a NULL partition value would silently survive every step below
    // (null-unsafe isin, null-keyed directory): an erasure pass must
    // fail loudly instead — a key-derived bucket column has no business
    // being null, and a silently-skipped target is a compliance bug
    require(targets.filter(col(partCol).isNull).isEmpty,
      s"deleteKeys: targets carry NULL $partCol values — fix the " +
        "partition derivation upstream; nulls cannot be erased silently")
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
      // erasure pass must not have. Sweep those directories explicitly,
      // resolving them from the store's ACTUAL directory names (decoded
      // via the same escaping Spark's writer applied — a string value
      // like "US East" lives under partCol=US%20East, so building the
      // path from the raw value would miss it).
      val remainingStr = kept
        .select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet
      val goneStr = targets.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSet -- remainingStr
      sweepEmptiedPartitions(spark, storeDir, partCol, goneStr)
      kept.unpersist()
      ()
    }
    affected
  }

  /** Retention/TTL expiry: drop every partition whose `partCol` value
    * sorts strictly below `cutoff` — a pure LISTING operation (directory
    * names only; zero data files are opened, read, or rewritten), which
    * is what makes age-based expiry free at 100 TB while row-level
    * deletes cost a rewrite. Values compare as strings after undoing the
    * writer's path escaping, so the contract is lexicographically-ordered
    * partition values (ISO dates, zero-padded buckets). Returns the
    * dropped values. */
  def expirePartitions(spark: SparkSession, storeDir: String,
      partCol: String, cutoff: String): Seq[String] = {
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(storePath).filter(_.isDirectory).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(s"$partCol=")) {
        val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(name.substring(partCol.length + 1))
        if (v < cutoff) { fs.delete(st.getPath, true); dropped += v; () }
      }
    }
    dropped.toSeq
  }

  /** Delete the store directories for partitions that ended up with zero
    * rows after a rewrite (dynamic overwrite never lists them, so their
    * stale files would otherwise survive). Directory names are decoded
    * via the same escaping Spark's writer applied — a string value like
    * "US East" lives under partCol=US%20East, so building the path from
    * the raw value would miss it. Shared by deleteKeys and Merge.into. */
  private[operators] def sweepEmptiedPartitions(spark: SparkSession,
      storeDir: String, partCol: String, goneStr: Set[String]): Unit =
    if (goneStr.nonEmpty) {
      val storePath = new org.apache.hadoop.fs.Path(storeDir)
      val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(storePath).filter(_.isDirectory).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(s"$partCol=")) {
          val v = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(name.substring(partCol.length + 1))
          if (goneStr.contains(v)) { fs.delete(st.getPath, true); () }
        }
      }
    }

  /** Deterministic pseudonymization — the GDPR-friendly middle ground
    * between keeping PII and deleting rows: each listed column's value is
    * replaced by the lower-64 md5 of `salt:value` (as an unsigned decimal
    * string). Same value → same token, so JOINS and GROUP BYs keep
    * working across tables pseudonymized with the same salt (referential
    * integrity survives), while the raw value is unrecoverable without
    * the salt. Pure scan-side projection: zero shuffle, codegen'd hash,
    * and the md5 primitive is the engine's portable one — an external
    * auditor (or the DuckDB oracle) can replay every token. NULLs stay
    * NULL (a token for NULL would fabricate a joinable value). */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNotNull,
        graft.functions.HashFns.md5Lower64(
          concat(lit(salt), lit(":"), col(c).cast("string")))
          .cast("string")))
    }
}
