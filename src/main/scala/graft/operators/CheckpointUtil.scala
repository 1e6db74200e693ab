package graft.operators

import org.apache.spark.sql.DataFrame

/** Precise release of `localCheckpoint` storage.
  *
  * A checkpointed Dataset's blocks live in the block manager at RDD
  * level; `Dataset.unpersist` consults only the SQL cache manager (a
  * no-op for checkpoints), and the registry-diff alternative (snapshot
  * `getPersistentRDDs` before/after and unpersist the difference) is
  * UNSAFE under concurrent queries on one session — a neighbor's
  * checkpoint landing in the window gets unpersisted, and a
  * lineage-truncated RDD cannot be recomputed, so the neighbor fails
  * with missing blocks (ConcurrencySpec is the guard). This helper frees
  * exactly the RDD the checkpointed frame wraps, nothing else.
  */
private[graft] object CheckpointUtil {

  /** Unpersist the checkpointed RDD behind `df` (a frame RETURNED BY
    * `localCheckpoint`); no-op for any other plan shape. */
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(blocking = false); ()
    case _ => ()
  }
}
