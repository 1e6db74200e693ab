package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Tuned for the driver's local[32] harness but with settings chosen to
  * survive a real multi-executor cluster at 100 TB:
  *   - AQE on (runtime re-plan: skew-join splitting, partition coalescing,
  *     dynamic broadcast conversion),
  *   - shuffle.partitions sized to the parallelism (the driver harness is a
  *     single host; on a 1000-executor cluster this would be set to
  *     2-3x total cores — AQE coalescing makes over-provisioning cheap),
  *   - parquet nanos read as long (the `events` table carries
  *     TIMESTAMP(NANOS) which Spark's reader otherwise rejects),
  *   - UTC session timezone so date arithmetic is stable against the
  *     DuckDB oracle.
  */
object Sessions {
  def tuned(master: String, cpus: String): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark 4.1 writes a .crc companion for EVERY checkpoint file
      // (state deltas/snapshots, offsets, commits) through
      // ChecksumCheckpointFileManager — doubling file-ops on paths whose
      // durability already comes from the store. Worth it on remote object
      // stores; pure overhead for this harness's throwaway tmpfs
      // checkpoints (measured: see BASELINE.md r11 notes). A durable
      // production deployment on HDFS/S3 would re-enable it.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Force FULL computation of a DataFrame for timing harnesses.
    *
    * `.count()` is the wrong action for measurement: the optimizer prunes
    * everything a bare row count doesn't need — unused aggregate
    * expressions, windows, final projections, sorts — so a count-actioned
    * arm times a row-count-only plan, not the gate's work (the r13 as-of
    * A/B measured its composed arm as a no-op this way; see BASELINE.md
    * "r13 as-of tier attribution"). The noop v2 sink consumes every output
    * row with zero serialization cost, so the timed span is exactly the
    * query as a user would materialize it. */
  def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
