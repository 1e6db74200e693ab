package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance pass every long-lived parquet
  * dataset needs (streaming sinks, partition backfills and CDC upserts all
  * fragment; at 100 TB a directory of 10 KB files turns scan planning and
  * NameNode/S3 listing into the bottleneck long before row throughput
  * does). Reference analogue: the per-window batch files its JDBC/Kafka
  * sinks emit accumulate the same way (gmall-realtime's ods→dwd file
  * churn); compaction is the engine-side answer.
  *
  * Strategy: size the OUTPUT file count from the observed INPUT bytes
  * (`ceil(totalBytes / targetBytes)`), then rewrite through one
  * round-robin `repartition(n)` so output files come out even-sized —
  * `coalesce(n)` would be cheaper (no shuffle) but inherits the input's
  * skew: merging 64 files of wildly different sizes into 4 unbalanced
  * outputs just moves the problem. One shuffle of exactly the data being
  * compacted is the honest price and parallelizes across the cluster.
  * File listing goes through the Hadoop FileSystem API, so the same code
  * runs against HDFS/S3 paths on a real deployment.
  */
object Compaction {

  /** Bytes + file count of the parquet data files under `dir` (recursive;
    * `_SUCCESS`/checksum markers excluded). */
  def dataFileStats(spark: SparkSession, dir: String): (Long, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(path, true)
    var bytes = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      // skip markers AND hidden files (.part-*.crc on RawLocalFileSystem,
      // object-store .pending files) — same filter as every gate walker
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        bytes += f.getLen; n += 1
      }
    }
    (bytes, n)
  }

  /** Number of output files compaction would produce for `totalBytes` of
    * input at `targetBytes` per file (≥1). */
  def plannedFiles(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` as
    * ~`targetBytes`-sized files. Returns the output file count it sized.
    * Parquet's encoded size ≈ input size for a pure rewrite, so input
    * bytes are a sound proxy for output sizing (the conventional
    * compactor heuristic — exact output sizing would need a second
    * write pass). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, knownBytes: Option[Long] = None): Int = {
    // callers that already listed the input (sizing the target from its
    // bytes) pass the total through — listing is the expensive call on
    // HDFS/S3, exactly what compaction exists to reduce
    val bytes = knownBytes.getOrElse(dataFileStats(spark, inDir)._1)
    val n = plannedFiles(bytes, targetBytes)
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
