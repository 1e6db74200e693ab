package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Drives a streaming DataFrame to completion over its (finite) sources
  * with Trigger.AvailableNow into a memory sink, returning the result as a
  * batch DataFrame.
  *
  * This is how the driver's batch-only correctness gate exercises the real
  * streaming execution path: same operators, same state stores, same
  * watermark machinery as a live run — just over a bounded source. Each run
  * gets a fresh query name + checkpoint dir, so repeated invocations are
  * independent.
  */
object StreamRunner {
  private val n = new AtomicLong()

  /** State partition count for stateful streaming queries. Batch shuffle
    * width (sized to cores) is the wrong unit for streaming state: every
    * micro-batch commits one state-store delta per partition per stateful
    * operator, so partition count multiplies checkpoint file I/O. Sized
    * for the single-host harness (measured: the stream-stream join runs
    * 7.9s at 32 partitions, 2.4s at 4); a real cluster sizes this to
    * state volume / executor count instead. */
  val StatePartitions: Int =
    sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "8").toInt

  /** Checkpoint root: tmpfs when available — these are throwaway
    * bounded-run checkpoints, and state-store commits are pure file-I/O
    * overhead on them (a durable store is only right for a real
    * long-running deployment, which goes through Sinks.* with an explicit
    * checkpointLocation instead). */
  private val ckptRoot: String =
    if (new java.io.File("/dev/shm").canWrite) "/dev/shm"
    else System.getProperty("java.io.tmpdir")

  /** Sweep a bounded run's throwaway checkpoint/stage dir. Every entry
    * point cleans up in a finally — before r15 only runForeachBatch did,
    * and a long bench session left thousands of committed-offset dirs on
    * tmpfs (a leak, and at 100 TB a checkpoint-store bill). */
  private def sweep(path: String): Unit = {
    def rm(x: java.io.File): Unit = {
      if (x.isDirectory)
        Option(x.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
      x.delete(); ()
    }
    rm(new java.io.File(path))
  }

  /** @param statePartitions shuffle/state partition count for THIS query.
    *   Stateful commit cost is per-store-per-partition-per-batch file I/O,
    *   independent of state volume — a stream-stream join carries 4 stores
    *   per partition, so a 2-batch 10-row join at 8 partitions pays 64
    *   store commits for 10 rows of state (measured 3.5-4.3 s in r11).
    *   Gates whose state is a handful of rows pass a small count; the
    *   default stays [[StatePartitions]]. Results are identical at any
    *   count (state is key-hashed); on a real cluster this is sized to
    *   state volume / executor count, exactly like shuffle width. */
  def collect(stream: DataFrame, outputMode: String = "append",
      statePartitions: Int = StatePartitions): DataFrame = {
    val spark = stream.sparkSession
    val id = n.incrementAndGet()
    val name = s"graft_stream_$id"
    val ckpt = s"$ckptRoot/graft-ckpt-$id-${System.nanoTime()}"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = stream.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      sweep(ckpt) // the memory-sink table outlives the checkpoint
    }
    spark.table(name)
  }

  /** Like [[collect]] but through `foreachBatch`, applying a BATCH
    * transform to each micro-batch — the streaming execution shape for
    * per-row/per-doc-pure pipeline stages (decontamination, filtering)
    * whose logic is a plain `DataFrame => DataFrame`. Batch-local
    * application is exact for such stages whatever the batch boundaries.
    * Results accumulate on the driver like the memory sink [[collect]]
    * uses — a bounded-run harness helper, not a production sink (live
    * deployments write each transformed batch through Sinks.* instead). */
  def collectBatches(stream: DataFrame)(f: DataFrame => DataFrame): DataFrame = {
    val spark = stream.sparkSession
    val id = n.incrementAndGet()
    val ckpt = s"$ckptRoot/graft-ckpt-$id-${System.nanoTime()}"
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[
      Array[org.apache.spark.sql.Row]]()
    @volatile var schema: org.apache.spark.sql.types.StructType = null
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
    try {
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val r = f(b)
          schema = r.schema
          acc.add(r.collect())
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      sweep(ckpt)
    }
    require(schema != null, "collectBatches: the stream produced no batches")
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    acc.forEach(a => a.foreach(rows.add))
    spark.createDataFrame(rows, schema)
  }

  /** Run a bounded stream through `foreachBatch` purely for its side
    * effects — the harness shape for sinks that FOLD each micro-batch
    * into a store (incremental state upkeep, MERGE-style writes) rather
    * than appending rows. The throwaway checkpoint is swept on exit —
    * a fold sink's durability lives in its own store, not here. */
  def runForeachBatch(stream: DataFrame)(f: (DataFrame, Long) => Unit): Unit = {
    val spark = stream.sparkSession
    val id = n.incrementAndGet()
    val ckpt = s"$ckptRoot/graft-ckpt-$id-${System.nanoTime()}"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
    try {
      val q = stream.writeStream
        .foreachBatch(f)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      sweep(ckpt)
    }
  }

  /** T8 as an observable behavior: run the SAME query over TWO
    * lifecycles sharing ONE checkpoint. Lifecycle 1 processes the first
    * `splitAt` chunk files and stops (a planned stop stands in for the
    * crash: the sink-side buffer is discarded state, the checkpoint —
    * committed offsets + state-store snapshots — is what survives);
    * the remaining chunks are then staged and a FRESH query starts from
    * the same checkpoint. Returns the union of both lifecycles' output.
    *
    * Why this proves exactly-once resume: if offset recovery failed,
    * lifecycle 2 would re-read lifecycle 1's files and re-emit its rows;
    * if state reload failed, keys seen in lifecycle 1 would emit again
    * under stateful dedup. Either way the union carries duplicates the
    * single-run oracle does not have — a hash mismatch, not a silent
    * pass. Sink is foreachBatch (the memory sink refuses checkpoint
    * recovery by design); rows accumulate on the driver like
    * [[collectBatches]] — a bounded-run harness helper, not a sink. */
  def collectResumed(chunks: Seq[java.io.File], splitAt: Int,
      statePartitions: Int = StatePartitions)(
      mkStream: String => DataFrame): DataFrame = {
    require(splitAt > 0 && splitAt < chunks.length,
      s"splitAt must split $chunks non-trivially, got $splitAt")
    val id = n.incrementAndGet()
    val stage = new java.io.File(s"$ckptRoot/graft-stage-$id-${System.nanoTime()}")
    stage.mkdirs()
    val ckpt = s"$ckptRoot/graft-ckpt-$id-${System.nanoTime()}"
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[
      Array[org.apache.spark.sql.Row]]()
    @volatile var schema: org.apache.spark.sql.types.StructType = null
    @volatile var sparkRef: org.apache.spark.sql.SparkSession = null
    def stageUp(files: Seq[java.io.File]): Unit = files.foreach { f =>
      val dest = new java.io.File(stage, f.getName)
      java.nio.file.Files.copy(f.toPath, dest.toPath)
      dest.setLastModified(f.lastModified) // preserve processing order
      ()
    }
    def lifecycle(): Unit = {
      val stream = mkStream(stage.getPath)
      val spark = stream.sparkSession
      sparkRef = spark
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      try {
        val q = stream.writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            schema = b.schema
            acc.add(b.collect())
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    try {
      stageUp(chunks.take(splitAt))
      lifecycle()
      stageUp(chunks.drop(splitAt))
      lifecycle() // the SHARED checkpoint must survive between lifecycles
    } finally { sweep(ckpt); sweep(stage.getPath) }
    require(schema != null, "collectResumed: the stream produced no batches")
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    acc.forEach(a => a.foreach(rows.add))
    sparkRef.createDataFrame(rows, schema)
  }

  /** Fold the (finite) stream's micro-batches through `step`, returning
    * the final state — the accumulating-store shape behind foreachBatch
    * dim maintenance: each batch merges into a state DataFrame a
    * downstream view derives from. The state is localCheckpoint'ed per
    * batch so lineage does not stack across batches (the blocks die with
    * the session; Bench's hygiene pass also sweeps them). */
  def foldBatches(stream: DataFrame)(
      step: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    val spark = stream.sparkSession
    val id = n.incrementAndGet()
    val ckpt = s"$ckptRoot/graft-ckpt-$id-${System.nanoTime()}"
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](null)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
    try {
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          state.set(step(Option(state.get), b).localCheckpoint(true))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      sweep(ckpt)
    }
    require(state.get != null, "foldBatches: the stream produced no batches")
    state.get
  }
}
