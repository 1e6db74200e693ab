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

  def collect(stream: DataFrame, outputMode: String = "append"): DataFrame = {
    val spark = stream.sparkSession
    val id = n.incrementAndGet()
    val name = s"graft_stream_$id"
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-ckpt-$id-${System.nanoTime()}"
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
